"""Occlusion hole filling (ops/fill.py + --fill-holes plumbing)."""

import numpy as np

import jax.numpy as jnp

from video3d_tpu.ops.fill import fill_holes


def _oracle(d, inv):
    out = d.copy()
    for b in range(d.shape[0]):
        for y in range(d.shape[1]):
            row = d[b, y]
            vx = np.where(row != inv)[0]
            for x in range(d.shape[2]):
                if row[x] != inv:
                    continue
                cands = []
                l = vx[vx < x]
                r = vx[vx > x]
                if len(l):
                    cands.append(row[l.max()])
                if len(r):
                    cands.append(row[r.min()])
                out[b, y, x] = min(cands) if cands else inv
    return out


def test_fill_holes_matches_nearest_neighbor_oracle():
    rng = np.random.default_rng(4)
    d = rng.uniform(1, 60, (2, 6, 48)).astype(np.float32)
    holes = rng.uniform(size=d.shape) < 0.5
    d = np.where(holes, -1.0, d).astype(np.float32)
    d[0, 0, :] = -1.0  # fully-invalid row stays invalid
    got = np.asarray(fill_holes(jnp.asarray(d), -1.0))
    np.testing.assert_allclose(got, _oracle(d, -1.0))


def test_fill_holes_background_wins():
    # hole flanked by background (5) and foreground (40): takes 5
    d = np.full((1, 1, 16), -1.0, np.float32)
    d[0, 0, 2] = 5.0
    d[0, 0, 12] = 40.0
    got = np.asarray(fill_holes(jnp.asarray(d), -1.0))
    assert (got[0, 0, 3:12] == 5.0).all()
    assert (got[0, 0, :2] == 5.0).all() and (got[0, 0, 13:] == 40.0).all()


def test_depth_pipeline_fill_holes_full_coverage():
    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.stages.depth import depth_batch_pipeline

    import scipy.ndimage as ndi

    rng = np.random.default_rng(3)
    h, weye, shift = 48, 128, 6
    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (h, weye + shift)).astype(np.float32), 1.5)
    base = (base - base.min()) / (np.ptp(base) + 1e-6) * 255
    sbs = np.concatenate([base[:, shift:], base[:, :weye]], axis=1)
    frames = np.repeat(sbs[None, ..., None], 3, -1).astype(np.uint8)

    kw = dict(params=SGBMParams(num_disparities=16), unsqueeze=False,
              normalize="fixed", apply_speckle=False)
    plain = np.asarray(depth_batch_pipeline(jnp.asarray(frames), **kw))
    filled = np.asarray(depth_batch_pipeline(jnp.asarray(frames),
                                             fill_holes=True, **kw))
    scale = 65535.0 / 16.0
    # the x < D strip is invalid (0) in plain output, mostly filled here
    # (a filled pixel can legitimately stay 0 when its nearest valid
    # flank carries sub-pixel disparity ~0, so compare populations)
    assert (plain[0, 8:-8, :10] < scale).any()
    n_zero_plain = int((plain == 0).sum())
    n_zero_filled = int((filled == 0).sum())
    assert n_zero_filled < 0.5 * n_zero_plain, (n_zero_plain,
                                               n_zero_filled)
    # valid pixels unchanged
    valid = plain >= scale  # disparity >= 1
    np.testing.assert_array_equal(filled[valid], plain[valid])


def test_fill_holes_auto_default(tmp_path):
    """AUTO fill-holes: on with guidance, off for stereo-only (reference
    parity), explicit override wins, guidance soft-fallback reverts."""
    from video3d_tpu.stages.depth import StereoDepthExtractor

    ex = StereoDepthExtractor(work_dir=str(tmp_path / "a"), guidance="none")
    assert ex.fill_holes is False
    assert "+fill" not in ex._model_key()

    ex2 = StereoDepthExtractor(
        work_dir=str(tmp_path / "b"), guidance="crestereo"
    )
    assert ex2.fill_holes is True
    assert "+fill" in ex2._model_key()

    ex3 = StereoDepthExtractor(
        work_dir=str(tmp_path / "c"), guidance="crestereo", fill_holes=False
    )
    assert ex3.fill_holes is False

    ex4 = StereoDepthExtractor(
        work_dir=str(tmp_path / "d"), guidance="none", fill_holes=True
    )
    assert ex4.fill_holes is True

    # guidance load failure degrades to stereo-only AND reverts auto fill
    ex5 = StereoDepthExtractor(
        work_dir=str(tmp_path / "e"), guidance="dpt",
        model_checkpoint=str(tmp_path / "nonexistent_ckpt"),
    )
    assert ex5.fill_holes is True
    ex5.load_model()
    assert ex5.guidance == "none"
    assert ex5.fill_holes is False
