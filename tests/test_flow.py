"""Optical flow + flow-guided temporal EMA (ops/flow.py).

The reference has no temporal filtering at all (its readme lists
temporal consistency as future work); these tests pin the new filter's
contract: flow recovers known motion, the EMA denoises static content,
tracks moving content without ghosting, passes scene cuts through, and
the streaming driver is bit-identical to one whole-sequence scan.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from video3d_tpu.ops.flow import (
    FlowEMAParams,
    estimate_flow,
    flow_ema_scan,
    shift_edge,
    warp_bilinear,
)


def smooth_texture(rng, h, w, scale=255.0):
    """Band-limited random texture (enough gradient everywhere for
    block matching)."""
    import scipy.ndimage as ndi

    t = ndi.gaussian_filter(rng.standard_normal((h, w)), 2.0)
    t = (t - t.min()) / (np.ptp(t) + 1e-9)
    return (t * scale).astype(np.float32)


def test_shift_edge_matches_numpy_take():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((7, 9)).astype(np.float32)
    for dy, dx in [(0, 0), (1, 0), (0, -2), (-3, 2), (2, 3)]:
        got = np.asarray(shift_edge(jnp.asarray(a), dy, dx))
        yy = np.clip(np.arange(7) + dy, 0, 6)
        xx = np.clip(np.arange(9) + dx, 0, 8)
        want = a[np.ix_(yy, xx)]
        np.testing.assert_allclose(got, want)


def test_warp_zero_flow_is_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((16, 20)).astype(np.float32))
    z = jnp.zeros((16, 20), jnp.float32)
    np.testing.assert_allclose(np.asarray(warp_bilinear(img, z, z)),
                               np.asarray(img))


def test_warp_integer_flow_shifts():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((12, 15)).astype(np.float32)
    fy = jnp.full((12, 15), 2.0)
    fx = jnp.full((12, 15), -1.0)
    got = np.asarray(warp_bilinear(jnp.asarray(img), fy, fx))
    want = np.asarray(shift_edge(jnp.asarray(img), 2, -1))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("sy,sx", [(0, 3), (2, 0), (-2, 4), (3, -5)])
def test_flow_recovers_constant_shift(sy, sx):
    """cur(x) = prev(x + s)  =>  estimated flow ~= s in the interior."""
    rng = np.random.default_rng(7)
    pad = 8
    h, w = 96, 128
    base = smooth_texture(rng, h + 2 * pad, w + 2 * pad)
    # prev(x) = base(x - s + pad), cur(x) = base(x + pad) = prev(x + s):
    # backward flow cur->prev is +s (cur pixel x came from prev at x+s)
    prev = base[pad - sy : pad - sy + h, pad - sx : pad - sx + w]
    cur = base[pad : pad + h, pad : pad + w]
    fy, fx = estimate_flow(jnp.asarray(cur), jnp.asarray(prev))
    m = 16  # interior margin: border windows see replicated edges
    ey = np.abs(np.asarray(fy)[m:-m, m:-m] - sy).mean()
    ex = np.abs(np.asarray(fx)[m:-m, m:-m] - sx).mean()
    assert ey < 0.5 and ex < 0.5, (ey, ex)


def test_ema_denoises_static_scene():
    rng = np.random.default_rng(3)
    h, w = 48, 64
    guide = smooth_texture(rng, h, w)
    gt = smooth_texture(rng, h, w, scale=1000.0)
    t = 12
    noise = rng.standard_normal((t, h, w)).astype(np.float32) * 50.0
    depth = gt[None] + noise
    guides = np.repeat(guide[None], t, axis=0)
    _, out = flow_ema_scan(None, jnp.asarray(depth), jnp.asarray(guides))
    raw_err = np.abs(depth[-1] - gt).mean()
    ema_err = np.abs(np.asarray(out)[-1] - gt).mean()
    assert ema_err < 0.5 * raw_err, (ema_err, raw_err)


def test_ema_tracks_motion_without_ghosting():
    """Scene translating 3 px/frame: the flow-EMA must stay close to the
    per-frame truth, and beat a naive (unwarped) EMA at the same rate."""
    rng = np.random.default_rng(4)
    h, w, t, step = 64, 96, 10, 3
    big_g = smooth_texture(rng, h, w + t * step)
    big_d = smooth_texture(rng, h, w + t * step, scale=1000.0)
    guides = np.stack(
        [big_g[:, i * step : i * step + w] for i in range(t)]
    )
    gts = np.stack([big_d[:, i * step : i * step + w] for i in range(t)])
    noise = rng.standard_normal((t, h, w)).astype(np.float32) * 30.0
    depth = gts + noise
    p = FlowEMAParams()
    _, out = flow_ema_scan(None, jnp.asarray(depth), jnp.asarray(guides), p)

    naive = depth[0]
    for i in range(1, t):
        naive = p.alpha_min * depth[i] + (1 - p.alpha_min) * naive

    m = 16
    flow_err = np.abs(np.asarray(out)[-1] - gts[-1])[m:-m, m:-m].mean()
    naive_err = np.abs(naive - gts[-1])[m:-m, m:-m].mean()
    assert flow_err < 0.6 * naive_err, (flow_err, naive_err)
    assert flow_err < 35.0, flow_err  # close to the truth in absolute terms


def test_scene_cut_passes_current_frame_through():
    rng = np.random.default_rng(5)
    h, w, t = 48, 64, 8
    g_a = smooth_texture(rng, h, w)
    g_b = 255.0 - np.flipud(smooth_texture(rng, h, w))
    d_a = np.full((h, w), 200.0, np.float32)
    d_b = np.full((h, w), 900.0, np.float32)
    guides = np.stack([g_a] * t + [g_b])
    depth = np.stack([d_a] * t + [d_b])
    _, out = flow_ema_scan(None, jnp.asarray(depth), jnp.asarray(guides))
    cut = np.asarray(out)[-1]
    # residual gate must push alpha -> 1: output within 10% of the new
    # scene's depth, nowhere near the 200-ish history
    assert np.abs(cut - 900.0).mean() < 70.0, np.abs(cut - 900.0).mean()


def test_stream_equals_single_scan():
    from video3d_tpu.parallel.temporal import TemporalFlowEMAStream

    rng = np.random.default_rng(6)
    h, w, hq, wq, t = 32, 40, 8, 10, 9
    depth = (rng.uniform(0, 60000, (t, h, w))).astype(np.uint16)
    guides = rng.uniform(0, 255, (t, hq, wq)).astype(np.float32)

    s = TemporalFlowEMAStream()
    chunks = [
        np.asarray(s.push(depth[a:b], guides[a:b]))
        for a, b in [(0, 4), (4, 7), (7, 9)]
    ]
    assert s.flush() is None
    got = np.concatenate(chunks, axis=0)

    whole = TemporalFlowEMAStream()
    want = np.asarray(whole.push(depth, guides))
    np.testing.assert_array_equal(got, want)
    # frame 0 is a bit-exact passthrough
    np.testing.assert_array_equal(got[0], depth[0])


def test_depth_pipeline_return_guide_shapes():
    from video3d_tpu.stages.depth import depth_batch_pipeline
    from video3d_tpu.ops.stereo import SGBMParams

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 255, (2, 32, 128, 3), dtype=np.uint8)
    out = depth_batch_pipeline(
        jnp.asarray(frames),
        params=SGBMParams(num_disparities=16),
        unsqueeze=False,
        apply_speckle=False,
        return_guide=True,
    )
    depth, guide = out
    assert depth.shape == (2, 32, 64) and depth.dtype == jnp.uint16
    assert guide.shape == (2, 8, 16) and guide.dtype == jnp.float32


def test_depth_stage_flow_smoothing(tmp_path):
    """End-to-end: --temporal-smooth flow writes a distinct cache and a
    full set of artifacts on a moving synthetic SBS clip."""
    from tests.test_depth_stage import make_sbs_video
    from video3d_tpu.core.cache import depth_frame_name
    from video3d_tpu.stages.depth import StereoDepthExtractor

    video = tmp_path / "sbs.mp4"
    make_sbs_video(video, n_frames=6, shift=6)
    ext = StereoDepthExtractor(
        work_dir=str(tmp_path / "work"),
        batch_size=3,
        unsqueeze_anamorphic=False,
        apply_speckle=False,
        temporal_smooth="flow",
    )
    cache = ext.process_video_sbs(str(video), max_frames=6)
    assert "+tflow" in ext._model_key()
    for i in range(6):
        assert (cache / depth_frame_name(i)).exists()

    plain = StereoDepthExtractor(
        work_dir=str(tmp_path / "work"),
        batch_size=3,
        unsqueeze_anamorphic=False,
        apply_speckle=False,
    )
    assert plain._model_key() != ext._model_key()


def test_depth_stage_flow_fine(tmp_path):
    """--flow-scale 2 (half-res flow): runs end-to-end, keys a distinct
    cache, returns a half-res guide from the pipeline, and rejects bad
    scales."""
    from tests.test_depth_stage import make_sbs_video
    from video3d_tpu.core.cache import depth_frame_name
    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.stages.depth import (
        StereoDepthExtractor,
        depth_batch_pipeline,
    )

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 255, (2, 32, 128, 3), dtype=np.uint8)
    _, guide = depth_batch_pipeline(
        jnp.asarray(frames),
        params=SGBMParams(num_disparities=16),
        unsqueeze=False,
        apply_speckle=False,
        return_guide=True,
        guide_scale=2,
    )
    assert guide.shape == (2, 16, 32)

    video = tmp_path / "sbs.mp4"
    make_sbs_video(video, n_frames=5, shift=6)
    fine = StereoDepthExtractor(
        work_dir=str(tmp_path / "work"),
        batch_size=3,
        unsqueeze_anamorphic=False,
        apply_speckle=False,
        temporal_smooth="flow",
        flow_scale=2,
    )
    assert "+tflow@2" in fine._model_key()
    cache = fine.process_video_sbs(str(video), max_frames=5)
    for i in range(5):
        assert (cache / depth_frame_name(i)).exists()
    coarse = StereoDepthExtractor(
        work_dir=str(tmp_path / "work"),
        unsqueeze_anamorphic=False,
        apply_speckle=False,
        temporal_smooth="flow",
    )
    assert coarse._model_key() != fine._model_key()
    with pytest.raises(ValueError):
        StereoDepthExtractor(work_dir=str(tmp_path / "work"), flow_scale=3)


def test_shift_warp_matches_gather_warp():
    """The gather-free production warp equals the map_coordinates
    reference for in-range flow (r covers the field)."""
    from video3d_tpu.ops.flow import warp_bilinear_shifts

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.standard_normal((40, 56)).astype(np.float32))
    fy = jnp.asarray(
        rng.uniform(-3.5, 3.5, (40, 56)).astype(np.float32)
    )
    fx = jnp.asarray(
        rng.uniform(-3.5, 3.5, (40, 56)).astype(np.float32)
    )
    # constant-flow case: separable == true bilinear exactly
    cfy = jnp.full((40, 56), 1.7)
    cfx = jnp.full((40, 56), -2.3)
    got = np.asarray(warp_bilinear_shifts(img, cfy, cfx, 4))
    want = np.asarray(warp_bilinear(img, cfy, cfx))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # smooth varying flow: separation error stays small in the interior
    import scipy.ndimage as ndi

    fy = jnp.asarray(ndi.gaussian_filter(np.asarray(fy), 4.0))
    fx = jnp.asarray(ndi.gaussian_filter(np.asarray(fx), 4.0))
    got = np.asarray(warp_bilinear_shifts(img, fy, fx, 4))
    want = np.asarray(warp_bilinear(img, fy, fx))
    err = np.abs(got - want)[4:-4, 4:-4]
    assert err.max() < 0.35 and err.mean() < 0.02, (err.max(), err.mean())


@pytest.mark.parametrize("shape", [(48, 128), (270, 480), (96, 96)])
def test_pallas_warp_matches_xla_shift_stack(shape):
    """kernels/warp.py (interpret mode) ≡ the XLA shift-stack for
    arbitrary in-range flow, including the replicated borders."""
    from video3d_tpu.ops.flow import _warp_axis_shifts
    from video3d_tpu.kernels.warp import warp_bilinear_shifts_pallas

    h, w = shape
    rng = np.random.default_rng(21)
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-6, 6, (h, w)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-6, 6, (h, w)).astype(np.float32))
    r = 5
    fyc = jnp.clip(fy, -r, r)
    fxc = jnp.clip(fx, -r, r)
    want = np.asarray(
        _warp_axis_shifts(_warp_axis_shifts(img, fyc, r, True), fxc, r,
                          False)
    )
    got = np.asarray(
        warp_bilinear_shifts_pallas(img, fy, fx, r, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# Fast (gather-free / fused-kernel) estimator


def test_flow_level_fast_pallas_matches_xla():
    """flowmatch kernel (interpret) == the XLA formulation of the same
    level math (warp, clipped SADs, softargmin, smoothing)."""
    from video3d_tpu.ops.flow import _flow_level_fast

    rng = np.random.default_rng(3)
    h, w = 48, 64
    cur = jnp.asarray(smooth_texture(rng, h, w))
    prev = jnp.asarray(smooth_texture(rng, h, w))
    fy = jnp.asarray(
        np.random.default_rng(4).uniform(-3, 3, (h, w)).astype(np.float32))
    fx = jnp.asarray(
        np.random.default_rng(5).uniform(-3, 3, (h, w)).astype(np.float32))
    ref_y, ref_x = _flow_level_fast(cur, prev, fy, fx, search=2, radius=3,
                                    tau=2.0, warp_r=4, use_pallas=False)
    got_y, got_x = _flow_level_fast(cur, prev, fy, fx, search=2, radius=3,
                                    tau=2.0, warp_r=4, use_pallas=True,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x),
                               atol=2e-4)


@pytest.mark.parametrize("sy,sx", [(0, 3), (2, 0), (-2, 3)])
def test_fast_flow_recovers_constant_shift(sy, sx):
    """estimate_flow_fast finds the same motion as the gather estimator
    on in-range content."""
    from video3d_tpu.ops.flow import estimate_flow_fast

    rng = np.random.default_rng(7)
    pad = 8
    h, w = 96, 128
    base = smooth_texture(rng, h + 2 * pad, w + 2 * pad)
    prev = base[pad - sy : pad - sy + h, pad - sx : pad - sx + w]
    cur = base[pad : pad + h, pad : pad + w]
    fy, fx = estimate_flow_fast(jnp.asarray(cur), jnp.asarray(prev),
                                max_flow=6)
    m = 16
    ey = np.abs(np.asarray(fy)[m:-m, m:-m] - sy).mean()
    ex = np.abs(np.asarray(fx)[m:-m, m:-m] - sx).mean()
    assert ey < 0.5 and ex < 0.5, (ey, ex)


def test_fast_flow_close_to_gather_flow_on_smooth_motion():
    """On smooth sub-clamp motion the two estimators agree closely."""
    from video3d_tpu.ops.flow import estimate_flow_fast

    rng = np.random.default_rng(11)
    h, w = 96, 128
    base = smooth_texture(rng, h + 16, w + 16)
    prev = base[8:8 + h, 8:8 + w]
    cur = base[10:10 + h, 5:5 + w]  # (dy, dx) = (2, -3)
    a_y, a_x = estimate_flow(jnp.asarray(cur), jnp.asarray(prev))
    b_y, b_x = estimate_flow_fast(jnp.asarray(cur), jnp.asarray(prev),
                                  max_flow=6)
    m = 16
    dy = np.abs(np.asarray(a_y - b_y))[m:-m, m:-m].mean()
    dx = np.abs(np.asarray(a_x - b_x))[m:-m, m:-m].mean()
    assert dy < 0.25 and dx < 0.25, (dy, dx)
