"""CREStereo-lite guidance model: shapes, trainability, checkpointing,
and integration through the depth pipeline (SURVEY.md SS2.4-1/4: the
reference's intended-but-never-shipped third guidance backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from video3d_tpu.models.crestereo import (
    CREStereoConfig,
    CREStereoLite,
    build_corr_volume,
    load_crestereo_guidance,
    lookup_corr,
    save_checkpoint,
    sequence_loss,
    train_step,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = CREStereoConfig.tiny()
    model = CREStereoLite(cfg)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (2, 32, 64, 3)).astype(np.float32))
    right = jnp.roll(left, -3, axis=2)
    params = model.init(jax.random.key(0), left, right)
    return cfg, model, params, left, right


def test_corr_volume_peaks_at_true_shift():
    rng = np.random.default_rng(1)
    fl = jnp.asarray(rng.normal(size=(1, 4, 32, 8)).astype(np.float32))
    fr = jnp.concatenate([fl[:, :, 3:], fl[:, :, -1:].repeat(3, 2)], axis=2)
    # fr(x) = fl(x+3) -> best match of fl(x) is fr(x-3): corr peak at d=3
    corr = np.asarray(build_corr_volume(fl, fr, 8))
    peaks = corr[0, :, 8:-8].argmax(axis=-1)
    assert (peaks == 3).mean() > 0.9


def test_lookup_corr_interpolates():
    corr = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
    corr = jnp.broadcast_to(corr, (1, 2, 4, 8))
    disp = jnp.full((1, 2, 4), 2.5)
    taps = np.asarray(lookup_corr(corr, disp, radius=1))
    np.testing.assert_allclose(taps[0, 0, 0], [1.5, 2.5, 3.5], atol=1e-5)


def test_forward_shapes_and_jit(tiny):
    cfg, model, params, left, right = tiny
    out = jax.jit(lambda p, l, r: model.apply(p, l, r))(params, left, right)
    assert out.shape == (2, 32, 64)
    assert np.isfinite(np.asarray(out)).all()
    seq = model.apply(params, left, right, all_iterations=True)
    assert len(seq) == cfg.iters


def test_training_reduces_loss(tiny):
    cfg, model, params, left, right = tiny
    gt = jnp.full((2, 32, 64), 3.0)
    valid = jnp.ones_like(gt)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    losses = []
    for _ in range(12):
        params, opt_state, loss = train_step(
            model, tx, params, opt_state, left, right, gt, valid
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_checkpoint_roundtrip_and_guidance(tiny, tmp_path):
    import jax.numpy as jnp

    cfg, model, params, left, right = tiny
    path = tmp_path / "ckpt"
    save_checkpoint(str(path), params)
    # f32 load: bit-faithful roundtrip
    fn = load_crestereo_guidance(str(path), cfg, dtype=jnp.float32)
    assert getattr(fn, "stereo", False)
    out = np.asarray(fn(left, right))
    ref = np.asarray(model.apply(params, left, right))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # default bf16 inference: same prediction within mixed-precision noise
    fn16 = load_crestereo_guidance(str(path), cfg)
    out16 = np.asarray(fn16(left, right))
    assert np.abs(out16 - ref).mean() < 0.25, np.abs(out16 - ref).mean()


def test_depth_pipeline_with_stereo_guidance(tiny):
    cfg, model, params, _, _ = tiny
    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.stages.depth import depth_batch_pipeline

    def guidance(l, r):
        return model.apply(params, l, r)

    guidance.stereo = True
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(2, 32, 128, 3), dtype=np.uint8)
    out = depth_batch_pipeline(
        frames,
        params=SGBMParams(num_disparities=16),
        unsqueeze=False,
        apply_speckle=False,
        guidance_fn=guidance,
    )
    out = np.asarray(out)
    assert out.shape == (2, 32, 64) and out.dtype == np.uint16


def test_train_step_k_matches_single_steps(tiny):
    """K scanned steps (one dispatch) ≡ K sequential train_step calls."""
    from video3d_tpu.models.crestereo import train_step_k

    cfg, model, params0, left, right = tiny
    rng = np.random.default_rng(3)
    K = 3
    lefts = jnp.asarray(
        rng.uniform(0, 255, (K, 2, 32, 64, 3)).astype(np.float32))
    rights = jnp.roll(lefts, -2, axis=3)
    gts = jnp.full((K, 2, 32, 64), 2.0)
    valids = jnp.ones_like(gts)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))

    p_ref = params0
    o_ref = tx.init(p_ref)
    ref_losses = []
    for i in range(K):
        p_ref, o_ref, loss = train_step(
            model, tx, p_ref, o_ref, lefts[i], rights[i], gts[i], valids[i]
        )
        ref_losses.append(float(loss))

    p_k = params0
    o_k = tx.init(p_k)
    p_k, o_k, losses = train_step_k(
        model, tx, p_k, o_k, lefts, rights, gts, valids
    )
    np.testing.assert_allclose(np.asarray(losses), ref_losses, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_k), jax.tree.leaves(p_ref)):
        # scan vs eager reassociates float reductions (global-norm clip,
        # adam); trajectories agree to float noise, not bitwise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)
