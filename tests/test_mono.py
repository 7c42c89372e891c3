"""MonoDepthLite distillation model (models/mono.py).

The reference's monocular slot needs a downloaded DPT checkpoint; this
first-party alternative must (a) produce valid relative-depth maps,
(b) train: the SSI-distillation loss falls on a small fixed batch,
(c) plug into the depth stage's mono-guidance blend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video3d_tpu.models.mono import (
    MonoDepthLite,
    make_mono_guidance,
    ssi_align,
    ssi_l1_loss,
    train_step,
)


def test_forward_shape_and_nonnegative():
    m = MonoDepthLite(width=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, 32, 64, 3)).astype(np.float32))
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, x)
    assert out.shape == (2, 32, 64)
    assert float(out.min()) >= 0.0


def test_ssi_align_recovers_affine():
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 32, (3, 16, 24)).astype(np.float32))
    pred = gt * 2.0 + 3.0
    v = jnp.ones_like(gt)
    s, t = ssi_align(pred, gt, v)
    np.testing.assert_allclose(np.asarray(s)[:, 0, 0], 0.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t)[:, 0, 0], -1.5, atol=1e-3)
    # perfectly aligned prediction has ~zero loss
    assert float(ssi_l1_loss(pred, gt, v)) < 1e-4


def test_ssi_loss_ignores_invalid_pixels():
    rng = np.random.default_rng(2)
    gt = jnp.asarray(rng.uniform(0, 32, (1, 16, 24)).astype(np.float32))
    pred = gt * 1.5 + 1.0
    v = jnp.ones_like(gt)
    # corrupt some pixels but mark them invalid: loss must stay ~zero
    bad = gt.at[:, :4, :4].set(1000.0)
    v_bad = v.at[:, :4, :4].set(0.0)
    assert float(ssi_l1_loss(pred, bad, v_bad)) < 1e-3


def test_distillation_loss_falls():
    import optax

    m = MonoDepthLite(width=8)
    rng = np.random.default_rng(3)
    import scipy.ndimage as ndi

    # structured scene: bright slab in front (higher disparity)
    img = ndi.gaussian_filter(rng.uniform(0, 255, (32, 64)), 2.0)
    img[8:24, 16:48] = 220.0
    gt = np.full((32, 64), 4.0, np.float32)
    gt[8:24, 16:48] = 20.0
    x = jnp.asarray(np.repeat(img[None, :, :, None], 3, -1)
                    .astype(np.float32))
    gtj = jnp.asarray(gt[None])
    v = jnp.ones_like(gtj)
    p = m.init(jax.random.key(0), x)
    tx = optax.adam(1e-3)
    o = tx.init(p)
    losses = []
    for _ in range(30):
        p, o, loss = train_step(m, tx, p, o, x, gtj, v, smooth_weight=0.0)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_mono_guidance_in_depth_pipeline():
    from video3d_tpu.stages.depth import depth_batch_pipeline

    m = MonoDepthLite(width=8)
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.uniform(0, 255, (1, 16, 32, 3)).astype(np.float32))
    params = m.init(jax.random.key(0), x0)
    g = make_mono_guidance(params, width=8, dtype=jnp.float32)
    frames = rng.integers(0, 255, (2, 32, 128, 3), dtype=np.uint8)
    out = depth_batch_pipeline(
        jnp.asarray(frames), unsqueeze=False, normalize="fixed",
        apply_speckle=False, guidance_fn=g, guidance_params=g.params,
    )
    assert out.shape == (2, 32, 64) and out.dtype == jnp.uint16


def test_train_step_k_matches_single_steps():
    """K scanned distillation steps ≡ K sequential train_step calls."""
    import optax

    from video3d_tpu.models.mono import MonoDepthLite, train_step, train_step_k

    model = MonoDepthLite(width=8)
    rng = np.random.default_rng(5)
    K = 3
    rgbs = jnp.asarray(
        rng.uniform(0, 255, (K, 2, 32, 64, 3)).astype(np.float32))
    gts = jnp.asarray(rng.uniform(0, 16, (K, 2, 32, 64)).astype(np.float32))
    valids = jnp.ones_like(gts)
    params0 = model.init(jax.random.key(0), rgbs[0])
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))

    p_ref, o_ref = params0, tx.init(params0)
    ref_losses = []
    for i in range(K):
        p_ref, o_ref, loss = train_step(
            model, tx, p_ref, o_ref, rgbs[i], gts[i], valids[i],
            smooth_weight=0.05)
        ref_losses.append(float(loss))

    p_k, o_k = params0, tx.init(params0)
    p_k, o_k, losses = train_step_k(
        model, tx, p_k, o_k, rgbs, gts, valids, smooth_weight=0.05
    )
    np.testing.assert_allclose(np.asarray(losses), ref_losses, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_k), jax.tree.leaves(p_ref)):
        # scan vs eager reassociates float reductions (global-norm clip,
        # adam); trajectories agree to float noise, not bitwise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)
