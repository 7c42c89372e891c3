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


def test_ssi_align_quality_scores():
    from video3d_tpu.models.mono import ssi_align_quality

    rng = np.random.default_rng(7)
    gt = jnp.asarray(rng.uniform(0, 32, (2, 16, 24)).astype(np.float32))
    v = jnp.ones_like(gt)
    # affine-related prediction: perfect fit, q ~ 1
    s, t, q = ssi_align_quality(gt * 2.0 + 3.0, gt, v)
    np.testing.assert_allclose(np.asarray(q)[:, 0, 0], 1.0, atol=1e-4)
    # independent noise: q ~ 0
    noise = jnp.asarray(rng.uniform(0, 32, gt.shape).astype(np.float32))
    _, _, q0 = ssi_align_quality(noise, gt, v)
    assert float(np.asarray(q0).max()) < 0.1
    # below min_support there is nothing to judge: trust-by-default
    few = jnp.zeros_like(gt).at[:, :2, :3].set(1.0)
    _, _, q1 = ssi_align_quality(noise, gt, few, min_support=32.0)
    np.testing.assert_allclose(np.asarray(q1)[:, 0, 0], 1.0)


@pytest.mark.parametrize("trust_scale", [1, 4])
def test_bad_mono_guide_degrades_to_stereo_only(trust_scale):
    """Trust gate (stages/depth.py): a guidance net whose output cannot
    explain the confident SGM structure must not pollute the frame --
    the confidence blend with a GARBAGE mono guide should stay close to
    the stereo-only output on its valid pixels. Parametrized over the
    exact full-res gate and the pooled reduced-resolution one
    (trust_scale=4): the OOD-safety property must hold for both."""
    from video3d_tpu.models.guidance import GuidanceFn
    from video3d_tpu.ops.stereo import SGBMParams
    from video3d_tpu.stages.depth import depth_batch_pipeline

    rng = np.random.default_rng(3)
    h, weye, shift = 48, 128, 6
    base = rng.uniform(0, 255, (h, weye + shift)).astype(np.float32)
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(base, 1.5)
    base = (base - base.min()) / (np.ptp(base) + 1e-6) * 255
    left = base[:, shift:]
    right = base[:, :weye]
    sbs = np.concatenate([left, right], axis=1)
    frames = np.repeat(
        np.stack([sbs, sbs])[..., None], 3, axis=-1
    ).astype(np.uint8)

    params = SGBMParams(num_disparities=16)
    kw = dict(params=params, unsqueeze=False, normalize="fixed",
              apply_speckle=False)
    stereo_only = np.asarray(depth_batch_pipeline(jnp.asarray(frames), **kw))

    def garbage(p, left_rgb):
        # anti-structured guide: random per-pixel noise
        return (left_rgb[..., 0] * 7919.0) % 13.0

    g = GuidanceFn(garbage, params={"none": jnp.zeros(())})
    hybrid = np.asarray(depth_batch_pipeline(
        jnp.asarray(frames), guidance_fn=g, guidance_params=g.params,
        blend="confidence", trust_scale=trust_scale, **kw))
    valid = stereo_only > 0
    diff = np.abs(hybrid.astype(np.int64) - stereo_only.astype(np.int64))
    # uint16 scale: 1 disparity = 65535/16 ~ 4096 counts; stay within
    # a small fraction of a disparity on stereo-valid pixels
    assert np.median(diff[valid]) < 2048, np.median(diff[valid])
