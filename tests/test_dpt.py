"""DPT Flax model: conversion fidelity vs torch DPTForDepthEstimation.

Checkpoints cannot be downloaded here, so parity is checked against a
tiny randomly-initialized HF torch model with the same architecture
(SURVEY.md SS7-iv: weight-conversion fidelity is a named hard part).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from video3d_tpu.models.dpt import (  # noqa: E402
    DPTConfig,
    DPTDepthModel,
    convert_torch_state_dict,
    make_guidance_fn,
)


def _tiny_pair(seed=0):
    cfg = DPTConfig.tiny()
    hf_cfg = transformers.DPTConfig(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        num_channels=3,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        backbone_out_indices=list(cfg.backbone_out_indices),
        neck_hidden_sizes=list(cfg.neck_hidden_sizes),
        readout_type=cfg.readout_type,
        fusion_hidden_size=cfg.fusion_hidden_size,
        is_hybrid=False,
    )
    torch.manual_seed(seed)
    tmodel = transformers.DPTForDepthEstimation(hf_cfg).eval()
    params = convert_torch_state_dict(tmodel.state_dict(), cfg)
    return cfg, tmodel, params


def test_dpt_forward_matches_torch():
    cfg, tmodel, params = _tiny_pair()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()

    out = np.asarray(DPTDepthModel(cfg).apply(params, x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)


def test_guidance_fn_shapes():
    cfg, _, params = _tiny_pair()
    fn = make_guidance_fn(DPTDepthModel(cfg), params, infer_size=cfg.image_size)
    frames = np.random.default_rng(2).uniform(
        0, 255, size=(2, 48, 96, 3)
    ).astype(np.float32)
    depth = np.asarray(fn(frames))
    assert depth.shape == (2, 48, 96)
    assert np.isfinite(depth).all()


def test_safetensors_loader_matches_torch_loader(tmp_path):
    """Direct safetensors loading (torch-free inference path) produces
    the same guidance outputs as the torch state_dict conversion."""
    cfg, tmodel, params = _tiny_pair(seed=3)
    tmodel.save_pretrained(tmp_path, safe_serialization=True)
    assert list(tmp_path.glob("*.safetensors"))

    from video3d_tpu.models.dpt import load_dpt_safetensors

    fn_st = load_dpt_safetensors(
        str(tmp_path), dtype=np.float32, infer_size=cfg.image_size
    )
    fn_ref = make_guidance_fn(
        DPTDepthModel(cfg), params, infer_size=cfg.image_size
    )
    frames = np.random.default_rng(4).uniform(
        0, 255, size=(1, 40, 64, 3)
    ).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fn_st(frames)), np.asarray(fn_ref(frames)),
        rtol=1e-5, atol=1e-5,
    )


def test_load_dpt_guidance_prefers_safetensors_dir(tmp_path):
    """load_dpt_guidance on a local safetensors dir never imports the
    torch loader path."""
    cfg, tmodel, _ = _tiny_pair(seed=5)
    tmodel.save_pretrained(tmp_path, safe_serialization=True)

    from video3d_tpu.models.dpt import load_dpt_guidance

    fn = load_dpt_guidance(str(tmp_path), dtype=np.float32,
                           infer_size=cfg.image_size)
    frames = np.random.default_rng(6).uniform(
        0, 255, size=(1, 32, 48, 3)
    ).astype(np.float32)
    out = np.asarray(fn(frames))
    assert out.shape == (1, 32, 48) and np.isfinite(out).all()


def test_attention_oneblock_matches_einsum():
    """kernels/attention.py (interpret) == the XLA einsum attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video3d_tpu.kernels.attention import attention_oneblock

    rng = np.random.default_rng(9)
    b, n, s, d = 2, 3, 77, 32  # s deliberately not a lane multiple
    q = jnp.asarray(rng.standard_normal((b, n, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, n, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, s, d)).astype(np.float32))
    sm = 1.0 / d ** 0.5
    attn = jax.nn.softmax(
        jnp.einsum("bnqd,bnkd->bnqk", q, k) * sm, axis=-1)
    want = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
    got = attention_oneblock(q, k, v, sm_scale=sm, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_attention_multihead_matches_einsum():
    """Head-grouped fused attention (interpret) == XLA einsum, including
    non-lane-multiple S and head counts not divisible by the group."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video3d_tpu.kernels.attention import attention_multihead

    rng = np.random.default_rng(10)
    for (b, n, s, d, hps) in [(2, 4, 77, 32, 2), (1, 6, 130, 16, 4)]:
        q = jnp.asarray(rng.standard_normal((b, n, s, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, n, s, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, n, s, d)).astype(np.float32))
        sm = 1.0 / d ** 0.5
        attn = jax.nn.softmax(
            jnp.einsum("bnqd,bnkd->bnqk", q, k) * sm, axis=-1)
        want = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        got = attention_multihead(q, k, v, sm_scale=sm, heads_per_step=hps,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
