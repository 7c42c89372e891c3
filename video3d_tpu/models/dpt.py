"""DPT (Dense Prediction Transformer) monocular depth in Flax.

Architecture parity with HuggingFace ``DPTForDepthEstimation``
(``Intel/dpt-large``), the guidance model the reference loads through
torch/CUDA (reference depth.py:74-82, inference depth.py:348-349):

* ViT backbone (patch 16): patch-embed conv, cls token, learned position
  embeddings, pre-LN transformer blocks;
* reassemble neck: readout-projected tokens from four intermediate layers
  re-gridded and resampled to strides {4, 8, 16, 32}, 3x3-projected to a
  common fusion width;
* feature-fusion decoder with pre-activation residual units and
  align-corners bilinear x2 upsampling;
* depth head producing a full-resolution relative-depth map.

TPU-first: NHWC layout throughout, convs/matmuls land on the MXU, the
whole forward is one jit region, optionally bfloat16. Weights convert
mechanically from the torch checkpoint via
:func:`convert_torch_state_dict`; conversion fidelity is tested against a
tiny randomly-initialized torch ``DPTForDepthEstimation``
(tests/test_dpt.py), since checkpoints cannot be downloaded in CI.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# DPT normalization (Intel/dpt-large preprocessor: mean=std=0.5 per channel).
DPT_MEAN = 0.5
DPT_STD = 0.5


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    """Subset of HF DPTConfig needed for depth estimation."""

    image_size: int = 384
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-12
    backbone_out_indices: Sequence[int] = (5, 11, 17, 23)
    neck_hidden_sizes: Sequence[int] = (256, 512, 1024, 1024)
    readout_type: str = "project"
    reassemble_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    fusion_hidden_size: int = 256
    head_in_index: int = -1

    @classmethod
    def dpt_large(cls) -> "DPTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "DPTConfig":
        """Small config for tests (matches an HF DPTConfig with same fields)."""
        return cls(
            image_size=64,
            patch_size=16,
            hidden_size=32,
            num_hidden_layers=4,
            num_attention_heads=2,
            intermediate_size=64,
            backbone_out_indices=(0, 1, 2, 3),
            neck_hidden_sizes=(16, 24, 32, 32),
            fusion_hidden_size=16,
        )


# ---------------------------------------------------------------------------
# align_corners=True bilinear resize (torch interpolate parity)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=128)
def _ac_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) align-corners bilinear interpolation matrix."""
    if n_in == 1:
        return np.ones((1, n_out), np.float32)
    if n_out == 1:
        m = np.zeros((n_in, 1), np.float32)
        m[0, 0] = 1.0
        return m
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = src - lo
    mat = np.zeros((n_in, n_out), np.float64)
    np.add.at(mat, (lo, np.arange(n_out)), 1.0 - frac)
    np.add.at(mat, (hi, np.arange(n_out)), frac)
    return mat.astype(np.float32)


def resize_bilinear_ac(x: jnp.ndarray, h_out: int, w_out: int) -> jnp.ndarray:
    """torch ``interpolate(mode='bilinear', align_corners=True)`` on NHWC."""
    b, h, w, c = x.shape
    if h != h_out:
        mh = jnp.asarray(_ac_matrix(h, h_out))  # (H, H')
        x = jnp.einsum("bhwc,hH->bHwc", x, mh)
    if w != w_out:
        mw = jnp.asarray(_ac_matrix(w, w_out))
        x = jnp.einsum("bhwc,wW->bhWc", x, mw)
    return x


# ---------------------------------------------------------------------------
# ViT backbone
# ---------------------------------------------------------------------------


class ViTSelfAttention(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        head_dim = c.hidden_size // c.num_attention_heads
        q = nn.Dense(c.hidden_size, name="query")(x)
        k = nn.Dense(c.hidden_size, name="key")(x)
        v = nn.Dense(c.hidden_size, name="value")(x)

        def split(t):
            return t.reshape(
                t.shape[0], t.shape[1], c.num_attention_heads, head_dim
            ).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        out = _attention(q, k, v, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], c.hidden_size)
        return nn.Dense(c.hidden_size, name="output")(out)


def _attention(q, k, v, head_dim: int):
    """softmax(QK^T / sqrt(d)) V for (B, N, S, D) heads.

    Default: the plain XLA einsum. MEASURED on v5e
    (tools/profile_hybrid.py, S=577, D=64, bf16): at the full-backbone
    level XLA attention runs 3.80 ms/frame (24 blocks) vs 4.47 with the
    fused Pallas kernel — XLA fuses the attention into the surrounding
    projections, which an opaque pallas_call blocks; isolated
    per-op attention rows are within run-to-run noise either way. The
    earlier "fused kernel 24% faster" finding was a timing artifact of
    a degraded relay. The custom kernels stay opt-in for A/B on future
    toolchains: ``VIDEO3D_TPU_DPT_FUSED_ATTN=1`` (head-grouped) or
    ``oneblock``.
    """
    import os

    mode = os.environ.get("VIDEO3D_TPU_DPT_FUSED_ATTN", "0")
    if jax.default_backend() == "tpu" and mode != "0":
        try:
            from video3d_tpu.kernels.attention import (
                attention_multihead,
                attention_oneblock,
            )

            fused = (attention_oneblock if mode == "oneblock"
                     else attention_multihead)
            return fused(
                q, k, v, sm_scale=1.0 / float(head_dim) ** 0.5
            ).astype(v.dtype)
        except Exception:
            pass  # any kernel/toolchain gap: fall back to the einsum path
    attn = jnp.einsum(
        "bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(head_dim).astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bnkd->bnqd", attn, v)


class ViTBlock(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm_before")(x)
        x = x + ViTSelfAttention(c, name="attention")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm_after")(x)
        h = nn.Dense(c.intermediate_size, name="mlp_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="mlp_out")(h)
        return x + h


class ViTBackbone(nn.Module):
    """Patch embed + cls token + pos embed + blocks; returns the four
    intermediate token grids at ``backbone_out_indices`` (HF semantics:
    the output of block i, pre-final-layernorm)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, pixels):  # NHWC
        c = self.cfg
        b, h, w, _ = pixels.shape
        gh, gw = h // c.patch_size, w // c.patch_size
        x = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            name="patch_embed",
        )(pixels)
        x = x.reshape(b, gh * gw, c.hidden_size)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.hidden_size)
        )
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (1, n_pos, c.hidden_size),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x], 1)
        # interpolate grid position embeddings if input != train resolution
        g0 = c.image_size // c.patch_size
        if (gh, gw) != (g0, g0):
            cls_pos = pos[:, :1]
            grid = pos[:, 1:].reshape(1, g0, g0, c.hidden_size)
            grid = resize_bilinear_ac(grid, gh, gw).reshape(1, gh * gw, c.hidden_size)
            pos = jnp.concatenate([cls_pos, grid], axis=1)
        x = x + pos

        taps: List[jnp.ndarray] = []
        out_set = set(int(i) for i in c.backbone_out_indices)
        for i in range(c.num_hidden_layers):
            x = ViTBlock(c, name=f"layer_{i}")(x)
            if i in out_set:
                taps.append(x)
        return taps, (gh, gw)


# ---------------------------------------------------------------------------
# Neck: readout + reassemble + fusion
# ---------------------------------------------------------------------------


class PreActResidual(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = jax.nn.relu(x)
        h = nn.Conv(c.fusion_hidden_size, (3, 3), padding=1, name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(c.fusion_hidden_size, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x, skip=None):
        c = self.cfg
        if skip is not None:
            if x.shape[1:3] != skip.shape[1:3]:
                skip = resize_bilinear_ac(skip, x.shape[1], x.shape[2])
            x = x + PreActResidual(c, name="residual1")(skip)
        x = PreActResidual(c, name="residual2")(x)
        x = resize_bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)
        return nn.Conv(c.fusion_hidden_size, (1, 1), name="projection")(x)


class DPTDepthModel(nn.Module):
    """Full DPTForDepthEstimation forward: pixels NHWC in [0,1] normalized
    -> relative inverse depth (B, H, W), full input resolution."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        taps, (gh, gw) = ViTBackbone(c, name="backbone")(pixels)
        b = pixels.shape[0]

        feats = []
        for i, t in enumerate(taps):
            cls_tok, tokens = t[:, :1], t[:, 1:]
            if c.readout_type == "project":
                readout = jnp.broadcast_to(cls_tok, tokens.shape)
                merged = jnp.concatenate([tokens, readout], axis=-1)
                tokens = nn.Dense(c.hidden_size, name=f"readout_{i}")(merged)
                tokens = jax.nn.gelu(tokens, approximate=False)
            fm = tokens.reshape(b, gh, gw, c.hidden_size)
            fm = nn.Conv(
                int(c.neck_hidden_sizes[i]), (1, 1), name=f"reassemble_proj_{i}"
            )(fm)
            f = float(c.reassemble_factors[i])
            if f > 1.0:
                k = int(f)
                fm = nn.ConvTranspose(
                    int(c.neck_hidden_sizes[i]),
                    (k, k),
                    strides=(k, k),
                    padding="VALID",
                    name=f"reassemble_resize_{i}",
                )(fm)
            elif f < 1.0:
                s = int(round(1.0 / f))
                fm = nn.Conv(
                    int(c.neck_hidden_sizes[i]),
                    (3, 3),
                    strides=(s, s),
                    padding=1,
                    name=f"reassemble_resize_{i}",
                )(fm)
            fm = nn.Conv(
                c.fusion_hidden_size,
                (3, 3),
                padding=1,
                use_bias=False,
                name=f"neck_conv_{i}",
            )(fm)
            feats.append(fm)

        # fusion decoder, deepest first (HF: fusion_stage iterates reversed)
        x = FeatureFusion(c, name="fusion_3")(feats[3])
        x = FeatureFusion(c, name="fusion_2")(x, feats[2])
        x = FeatureFusion(c, name="fusion_1")(x, feats[1])
        x = FeatureFusion(c, name="fusion_0")(x, feats[0])

        # head (HF DPTDepthEstimationHead)
        x = nn.Conv(c.fusion_hidden_size // 2, (3, 3), padding=1, name="head_conv1")(x)
        x = resize_bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)
        x = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_conv3")(x)
        x = jax.nn.relu(x)
        return x[..., 0]


# ---------------------------------------------------------------------------
# torch -> flax weight conversion
# ---------------------------------------------------------------------------


def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def convert_torch_state_dict(sd: Dict[str, Any], cfg: DPTConfig) -> Dict:
    """Map an HF ``DPTForDepthEstimation`` state_dict to this module's params.

    Layout changes: torch Linear (out, in) -> flax kernel (in, out); torch
    Conv OIHW -> flax HWIO; torch ConvTranspose IOHW -> flax HWIO.
    """
    p: Dict[str, Any] = {}

    def dense(prefix):
        return {
            "kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"]),
        }

    def conv(prefix, transpose=False):
        w = _t(sd[f"{prefix}.weight"])
        if transpose:
            # torch ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out)
            # flax ConvTranspose kernel is (kh, kw, in, out); torch computes
            # correlation of the flipped kernel, flax convolves -> flip HW.
            k = w.transpose(2, 3, 0, 1)[::-1, ::-1]
        else:
            k = w.transpose(2, 3, 1, 0)
        out = {"kernel": np.ascontiguousarray(k)}
        if f"{prefix}.bias" in sd:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}

    # --- backbone ---
    bb: Dict[str, Any] = {
        "patch_embed": conv("dpt.embeddings.patch_embeddings.projection"),
        "cls_token": _t(sd["dpt.embeddings.cls_token"]),
        "position_embeddings": _t(sd["dpt.embeddings.position_embeddings"]),
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"dpt.encoder.layer.{i}"
        bb[f"layer_{i}"] = {
            "layernorm_before": ln(f"{pre}.layernorm_before"),
            "layernorm_after": ln(f"{pre}.layernorm_after"),
            "attention": {
                "query": dense(f"{pre}.attention.attention.query"),
                "key": dense(f"{pre}.attention.attention.key"),
                "value": dense(f"{pre}.attention.attention.value"),
                "output": dense(f"{pre}.attention.output.dense"),
            },
            "mlp_in": dense(f"{pre}.intermediate.dense"),
            "mlp_out": dense(f"{pre}.output.dense"),
        }
    p["backbone"] = bb

    # --- neck: reassemble ---
    for i in range(4):
        pre = f"neck.reassemble_stage.layers.{i}"
        if cfg.readout_type == "project":
            p[f"readout_{i}"] = dense(
                f"neck.reassemble_stage.readout_projects.{i}.0"
            )
        p[f"reassemble_proj_{i}"] = conv(f"{pre}.projection")
        f = float(cfg.reassemble_factors[i])
        if f > 1.0:
            p[f"reassemble_resize_{i}"] = conv(f"{pre}.resize", transpose=True)
        elif f < 1.0:
            p[f"reassemble_resize_{i}"] = conv(f"{pre}.resize")
        p[f"neck_conv_{i}"] = conv(f"neck.convs.{i}")

    # --- fusion stage (HF fusion layers list runs deepest-first after
    # reversed(); layers.0 consumes feats[3]) ---
    for j in range(4):
        pre = f"neck.fusion_stage.layers.{j}"
        name = f"fusion_{3 - j}"
        p[name] = {
            "projection": conv(f"{pre}.projection"),
            "residual1": {
                "conv1": conv(f"{pre}.residual_layer1.convolution1"),
                "conv2": conv(f"{pre}.residual_layer1.convolution2"),
            },
            "residual2": {
                "conv1": conv(f"{pre}.residual_layer2.convolution1"),
                "conv2": conv(f"{pre}.residual_layer2.convolution2"),
            },
        }

    # --- head (HF head.head: Conv, Interp, Conv, ReLU, Conv, ReLU) ---
    p["head_conv1"] = conv("head.head.0")
    p["head_conv2"] = conv("head.head.2")
    p["head_conv3"] = conv("head.head.4")

    return jax.tree.map(jnp.asarray, {"params": p})


# ---------------------------------------------------------------------------
# Guidance entry point
# ---------------------------------------------------------------------------


def load_dpt_guidance(
    checkpoint: str = "Intel/dpt-large",
    dtype: jnp.dtype = jnp.bfloat16,
    infer_size: int = 384,
):
    """Build a jit-compatible guidance fn from a local HF torch checkpoint.

    Returns ``fn(left_rgb_f32_0_255: (B, H, W, 3)) -> (B, H, W)`` relative
    depth. A local directory containing ``*.safetensors`` is loaded
    torch-free via :func:`load_dpt_safetensors`; otherwise falls back to
    the transformers/torch loader. Raises if the checkpoint is not
    available locally (no-network environments); callers degrade to
    stereo-only (reference depth.py:107-114 contract).
    """
    from pathlib import Path

    p = Path(checkpoint)
    if p.is_dir() and any(p.glob("*.safetensors")):
        return load_dpt_safetensors(checkpoint, dtype=dtype,
                                    infer_size=infer_size)

    import transformers

    torch_model = transformers.DPTForDepthEstimation.from_pretrained(
        checkpoint, local_files_only=True
    )
    hf = torch_model.config
    cfg = DPTConfig(
        image_size=hf.image_size,
        patch_size=hf.patch_size,
        num_channels=hf.num_channels,
        hidden_size=hf.hidden_size,
        num_hidden_layers=hf.num_hidden_layers,
        num_attention_heads=hf.num_attention_heads,
        intermediate_size=hf.intermediate_size,
        layer_norm_eps=hf.layer_norm_eps,
        backbone_out_indices=tuple(hf.backbone_out_indices),
        neck_hidden_sizes=tuple(hf.neck_hidden_sizes),
        readout_type=hf.readout_type,
        fusion_hidden_size=hf.fusion_hidden_size,
    )
    params = convert_torch_state_dict(torch_model.state_dict(), cfg)
    del torch_model
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    model = DPTDepthModel(cfg)
    return make_guidance_fn(model, params, infer_size=infer_size, dtype=dtype)


def load_dpt_safetensors(
    model_dir: str,
    dtype: jnp.dtype = jnp.bfloat16,
    infer_size: int = 384,
):
    """Load DPT guidance straight from an HF checkpoint directory
    (``config.json`` + ``*.safetensors``) WITHOUT importing torch.

    The reference hard-requires torch+CUDA to run DPT (depth.py:74-82);
    here torch is only an optional conversion convenience -- inference
    needs nothing but the safetensors file. Weight names are the HF
    ``DPTForDepthEstimation`` state_dict names (safetensors preserves
    them), mapped by :func:`convert_torch_state_dict`.
    """
    import json
    from pathlib import Path

    from safetensors.numpy import load_file

    d = Path(model_dir)
    hf = json.loads((d / "config.json").read_text())
    cfg = DPTConfig(
        image_size=hf.get("image_size", 384),
        patch_size=hf.get("patch_size", 16),
        num_channels=hf.get("num_channels", 3),
        hidden_size=hf.get("hidden_size", 1024),
        num_hidden_layers=hf.get("num_hidden_layers", 24),
        num_attention_heads=hf.get("num_attention_heads", 16),
        intermediate_size=hf.get("intermediate_size", 4096),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
        backbone_out_indices=tuple(hf.get("backbone_out_indices",
                                          (5, 11, 17, 23))),
        neck_hidden_sizes=tuple(hf.get("neck_hidden_sizes",
                                       (256, 512, 1024, 1024))),
        readout_type=hf.get("readout_type", "project"),
        fusion_hidden_size=hf.get("fusion_hidden_size", 256),
    )
    files = sorted(d.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {model_dir}")
    sd: Dict[str, Any] = {}
    for f in files:
        sd.update(load_file(str(f)))
    params = convert_torch_state_dict(sd, cfg)
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    return make_guidance_fn(DPTDepthModel(cfg), params,
                            infer_size=infer_size, dtype=dtype)


def random_dpt_guidance(
    cfg: Optional[DPTConfig] = None,
    seed: int = 0,
    dtype: jnp.dtype = jnp.bfloat16,
    infer_size: int = 384,
):
    """Guidance fn with randomly initialized weights (for benchmarks and
    load tests in checkpoint-less environments: throughput and memory are
    weight-independent). NOT a substitute for real weights in quality."""
    cfg = cfg or DPTConfig.dpt_large()
    model = DPTDepthModel(cfg)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, infer_size, infer_size, 3), jnp.float32),
    )
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    return make_guidance_fn(model, params, infer_size=infer_size, dtype=dtype)


def make_guidance_fn(model: DPTDepthModel, params, infer_size: int = 384,
                     dtype: jnp.dtype = jnp.float32):
    """Wrap (model, params) as a guidance fn for the depth stage.

    Returns a :class:`~video3d_tpu.models.guidance.GuidanceFn`, so the
    weights are passed to the jitted pipeline as a traced ARGUMENT
    (``guidance_params``), not baked into the program as constants."""
    from video3d_tpu.models.guidance import GuidanceFn
    from video3d_tpu.ops.image import resize2d

    def apply_fn(p, left_rgb: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = left_rgb.shape
        x = left_rgb / 255.0
        x = (x - DPT_MEAN) / DPT_STD
        # NHWC resize to the model's inference resolution
        x = jnp.moveaxis(
            resize2d(jnp.moveaxis(x, -1, 1), infer_size, infer_size,
                     method="bilinear"),
            1, -1,
        )
        depth = model.apply(p, x.astype(dtype)).astype(jnp.float32)
        return resize2d(depth, h, w, method="bilinear")

    return GuidanceFn(apply_fn, params)
