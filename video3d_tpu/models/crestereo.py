"""CREStereo-style iterative stereo refinement network in Flax.

The reference intended a CREStereo backend (its docstring depth.py:1 and
README name CREStereo; the integration was gitignored and never shipped --
SURVEY.md SS2.4-4, CREStereo_model.txt). This module provides that backend
as a compact RAFT/CREStereo-style recurrent stereo network, TPU-first:

* shared conv feature encoder at 1/4 resolution (NHWC, MXU convs);
* 1-D correlation volume along the epipolar (width) axis built from
  static shifts (no gathers), normalized by sqrt(C);
* iterative ConvGRU updates: each step samples the correlation volume
  around the current disparity with a differentiable one-hot/linear
  interpolation contraction (again gather-free) and emits a disparity
  delta -- the fixed iteration count unrolls under jit;
* bilinear x4 upsampling back to full resolution.

Unlike the DPT backend (monocular), this consumes BOTH eyes, so its
output is a true disparity estimate; the depth stage blends it through
the same 0.7/0.3 contract. Checkpoints save/load with orbax; a
``train_step`` (sequence L1 loss with exponentially weighted iterations,
as in RAFT) makes the model trainable on rendered stereo pairs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CREStereoConfig:
    feat_dim: int = 64
    hidden_dim: int = 64
    context_dim: int = 64
    max_disparity: int = 64  # full-resolution disparity range
    iters: int = 6
    lookup_radius: int = 4
    # computation dtype for the convs (params stay f32; flax casts per
    # op) -- bf16 doubles MXU throughput at inference
    dtype: object = jnp.float32
    # correlation pyramid depth: level l pools the disparity axis by 2^l,
    # so lookups cover radius * 2^(levels-1) fine disparities — without a
    # pyramid the GRU sees only a +-radius window and gets NO gradient
    # signal when the true match lies outside it (RAFT's motivation for
    # multi-scale correlation)
    corr_levels: int = 3

    @classmethod
    def tiny(cls) -> "CREStereoConfig":
        return cls(feat_dim=16, hidden_dim=16, context_dim=16,
                   max_disparity=16, iters=3, lookup_radius=2,
                   corr_levels=2)


class FeatureEncoder(nn.Module):
    """1/4-resolution conv encoder (shared between eyes)."""

    out_dim: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = nn.Conv(32, (7, 7), strides=(2, 2), padding=3, name="conv1",
                    dtype=dt)(x)
        x = jax.nn.relu(x)
        x = nn.Conv(48, (3, 3), padding=1, name="conv2", dtype=dt)(x)
        x = jax.nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, name="conv3",
                    dtype=dt)(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_dim, (3, 3), padding=1, name="conv4",
                    dtype=dt)(x)
        return x


class ConvGRU(nn.Module):
    hidden_dim: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                                   name="convz", dtype=self.dtype)(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                                   name="convr", dtype=self.dtype)(hx))
        q = jnp.tanh(
            nn.Conv(self.hidden_dim, (3, 3), padding=1, name="convq",
                    dtype=self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1.0 - z) * h + z * q


def build_corr_volume(fl: jnp.ndarray, fr: jnp.ndarray, num_disp: int):
    """1-D correlation along W: corr[..., x, d] = <fl(x), fr(x-d)> / sqrt(C).

    Static-shift construction (gathers are TPU poison); out-of-frame
    entries get a large negative score so lookups never prefer them.
    """
    b, h, w, c = fl.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(c))
    xs = jnp.arange(w)
    slices = []
    for d in range(num_disp):
        if d == 0:
            fr_d = fr
        else:
            edge = jnp.repeat(fr[:, :, :1], d, axis=2)
            fr_d = jnp.concatenate([edge, fr[:, :, :-d]], axis=2)
        corr = jnp.sum(fl * fr_d, axis=-1) * scale
        corr = jnp.where(xs[None, None, :] < d, -1e4, corr)
        slices.append(corr)
    return jnp.stack(slices, axis=-1)  # (B, h, w, D)


def lookup_corr(corr: jnp.ndarray, disp: jnp.ndarray, radius: int):
    """Sample corr at fractional ``disp`` +- radius, linearly interpolated.

    Differentiable and gather-free: each tap is a one-hot contraction
    over the (small, 1/4-res) disparity axis. corr (B, h, w, D),
    disp (B, h, w) -> (B, h, w, 2*radius+1).
    """
    nd = corr.shape[-1]
    d_iota = jax.lax.broadcasted_iota(jnp.int32, corr.shape, corr.ndim - 1)
    taps = []
    for j in range(-radius, radius + 1):
        pos = jnp.clip(disp + j, 0.0, nd - 1.0)
        lo = jnp.floor(pos)
        frac = pos - lo
        lo_i = lo.astype(jnp.int32)[..., None]
        sel_lo = jnp.sum(jnp.where(d_iota == lo_i, corr, 0.0), axis=-1)
        hi_i = jnp.minimum(lo_i + 1, nd - 1)
        sel_hi = jnp.sum(jnp.where(d_iota == hi_i, corr, 0.0), axis=-1)
        taps.append(sel_lo * (1.0 - frac) + sel_hi * frac)
    return jnp.stack(taps, axis=-1)


class CREStereoLite(nn.Module):
    """Recurrent stereo matcher: (left, right) NHWC in [0, 255] -> disparity.

    Returns full-resolution disparity (B, H, W) in pixels; with
    ``all_iterations=True`` returns the per-iteration sequence for
    training losses.
    """

    cfg: CREStereoConfig

    @nn.compact
    def __call__(self, left, right, all_iterations: bool = False):
        c = self.cfg
        x = jnp.concatenate([left, right], axis=0) / 127.5 - 1.0
        feats = FeatureEncoder(c.feat_dim, dtype=c.dtype, name="fnet")(x)
        fl, fr = jnp.split(feats, 2, axis=0)

        ctx = FeatureEncoder(c.hidden_dim + c.context_dim, dtype=c.dtype,
                             name="cnet")(
            left / 127.5 - 1.0
        )
        hidden = jnp.tanh(ctx[..., : c.hidden_dim])
        context = jax.nn.relu(ctx[..., c.hidden_dim:])

        nd4 = max(2, c.max_disparity // 4)
        corr = build_corr_volume(fl, fr, nd4)
        # pooled-disparity pyramid: level l averages 2^l fine bins, so a
        # fixed +-radius lookup window spans the whole range at the top
        pyramid = [corr]
        for _ in range(c.corr_levels - 1):
            prev = pyramid[-1]
            nd = prev.shape[-1]
            if nd % 2:
                prev = jnp.concatenate([prev, prev[..., -1:]], axis=-1)
                nd += 1
            pyramid.append(
                prev.reshape(prev.shape[:-1] + (nd // 2, 2)).mean(-1)
            )

        b, h4, w4, _ = fl.shape
        # WTA init from the full correlation volume (no gradient needed):
        # gives the GRU a starting point already near the match instead
        # of a cold zero start far outside its lookup window
        disp = jax.lax.stop_gradient(
            jnp.argmax(corr, axis=-1).astype(jnp.float32)
        )
        gru = ConvGRU(c.hidden_dim, dtype=c.dtype, name="gru")
        # modules are created once; iterations share their weights
        menc = nn.Conv(c.context_dim, (3, 3), padding=1, name="menc",
                       dtype=c.dtype)
        head = nn.Conv(1, (3, 3), padding=1, name="head", dtype=c.dtype)
        outputs = []
        for _ in range(c.iters):
            corr_feat = jnp.concatenate(
                [
                    lookup_corr(lv, disp / float(2 ** i), c.lookup_radius)
                    for i, lv in enumerate(pyramid)
                ],
                axis=-1,
            )
            motion = jnp.concatenate([corr_feat, disp[..., None]], axis=-1)
            motion = jax.nn.relu(menc(motion))
            hidden = gru(hidden, jnp.concatenate([motion, context], axis=-1))
            delta = head(hidden)[..., 0].astype(jnp.float32)
            disp = disp + delta
            outputs.append(disp)

        from video3d_tpu.ops.image import resize2d

        h, w = left.shape[1], left.shape[2]
        ups = [
            jnp.maximum(resize2d(d, h, w, method="bilinear") * 4.0, 0.0)
            for d in (outputs if all_iterations else outputs[-1:])
        ]
        return ups if all_iterations else ups[0]


# ---------------------------------------------------------------------------
# training / checkpointing / guidance entry
# ---------------------------------------------------------------------------


def sequence_loss(disp_seq: Sequence[jnp.ndarray], gt: jnp.ndarray,
                  valid: jnp.ndarray, gamma: float = 0.9) -> jnp.ndarray:
    """Exponentially weighted L1 over refinement iterations (RAFT-style)."""
    n = len(disp_seq)
    total = 0.0
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    for i, d in enumerate(disp_seq):
        weight = gamma ** (n - 1 - i)
        total = total + weight * jnp.sum(jnp.abs(d - gt) * valid) / denom
    return total


@partial(jax.jit, static_argnames=("model", "tx"))
def train_step(model: CREStereoLite, tx, params, opt_state, left, right,
               gt_disp, valid):
    """One optimizer step on a stereo batch; returns (params, opt, loss).

    Inputs may arrive in compact transfer dtypes (uint8 eyes, f16
    labels/validity -- the trainer ships batches that way to cut
    host->device traffic 3.5x); compute is f32 from here on.
    """
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    gt_disp = gt_disp.astype(jnp.float32)
    valid = valid.astype(jnp.float32)

    def loss_fn(p):
        seq = model.apply(p, left, right, all_iterations=True)
        return sequence_loss(seq, gt_disp, valid)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree.map(lambda a, u: a + u, params, updates)
    return params, opt_state, loss


@partial(jax.jit, static_argnames=("model", "tx"), donate_argnums=(2, 3))
def train_step_k(model: CREStereoLite, tx, params, opt_state, lefts,
                 rights, gt_disps, valids):
    """K optimizer steps in ONE dispatch (inputs stacked on a leading K
    axis); returns (params, opt_state, per-step losses (K,)).

    On this dev host each jitted call pays a multi-second relay
    round-trip while the actual step computes in milliseconds, so the
    single-step trainer ran at ~0.2 steps/s regardless of model size.
    ``lax.scan`` over K micro-steps amortizes the dispatch: one
    round-trip buys K steps (the scan body compiles once, independent
    of K). Semantically identical to K calls of :func:`train_step`.
    """
    def body(carry, batch):
        params, opt_state = carry
        left, right, gt_disp, valid = batch
        left = left.astype(jnp.float32)
        right = right.astype(jnp.float32)
        gt_disp = gt_disp.astype(jnp.float32)
        valid = valid.astype(jnp.float32)

        def loss_fn(p):
            seq = model.apply(p, left, right, all_iterations=True)
            return sequence_loss(seq, gt_disp, valid)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        body, (params, opt_state), (lefts, rights, gt_disps, valids)
    )
    return params, opt_state, losses


def save_checkpoint(path: str, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str):
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(path)
    except ValueError:
        # checkpoint saved on a different device type (e.g. TPU ckpt
        # restored on a CPU host): restore device-agnostically to host
        # numpy; arrays move to the default device on first use
        with ocp.PyTreeCheckpointer() as tree_ckptr:
            meta = tree_ckptr.metadata(path).item_metadata
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
                meta.tree if hasattr(meta, "tree") else meta,
            )
            restored = tree_ckptr.restore(
                path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
            )
        return restored


def load_crestereo_guidance(checkpoint: str,
                            cfg: CREStereoConfig = CREStereoConfig(),
                            dtype=jnp.bfloat16,
                            infer_scale_hd: int = 2):
    """Guidance fn for the depth stage: blends a learned full-range
    disparity estimate. ``checkpoint`` is an orbax directory saved by
    :func:`save_checkpoint`; raises if absent (stage degrades to
    stereo-only, reference depth.py:107-114 contract).

    Inference runs the convs in ``dtype`` (params stay f32; bf16 doubles
    MXU throughput) and, for HD inputs (height >= 720), at 1/
    ``infer_scale_hd`` resolution with the disparity rescaled and
    bilinearly upsampled — the guidance contributes a 30% blend, and the
    matcher supplies the full-resolution detail (same trade the DPT
    backend makes with its 384-px inference size)."""
    import os

    if not os.path.isdir(checkpoint):
        raise FileNotFoundError(
            f"CREStereo checkpoint not found: {checkpoint} (train one with "
            "models.crestereo.train_step + save_checkpoint)"
        )
    params = load_checkpoint(checkpoint)
    model = CREStereoLite(dataclasses.replace(cfg, dtype=dtype))
    from video3d_tpu.models.guidance import GuidanceFn
    from video3d_tpu.ops.image import resize2d

    def apply_fn(p, left, right):
        h, w = left.shape[1], left.shape[2]
        s = infer_scale_hd if h >= 720 and infer_scale_hd > 1 else 1
        if s > 1:
            hs, ws = h // s, w // s
            # (B, H, W, 3) -> channel-major for the resize matmuls
            ls = jnp.moveaxis(
                resize2d(jnp.moveaxis(left, -1, 1), hs, ws,
                         method="bilinear"), 1, -1)
            rs = jnp.moveaxis(
                resize2d(jnp.moveaxis(right, -1, 1), hs, ws,
                         method="bilinear"), 1, -1)
            d = model.apply(p, ls, rs) * float(s)
            return resize2d(d, h, w, method="bilinear")
        return model.apply(p, left, right)

    return GuidanceFn(
        apply_fn,
        params,
        stereo=True,  # consumes both eyes (see stages/depth.py)
    )
