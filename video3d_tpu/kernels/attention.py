"""Pallas TPU kernel: one-block fused self-attention for short sequences.

The DPT ViT backbone runs 24 attention layers at S=577 tokens (576
patches + cls, 384^2/16^2). XLA materializes each layer's (B, N, S, S)
f32 score tensor in HBM three times over (write, softmax round-trip,
AV read) — measured ~80% of the backbone's runtime. Generic flash
attention fixes the traffic but pays streaming-softmax overhead tuned
for long sequences; at S<=1024 the whole (S, S) score tile FITS IN
VMEM (640x640 f32 = 1.6 MB), so this kernel just computes
softmax(QK^T)V per (batch, head) grid step with a plain (exact,
single-pass) softmax and zero HBM intermediates.

Measured A/B at DPT shapes (B=4, N=16, S=577, D=64, bf16,
tools/profile_hybrid.py): isolated attention rows are within run-to-run
noise (~0.10-0.14 ms/frame-layer all three ways), but at the FULL
BACKBONE level the XLA path wins decisively — 3.80 ms/frame (24 blocks)
vs 4.47 with the fused kernel — because XLA fuses the attention into
the surrounding projections, which an opaque pallas_call blocks. The
earlier "fused kernel 24% faster" readings were timing artifacts of a
degraded relay. These kernels are therefore OPT-IN
(VIDEO3D_TPU_DPT_FUSED_ATTN=1|oneblock), kept as the A/B baseline for
future toolchains and longer sequences.

Sequences pad to a lane multiple; padded key columns are masked to
-inf before the softmax, padded query rows are sliced away by the
wrapper. Matmuls run on the MXU in bf16 with f32 accumulation — the
same precision contract as the XLA einsum path
(preferred_element_type=f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _oneblock_kernel(q_ref, k_ref, v_ref, o_ref, *, s: int, scale: float):
    qf = q_ref[0, 0]  # (SP, D)
    kf = k_ref[0, 0]
    vf = v_ref[0, 0]
    dn = (((1,), (1,)), ((), ()))
    sc = jax.lax.dot_general(qf, kf, dn,
                             preferred_element_type=jnp.float32) * scale
    cols = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
    sc = jnp.where(cols < s, sc, -1e30)  # mask padded keys
    m = jnp.max(sc, axis=1, keepdims=True)
    p = jnp.exp(sc - m)
    z = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(vf.dtype), vf,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / z).astype(o_ref.dtype)


def _multihead_kernel(q_ref, k_ref, v_ref, o_ref, *, s: int, scale: float,
                      heads: int):
    # Statically unrolled head loop: one grid step computes `heads`
    # attention heads back to back, so the (640, 640) matmul + softmax
    # work per step is `heads` times larger and the per-step grid/DMA
    # overhead (measured dominant at S=577, D=64: 10.6 us/step vs ~2 us
    # of math) amortizes away.
    for h in range(heads):
        qf = q_ref[0, h]  # (SP, D)
        kf = k_ref[0, h]
        vf = v_ref[0, h]
        dn = (((1,), (1,)), ((), ()))
        sc = jax.lax.dot_general(qf, kf, dn,
                                 preferred_element_type=jnp.float32) * scale
        cols = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
        sc = jnp.where(cols < s, sc, -1e30)
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m)
        z = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vf.dtype), vf,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / z).astype(o_ref.dtype)


def attention_multihead(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        sm_scale: float, heads_per_step: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """Like :func:`attention_oneblock` but each grid step processes a
    group of heads, amortizing per-step overhead; the score tile is
    reused scratch across the group. Grid: (B, N / heads_per_step).
    """
    b, n, s, d = q.shape
    hps = heads_per_step
    while n % hps:
        hps //= 2
    sp = -(-s // 128) * 128
    # VMEM: 3 in blocks + out block (double-buffered) + score scratch
    if (8 * hps * sp * d * q.dtype.itemsize + sp * sp * 4) > 13 * 2**20:
        raise ValueError(f"multihead block too large at S={s}, hps={hps}")
    if sp != s:
        padw = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        q, k, v = jnp.pad(q, padw), jnp.pad(k, padw), jnp.pad(v, padw)
    spec = pl.BlockSpec((1, hps, sp, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_multihead_kernel, s=s, scale=float(sm_scale),
                          heads=hps),
        grid=(b, n // hps),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, sp, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :s] if sp != s else out


def attention_oneblock(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       sm_scale: float,
                       interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T * sm_scale) v for (B, N, S, D) heads, S <= ~1500.

    One grid step per (batch, head); the full (S, S) score tile lives in
    VMEM. Raises ValueError for sequences whose padded score tile would
    not fit the VMEM budget — callers fall back to the XLA path.
    """
    b, n, s, d = q.shape
    sp = -(-s // 128) * 128
    if sp * sp * 4 + 3 * sp * d * 4 > 12 * 2**20:
        raise ValueError(f"score tile too large for VMEM at S={s}")
    if sp != s:
        padw = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        q, k, v = jnp.pad(q, padw), jnp.pad(k, padw), jnp.pad(v, padw)
    spec = pl.BlockSpec((1, 1, sp, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_oneblock_kernel, s=s, scale=float(sm_scale)),
        grid=(b, n),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, sp, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :s] if sp != s else out
