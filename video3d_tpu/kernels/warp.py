"""Pallas TPU kernels: gather-free bilinear warp (flow-EMA hot path).

The XLA formulation of :func:`video3d_tpu.ops.flow.warp_bilinear_shifts`
materializes 2*(2r+1) full-size shifted intermediates in HBM (~1 GB of
traffic per 1080p frame at r=16, ~10 ms). These kernels read each plane
ONCE into VMEM and run the hat-weighted shift accumulation in-core:

* vertical pass: blocks span the full height, shifts are sublane rolls;
* horizontal pass: blocks span the full width, shifts are lane rolls;
* edge replication via iota masks against the border row/column,
  matching ``shift_edge`` exactly.

Semantics are identical to the XLA path (same op order per k, f32), so
CPU parity tests run the kernels in interpret mode against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(span: int, other: int, quantum: int,
                budget: int = 12 * 2**20) -> int:
    """Largest divisor of ``span`` that is a multiple of ``quantum`` (or
    the whole span) whose f32 working set fits the budget; 0 if none.

    The working-set factor is ~16 block-sized buffers: blocks for
    img/f/out (double-buffered) plus the unrolled shift loop's live
    temporaries — Mosaic's scheduler keeps several ``rolled``/``wk``
    values in flight (measured 24 MiB scoped at factor-5 sizing, i.e.
    ~14.5 buffers)."""
    cands = [span] + [
        x for x in range(span - quantum, 0, -quantum) if span % x == 0
    ]
    for c in cands:
        if c == span or c % quantum == 0:
            if 16 * c * other * 4 <= budget:
                return c
    return 0


def _vwarp_kernel(img_ref, f_ref, out_ref, *, r: int):
    img = img_ref[...]
    f = f_ref[...]
    h = img.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, img.shape, 0)
    top = img[0:1]
    bot = img[h - 1 : h]
    acc = jnp.zeros_like(img)
    for k in range(-r, r + 1):
        if k == 0:
            shifted = img
        else:
            rolled = pltpu.roll(img, (-k) % h, axis=0)
            if k > 0:  # out[y] = img[y+k]; y+k > h-1 clamps to last row
                shifted = jnp.where(rows >= h - k, bot, rolled)
            else:
                shifted = jnp.where(rows < -k, top, rolled)
        wk = jnp.maximum(0.0, 1.0 - jnp.abs(f - k))
        acc = acc + wk * shifted
    out_ref[...] = acc


def _hwarp_kernel(img_ref, f_ref, out_ref, *, r: int):
    img = img_ref[...]
    f = f_ref[...]
    w = img.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    left = img[:, 0:1]
    right = img[:, w - 1 : w]
    acc = jnp.zeros_like(img)
    for k in range(-r, r + 1):
        if k == 0:
            shifted = img
        else:
            rolled = pltpu.roll(img, (-k) % w, axis=1)
            if k > 0:
                shifted = jnp.where(cols >= w - k, right, rolled)
            else:
                shifted = jnp.where(cols < -k, left, rolled)
        wk = jnp.maximum(0.0, 1.0 - jnp.abs(f - k))
        acc = acc + wk * shifted
    out_ref[...] = acc


def warp_bilinear_shifts_pallas(img: jnp.ndarray, flow_y: jnp.ndarray,
                                flow_x: jnp.ndarray, r: int,
                                interpret: bool = False) -> jnp.ndarray:
    """(H, W) f32 warp by clamped flow, one HBM read per pass.

    Returns None-equivalent fallback is the caller's job: raises
    ValueError when no Mosaic-legal tiling exists for the shape.
    """
    h, w = img.shape
    img = img.astype(jnp.float32)
    fy = jnp.clip(flow_y, -r, r).astype(jnp.float32)
    fx = jnp.clip(flow_x, -r, r).astype(jnp.float32)

    wb = _pick_block(w, h, 128)
    hb = _pick_block(h, w, 8)
    if wb == 0 or hb == 0:
        raise ValueError(f"no legal warp tiling for shape {img.shape}")

    vspec = pl.BlockSpec((h, wb), lambda i: (0, i), memory_space=pltpu.VMEM)
    mid = pl.pallas_call(
        functools.partial(_vwarp_kernel, r=r),
        grid=(w // wb,),
        in_specs=[vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        interpret=interpret,
    )(img, fy)

    hspec = pl.BlockSpec((hb, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_hwarp_kernel, r=r),
        grid=(h // hb,),
        in_specs=[hspec, hspec],
        out_specs=hspec,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        interpret=interpret,
    )(mid, fx)
