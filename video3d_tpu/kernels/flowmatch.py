"""Pallas TPU kernel: fused one-level flow block matcher (flow-EMA).

The XLA formulation of :func:`video3d_tpu.ops.flow._flow_level` emits,
per pyramid level, 25 shifted candidate planes, 25 |diff| planes and 50
cumulative-sum box passes — every one a full-size HBM intermediate. At
the flow resolutions used by the smoother (<= 270x480) the whole level
fits VMEM many times over, so this kernel runs the complete level —
candidate shifts, clipped-window SADs, softargmin with online
rescaling, residual box smoothing — in ONE grid step with zero HBM
intermediates.

Semantics (matched exactly, in f32):

* candidates are edge-replicated static shifts of the warped previous
  frame (``shift_edge``);
* per-candidate cost = border-clipped box sum of |cur - cand| divided
  by the true per-pixel window area (``box_sum_2d`` / ``window_area``);
* weights = softmax(-(cost - min_cost) / tau) over the candidate grid,
  computed here as an online min-rescaled accumulation so only three
  accumulator planes stay live instead of 25 cost planes;
* the softargmin residual is smoothed by an area-normalized box of
  radius 2 and added to the incoming flow.

The upstream warp stays in :mod:`video3d_tpu.kernels.warp` (it is
already a fused Pallas pair); this kernel covers everything after it.

Reference for intent: the reference pipeline has no temporal filter at
all (readme.md:17 lists temporal consistency as future work); this is
first-party TPU design, not a port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _zshift(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """out[i] = x[i + k] with zeros outside (clipped-window box term)."""
    if k == 0:
        return x
    n = x.shape[axis]
    rolled = pltpu.roll(x, (-k) % n, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    oob = idx >= n - k if k > 0 else idx < -k
    return jnp.where(oob, jnp.asarray(0.0, x.dtype), rolled)


def _eshift(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """out[i] = x[i + k], edge-replicated (shift_edge semantics)."""
    if k == 0:
        return x
    n = x.shape[axis]
    rolled = pltpu.roll(x, (-k) % n, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if k > 0:
        edge = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        return jnp.where(idx >= n - k, edge, rolled)
    edge = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    return jnp.where(idx < -k, edge, rolled)


def _boxsum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Border-clipped (2r+1)^2 box sum, all static rolls."""
    for axis in (0, 1):
        acc = x
        for k in range(1, r + 1):
            acc = acc + _zshift(x, k, axis) + _zshift(x, -k, axis)
        x = acc
    return x


def _inv_area(shape, r: int) -> jnp.ndarray:
    """1 / true window area per pixel (border-clipped), via iota."""
    h, w = shape
    ys = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    cnt_y = (jnp.minimum(ys, r) + jnp.minimum(h - 1 - ys, r) + 1)
    cnt_x = (jnp.minimum(xs, r) + jnp.minimum(w - 1 - xs, r) + 1)
    return 1.0 / (cnt_y * cnt_x).astype(jnp.float32)


def _match_kernel(cur_ref, prev_ref, fy_ref, fx_ref, oy_ref, ox_ref, *,
                  search: int, radius: int, tau: float):
    cur = cur_ref[...]
    prev = prev_ref[...]
    inv_area = _inv_area(cur.shape, radius)
    inv_tau = jnp.float32(1.0 / tau)

    # online softargmin: running min m, rescaled accumulators (ws, wy, wx)
    big = jnp.float32(3.4e38)
    m = jnp.full_like(cur, big)
    ws = jnp.zeros_like(cur)
    wy = jnp.zeros_like(cur)
    wx = jnp.zeros_like(cur)
    for dy in range(-search, search + 1):
        cand_y = _eshift(prev, dy, 0)
        for dx in range(-search, search + 1):
            cand = _eshift(cand_y, dx, 1)
            c = _boxsum(jnp.abs(cur - cand), radius) * inv_area
            m_new = jnp.minimum(m, c)
            # scale <= 1 rescales history to the new reference min; the
            # first candidate sees exp(-inf -> 0) * 0 history via where
            scale = jnp.where(ws > 0.0, jnp.exp((m_new - m) * inv_tau), 0.0)
            u = jnp.exp((m_new - c) * inv_tau)
            ws = ws * scale + u
            wy = wy * scale + jnp.float32(dy) * u
            wx = wx * scale + jnp.float32(dx) * u
            m = m_new
    ry = wy / ws
    rx = wx / ws

    inv_area2 = _inv_area(cur.shape, 2)
    oy_ref[...] = fy_ref[...] + _boxsum(ry, 2) * inv_area2
    ox_ref[...] = fx_ref[...] + _boxsum(rx, 2) * inv_area2


def flow_match_pallas(cur: jnp.ndarray, prev_w: jnp.ndarray,
                      fy: jnp.ndarray, fx: jnp.ndarray, search: int = 2,
                      radius: int = 3, tau: float = 2.0,
                      interpret: bool = False):
    """Fused softargmin block match at one pyramid level.

    ``prev_w``: previous frame already warped by (fy, fx). Returns
    (fy', fx') = incoming flow + smoothed softargmin residual, matching
    :func:`video3d_tpu.ops.flow._flow_level` after its warp bit-for-bit
    in exact arithmetic (f32 association order differs).

    Whole-array blocks: one grid step per image, everything VMEM-
    resident. Flow levels are <= ~270x480 f32 (~0.5 MB padded), far
    under the 16 MiB scoped-VMEM budget even with the unrolled
    candidate loop's live temporaries.
    """
    h, w = cur.shape
    spec = pl.BlockSpec((h, w), lambda: (0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_match_kernel, search=search, radius=radius,
                             tau=float(tau))
    out = jax.ShapeDtypeStruct((h, w), jnp.float32)
    # the unrolled candidate loop keeps ~40 plane-sized temporaries live
    # (Mosaic scheduler); at 270x480 that is ~24 MiB -- over the 16 MiB
    # default scoped-vmem limit but nowhere near the chip's 128 MiB
    # VMEM, so raise the limit instead of tiling (tiling would need
    # search+radius halos on overlapping blocks, which BlockSpec cannot
    # express)
    est = 48 * ((-(-h // 8) * 8) * (-(-w // 128) * 128) * 4)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=min(max(est, 16 * 2**20), 100 * 2**20))
    return pl.pallas_call(
        kern, grid=(),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(out, out),
        interpret=interpret,
        compiler_params=cparams,
    )(cur.astype(jnp.float32), prev_w.astype(jnp.float32),
      fy.astype(jnp.float32), fx.astype(jnp.float32))
