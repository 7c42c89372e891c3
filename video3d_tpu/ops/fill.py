"""Disparity hole filling: background extension along scanlines.

SGM leaves invalid pixels (occlusions, uniqueness/LR failures, the
x < D strip). The reference ships them as 0 (reference depth.py:374's
clamp); DIBR consumers generally prefer filled maps. The classic
occlusion fill takes, per hole pixel, the SMALLER of the nearest valid
disparities to its left and right — occluded regions belong to the
background, and background has the smaller disparity.

TPU-first formulation: nearest-valid propagation by LOG-STEP doubling
(k = 1, 2, 4, ... lane shifts with edge masking) instead of a
sequential scan or gathers — ~2*log2(W) masked selects, static shapes,
fuses under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def fill_holes(disp: jnp.ndarray, invalid: float) -> jnp.ndarray:
    """Fill ``disp == invalid`` pixels with min(nearest valid left,
    nearest valid right) along each row; holes with no valid pixel on
    either side (blank rows) stay at ``invalid``.

    disp: (..., W) float; returns same shape/dtype.
    """
    w = disp.shape[-1]
    valid = disp != invalid
    big = jnp.asarray(jnp.inf, disp.dtype)

    def propagate(vals, known, direction):
        # after step k, vals[x] = value of the nearest known pixel
        # within 2^k on the given side (left: from smaller x)
        k = 1
        while k < w:
            if direction == "left":
                cand = jnp.roll(vals, k, axis=-1)
                cand_k = jnp.roll(known, k, axis=-1)
                idx = jax.lax.broadcasted_iota(
                    jnp.int32, vals.shape, vals.ndim - 1)
                in_range = idx >= k
            else:
                cand = jnp.roll(vals, -k, axis=-1)
                cand_k = jnp.roll(known, -k, axis=-1)
                idx = jax.lax.broadcasted_iota(
                    jnp.int32, vals.shape, vals.ndim - 1)
                in_range = idx < w - k
            take = (~known) & cand_k & in_range
            vals = jnp.where(take, cand, vals)
            known = known | take
            k *= 2
        return vals, known

    lv, lk = propagate(jnp.where(valid, disp, big), valid, "left")
    rv, rk = propagate(jnp.where(valid, disp, big), valid, "right")
    fill = jnp.minimum(jnp.where(lk, lv, big), jnp.where(rk, rv, big))
    filled = jnp.where(valid, disp,
                       jnp.where(jnp.isinf(fill),
                                 jnp.asarray(invalid, disp.dtype), fill))
    return filled
