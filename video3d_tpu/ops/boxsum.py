"""Windowed box sums via integral images (TPU-fast).

``lax.reduce_window`` costs O(window) adds per pixel on TPU; these
helpers cost O(1) per pixel using cumulative sums combined with static
slices/concats only (gathers are slow and (..., 1)-minor temporaries pad
128x under TPU tiling). Shared by the speckle filter and the guided
filter, and usable for any SAD/box aggregation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_sum_axis(x: jnp.ndarray, axis: int, r: int) -> jnp.ndarray:
    """Sum over a clipped window [i-r, i+r] along ``axis``."""
    n = x.shape[axis]
    r = min(r, n - 1)  # window clips at the borders; r >= n-1 spans all
    if r <= 0:
        return x
    c = jnp.cumsum(x, axis=axis)
    last = jax.lax.slice_in_dim(c, n - 1, n, axis=axis)
    hi = jnp.concatenate(
        [jax.lax.slice_in_dim(c, r, n, axis=axis), jnp.repeat(last, r, axis=axis)],
        axis=axis,
    )
    zeros_shape = list(x.shape)
    zeros_shape[axis] = r + 1
    lo = jnp.concatenate(
        [
            jnp.zeros(zeros_shape, c.dtype),
            jax.lax.slice_in_dim(c, 0, n - r - 1, axis=axis),
        ],
        axis=axis,
    )
    return hi - lo


def box_sum_2d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Windowed sum over (2r+1)^2 neighborhoods of the last two axes."""
    return box_sum_axis(box_sum_axis(x, -2, r), -1, r)


def window_area(h: int, w: int, r: int, dtype=jnp.float32) -> jnp.ndarray:
    """True (border-clipped) window area per pixel, (h, w)."""
    ones = jnp.ones((h, w), dtype)
    return box_sum_2d(ones, r)
