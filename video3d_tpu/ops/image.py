"""Batched image ops: SBS split, Lanczos resampling, color conversion.

TPU-first formulation: separable resampling (Lanczos-4 / bilinear) is
expressed as dense banded matrix multiplies ``rows^T @ img @ cols`` so the
work lands on the MXU and fuses with neighboring ops under jit, instead of
the reference's per-frame ``cv2.resize`` calls (reference: depth.py:263-266
Lanczos unsqueeze, depth.py:353 guidance resize). Interpolation weights are
precomputed on host once per (size, size') pair and closed over as
constants.

Coordinate convention matches OpenCV: dst pixel x samples src coordinate
``(x + 0.5) * (w_in / w_out) - 0.5`` with border clamping, so outputs agree
with ``cv2.resize`` to rounding tolerance.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# BT.601 luma weights, same as OpenCV RGB2GRAY (reference depth.py:337-338).
_LUMA_RGB = (0.299, 0.587, 0.114)


def rgb_to_gray(frames: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) RGB -> (..., H, W) float32 luma in the input's scale."""
    f = frames.astype(jnp.float32)
    return (
        _LUMA_RGB[0] * f[..., 0]
        + _LUMA_RGB[1] * f[..., 1]
        + _LUMA_RGB[2] * f[..., 2]
    )


def split_sbs(frames: jnp.ndarray):
    """Split side-by-side frames into (left, right) eye views.

    ``frames`` is (..., H, W[, C]); W must be even (reference depth.py:254).
    """
    # channel-last (..., H, W, C) if the trailing dim looks like channels
    axis = -2 if frames.shape[-1] in (1, 3) and frames.ndim >= 3 else -1
    width = frames.shape[axis]
    if width % 2 != 0:
        raise ValueError(f"SBS width must be even, got {width}")
    half = width // 2
    left = jnp.take(frames, jnp.arange(half), axis=axis)
    right = jnp.take(frames, jnp.arange(half, width), axis=axis)
    return left, right


def _lanczos(t: np.ndarray, a: int) -> np.ndarray:
    out = np.sinc(t) * np.sinc(t / a)
    out[np.abs(t) >= a] = 0.0
    return out


@lru_cache(maxsize=64)
def resample_matrix(n_in: int, n_out: int, method: str = "lanczos4") -> np.ndarray:
    """(n_in, n_out) float32 interpolation matrix, rows summing to 1.

    ``resampled = src @ M`` resamples the last axis from n_in to n_out.
    Supports 'lanczos4' (a=4, OpenCV INTER_LANCZOS4 analogue) and 'bilinear'.
    """
    scale = n_in / n_out
    x_out = np.arange(n_out, dtype=np.float64)
    src = (x_out + 0.5) * scale - 0.5  # OpenCV center alignment
    mat = np.zeros((n_in, n_out), dtype=np.float64)
    if method == "lanczos4":
        a = 4
        base = np.floor(src).astype(np.int64)
        for k in range(-a + 1, a + 1):
            idx = base + k
            w = _lanczos(src - idx, a)
            np.add.at(mat, (np.clip(idx, 0, n_in - 1), np.arange(n_out)), w)
    elif method == "bilinear":
        base = np.floor(src).astype(np.int64)
        frac = src - base
        lo = np.clip(base, 0, n_in - 1)
        hi = np.clip(base + 1, 0, n_in - 1)
        np.add.at(mat, (lo, np.arange(n_out)), 1.0 - frac)
        np.add.at(mat, (hi, np.arange(n_out)), frac)
    else:
        raise ValueError(f"Unknown resample method: {method}")
    mat /= mat.sum(axis=0, keepdims=True)
    return mat.astype(np.float32)


@lru_cache(maxsize=64)
def _resample_matrix_on_device(n_in: int, n_out: int, method: str,
                               dev_key: str):
    from video3d_tpu.core.xfer import to_device

    return to_device(resample_matrix(n_in, n_out, method))


def _resample_mat(img, n_in: int, n_out: int, method: str) -> jnp.ndarray:
    """Interpolation matrix for the current context.

    Under tracing the numpy matrix constant-folds into the program (no
    runtime transfer); in eager mode an implicit per-call upload would
    LEAK the matrix buffer on jax 0.9.0 (core/xfer.py), so eager calls
    reuse one cached device-resident copy per (shape, method, backend).
    """
    import jax

    if isinstance(img, jax.core.Tracer):
        return jnp.asarray(resample_matrix(n_in, n_out, method))
    return _resample_matrix_on_device(
        n_in, n_out, method, repr(jax.local_devices()[0])
    )


def resize_width(img: jnp.ndarray, w_out: int, method: str = "lanczos4") -> jnp.ndarray:
    """Resample the last (width) axis of (..., H, W) via one matmul."""
    mat = _resample_mat(img, int(img.shape[-1]), w_out, method)
    return jnp.matmul(img.astype(jnp.float32), mat, precision="highest")


def resize_height(img: jnp.ndarray, h_out: int, method: str = "lanczos4") -> jnp.ndarray:
    """Resample the second-to-last (height) axis of (..., H, W)."""
    mat = _resample_mat(img, int(img.shape[-2]), h_out, method)
    # (..., H, W) -> contract H with (H, H_out): move H last, matmul, move back
    moved = jnp.swapaxes(img.astype(jnp.float32), -1, -2)  # (..., W, H)
    out = jnp.matmul(moved, mat, precision="highest")  # (..., W, H_out)
    return jnp.swapaxes(out, -1, -2)


def resize2d(img: jnp.ndarray, h_out: int, w_out: int,
             method: str = "lanczos4") -> jnp.ndarray:
    """Separable 2-D resize of (..., H, W) -> (..., h_out, w_out)."""
    out = img
    if int(img.shape[-2]) != h_out:
        out = resize_height(out, h_out, method)
    if int(img.shape[-1]) != w_out:
        out = resize_width(out, w_out, method)
    return out.astype(jnp.float32) if out.dtype != jnp.float32 else out


def unsqueeze_width(img: jnp.ndarray, method: str = "lanczos4") -> jnp.ndarray:
    """Anamorphic 2x horizontal unsqueeze (reference depth.py:263-266).

    Each SBS half holds a full-height, half-width eye view; this restores
    the full width with Lanczos-4, as one (W/2, W) matmul on the MXU.
    """
    return resize_width(img, int(img.shape[-1]) * 2, method)
