"""On-device audio cross-correlation for temporal alignment.

TPU-native replacement for the reference's scipy/librosa alignment math
(reference: utils.py:137-165). The full-mode cross-correlation is computed
once on device via real FFTs padded to a power of two, and the same array
feeds both the offset search and the diagnostic plot -- the reference
recomputed the entire O(N log N) correlation a second time for plotting
(utils.py:147 and utils.py:193).

Numeric contract (SURVEY.md SS2.5):
* z-normalize with eps = 1e-10;
* full-mode correlation, lag = argmax|corr| - len(audio1) + 1;
* strength = |corr[peak]| / sqrt(sum(a1n^2) * sum(a2n^2)).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def znormalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Zero-mean unit-variance normalization (reference utils.py:143-144)."""
    return (x - jnp.mean(x)) / (jnp.std(x) + eps)


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@partial(jax.jit, static_argnames=("n_full",))
def _correlate_fft(a: jnp.ndarray, b: jnp.ndarray, n_full: int) -> jnp.ndarray:
    """full-mode correlate(a, b) == convolve(a, b[::-1]) via rfft.

    Matches ``scipy.signal.correlate(a, b, mode='full')`` semantics: output
    length len(a)+len(b)-1, index ``len(b)-1`` is zero lag.
    """
    nfft = _next_pow2(n_full)
    fa = jnp.fft.rfft(a.astype(jnp.float32), nfft)
    fb = jnp.fft.rfft(b[::-1].astype(jnp.float32), nfft)
    out = jnp.fft.irfft(fa * fb, nfft)
    return out[:n_full]


def cross_correlate_full(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-mode FFT cross-correlation of two 1-D signals (device-side)."""
    n_full = int(a.shape[0]) + int(b.shape[0]) - 1
    return _correlate_fft(a, b, n_full)


@partial(jax.jit, static_argnames=("len1",))
def _offset_from_correlation(
    correlation: jnp.ndarray, a1n: jnp.ndarray, a2n: jnp.ndarray, len1: int
):
    peak = jnp.argmax(jnp.abs(correlation))
    peak_value = correlation[peak]
    sample_offset = peak - (len1 - 1)
    auto1 = jnp.sum(a1n * a1n)
    auto2 = jnp.sum(a2n * a2n)
    strength = jnp.abs(peak_value) / jnp.sqrt(auto1 * auto2)
    return sample_offset, strength


def find_audio_offset(
    audio1: np.ndarray, audio2: np.ndarray, sample_rate: int
) -> Tuple[float, float, np.ndarray]:
    """Time offset of audio2 relative to audio1 via device correlation.

    Returns ``(time_offset_seconds, correlation_strength, correlation)``;
    the correlation array is returned so the caller can plot it without
    recomputing. Math per reference utils.py:137-165: the correlation is
    ``correlate(audio2_norm, audio1_norm, 'full')`` and the lag is
    ``argmax|corr| - len(audio1) + 1`` samples.
    """
    # explicit placement: audio tracks are 10s-100s of MB and a serve
    # process aligns many jobs; implicit uploads leak (core/xfer.py)
    from video3d_tpu.core.xfer import to_device

    a1 = to_device(np.asarray(audio1, np.float32))
    a2 = to_device(np.asarray(audio2, np.float32))
    a1n = znormalize(a1)
    a2n = znormalize(a2)
    correlation = cross_correlate_full(a2n, a1n)
    sample_offset, strength = _offset_from_correlation(
        correlation, a1n, a2n, int(a1.shape[0])
    )
    time_offset = float(sample_offset) / float(sample_rate)
    return time_offset, float(strength), np.asarray(correlation)
