"""Host-side visualization: the 4-panel audio-sync analysis figure.

Parity with the reference's ``plot_audio_correlation`` (utils.py:168-225)
-- waveform overlays, full correlation, and a zoom around the peak -- but
takes the already-computed correlation array instead of recomputing the
full O(N log N) correlation like the reference does (utils.py:193).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def plot_audio_correlation(
    audio1: np.ndarray,
    audio2: np.ndarray,
    sample_rate: int,
    time_offset: float,
    work_dir: str | Path,
    correlation: np.ndarray | None = None,
) -> Path:
    """Save sync_analysis.png into work_dir; returns the path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from video3d_tpu.ops.correlate import cross_correlate_full, znormalize

    if correlation is None:
        correlation = np.asarray(
            cross_correlate_full(znormalize(audio2), znormalize(audio1))
        )

    fig, axes = plt.subplots(2, 2, figsize=(14, 8))
    t1 = np.arange(len(audio1)) / sample_rate
    t2 = np.arange(len(audio2)) / sample_rate

    axes[0, 0].plot(t1, audio1, linewidth=0.4)
    axes[0, 0].set_title("Video 1 audio (reference)")
    axes[0, 0].set_xlabel("time (s)")

    axes[0, 1].plot(t2, audio2, linewidth=0.4, color="tab:orange")
    axes[0, 1].set_title("Video 2 audio (to align)")
    axes[0, 1].set_xlabel("time (s)")

    lags = (np.arange(len(correlation)) - (len(audio1) - 1)) / sample_rate
    axes[1, 0].plot(lags, correlation, linewidth=0.4)
    axes[1, 0].axvline(time_offset, color="red", linestyle="--",
                       label=f"offset {time_offset:.3f}s")
    axes[1, 0].set_title("Cross-correlation (full)")
    axes[1, 0].set_xlabel("lag (s)")
    axes[1, 0].legend()

    window = 5.0  # seconds around the peak
    mask = np.abs(lags - time_offset) <= window
    axes[1, 1].plot(lags[mask], correlation[mask], linewidth=0.6)
    axes[1, 1].axvline(time_offset, color="red", linestyle="--")
    axes[1, 1].set_title(f"Correlation zoom (+-{window:.0f}s of peak)")
    axes[1, 1].set_xlabel("lag (s)")

    fig.tight_layout()
    out = Path(work_dir) / "sync_analysis.png"
    fig.savefig(out, dpi=100)
    plt.close(fig)
    print(f"Sync analysis plot saved to: {out}")
    return out
