"""Shared utilities, mirroring the reference's utils surface (utils.py).

Probing/audio/cache functions live in ``video3d_tpu.core`` and are
re-exported here so code written against the reference's
``video_3d_pipeline.utils`` maps 1:1.
"""

import numpy as np

from video3d_tpu.core import (
    audio_cache_path,
    create_work_directory,
    extract_audio,
    get_video_info,
    load_audio_for_sync,
    verify_video_compatibility,
)
from video3d_tpu.utils.viz import plot_audio_correlation


def find_audio_offset(audio1, audio2, sample_rate):
    """2-tuple surface of the reference utils.py:137-165 (offset, strength)."""
    from video3d_tpu.ops.correlate import find_audio_offset as _impl

    time_offset, strength, _ = _impl(audio1, audio2, sample_rate)
    return time_offset, strength


def calculate_audio_correlation(audio1: np.ndarray, audio2: np.ndarray) -> float:
    """Zero-lag normalized correlation coefficient (reference utils.py:270-289)."""
    n = min(len(audio1), len(audio2))
    a1 = audio1[:n]
    a2 = audio2[:n]
    a1n = (a1 - np.mean(a1)) / (np.std(a1) + 1e-10)
    a2n = (a2 - np.mean(a2)) / (np.std(a2) + 1e-10)
    corr = float(np.sum(a1n * a2n) / max(n, 1))
    if np.isnan(corr):
        corr = 0.0
    return corr


def load_alignment_data(alignment_file: str) -> dict:
    from video3d_tpu.stages.align import load_alignment_data as _impl

    return _impl(alignment_file)


def apply_alignment_offset(alignment_file: str, target_video_path: str,
                           base_start_time: float = 0.0) -> float:
    """Adjusted start time for a target video (reference utils.py:299-326)."""
    from video3d_tpu.stages.align import apply_offset_to_pipeline

    return apply_offset_to_pipeline(alignment_file, str(target_video_path),
                                    base_start_time)


__all__ = [
    "get_video_info",
    "extract_audio",
    "load_audio_for_sync",
    "find_audio_offset",
    "plot_audio_correlation",
    "verify_video_compatibility",
    "load_alignment_data",
    "calculate_audio_correlation",
    "create_work_directory",
    "apply_alignment_offset",
    "audio_cache_path",
]
