"""Temporal alignment stage: audio cross-correlation between two videos.

Stage-level parity with the reference's ``VideoAligner``
(reference: align.py:13-116) -- same artifact (``alignment_data.json``
schema, align.py:65-76), same quality gates (SURVEY.md SS2.5) -- with the
correlation computed on device (video3d_tpu.ops.correlate) and reused for
the diagnostic plot instead of recomputed.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

from video3d_tpu.core import (
    create_work_directory,
    extract_audio,
    get_video_info,
    load_audio_for_sync,
    verify_video_compatibility,
)
from video3d_tpu.ops.correlate import find_audio_offset
from video3d_tpu.utils.viz import plot_audio_correlation

AUDIO_SAMPLE_RATE = 22050  # reference utils.py:42
DEFAULT_MAX_AUDIO = 300.0  # reference align.py:37


class VideoAligner:
    """Find the time offset between two videos of the same content."""

    def __init__(self, video1_path: str, video2_path: str,
                 work_dir: str = "temp_alignment"):
        self.video1_path = Path(video1_path)
        self.video2_path = Path(video2_path)
        self.work_dir = create_work_directory(work_dir)

        # Compatibility gate (reference align.py:22); warn, don't abort.
        if not verify_video_compatibility(str(video1_path), str(video2_path)):
            print("Warning: videos may not be compatible for alignment")

        self.video1_info = get_video_info(str(video1_path))
        self.video2_info = get_video_info(str(video2_path))
        if self.video1_info is None or self.video2_info is None:
            raise ValueError("Could not probe one of the input videos")

    def find_alignment(self, max_audio_length: float = DEFAULT_MAX_AUDIO,
                       plot: bool = True) -> Dict:
        """Compute offset and write alignment_data.json (align.py:37-85)."""
        audio1_path = extract_audio(
            str(self.video1_path), self.work_dir, max_audio_length,
            AUDIO_SAMPLE_RATE)
        audio2_path = extract_audio(
            str(self.video2_path), self.work_dir, max_audio_length,
            AUDIO_SAMPLE_RATE)

        audio1, sr1 = load_audio_for_sync(audio1_path, max_audio_length)
        audio2, sr2 = load_audio_for_sync(audio2_path, max_audio_length)
        if sr1 != sr2:
            print(f"Warning: Sample rate mismatch: {sr1} vs {sr2}")

        time_offset, correlation_strength, correlation = find_audio_offset(
            audio1, audio2, sr1)

        if plot:
            plot_audio_correlation(audio1, audio2, sr1, time_offset,
                                   self.work_dir, correlation=correlation)

        # audio-only inputs probe with fps=0; fall back to film cadence so
        # offset_frames/quality gates stay meaningful (reference assumes a
        # real video stream, upscale.py:26 default 23.976)
        fps = self.video1_info["fps"] or 23.976
        frame_duration = 1.0 / fps
        offset_frames = time_offset / frame_duration

        print(f"Audio alignment: {time_offset:.3f}s offset "
              f"({offset_frames:.1f} frames)")
        print(f"Correlation strength: {correlation_strength:.4f}")

        # Artifact schema identical to reference align.py:65-76.
        alignment_data = {
            "video1_path": str(self.video1_path),
            "video2_path": str(self.video2_path),
            "time_offset_seconds": float(time_offset),
            "offset_frames": float(offset_frames),
            "correlation_strength": float(correlation_strength),
            "frame_duration": float(frame_duration),
            "video1_fps": self.video1_info["fps"],
            "video2_fps": self.video2_info["fps"],
            "sample_rate": int(sr1),
            "audio_length_analyzed": float(max_audio_length),
        }
        alignment_file = self.work_dir / "alignment_data.json"
        with open(alignment_file, "w") as f:
            json.dump(alignment_data, f, indent=2)
        print(f"Alignment data saved to: {alignment_file}")
        return alignment_data

    def assess_alignment_quality(self, alignment_data: Dict,
                                 tolerance_frames: float = 2.0) -> str:
        """EXCELLENT/GOOD/MODERATE/POOR rating (reference align.py:87-116)."""
        offset = alignment_data["time_offset_seconds"]
        correlation = alignment_data["correlation_strength"]
        frame_duration = alignment_data["frame_duration"]
        precision_limit = frame_duration * tolerance_frames

        print("\nAlignment Assessment:")
        print(f"Frame precision limit: +-{precision_limit:.3f}s "
              f"({tolerance_frames} frames)")
        if abs(offset) < precision_limit:
            quality = "EXCELLENT"
            print(f"{quality}: offset {offset:.3f}s is within frame precision")
        elif correlation > 0.8:
            quality = "GOOD"
            print(f"{quality}: strong correlation ({correlation:.3f})")
        elif correlation > 0.6:
            quality = "MODERATE"
            print(f"{quality}: acceptable correlation ({correlation:.3f}) "
                  "- verify results")
        else:
            quality = "POOR"
            print(f"{quality}: low correlation ({correlation:.3f}) - videos "
                  "may not be from the same source")
        return quality


def load_alignment_data(alignment_file: str) -> Dict:
    """Load a previously computed alignment artifact (align.py:150-158)."""
    path = Path(alignment_file)
    if not path.exists():
        raise FileNotFoundError(f"Alignment file not found: {alignment_file}")
    with open(path) as f:
        return json.load(f)


def apply_offset_to_pipeline(
    alignment_file: str,
    target_video: str,
    start_time: float = 0.0,
    duration: Optional[float] = None,
) -> float:
    """Adjusted start time for a video given the stored offset (align.py:119-147).

    video1 is the reference timeline; video2 events occur ``offset`` seconds
    later, so its start time is shifted by +offset and clamped at 0.
    """
    data = load_alignment_data(alignment_file)
    offset = data["time_offset_seconds"]
    if str(target_video) == data["video1_path"]:
        adjusted = start_time
    elif str(target_video) == data["video2_path"]:
        adjusted = start_time + offset
    else:
        raise ValueError(f"Target video {target_video} not found in alignment data")
    if adjusted < 0:
        print(f"Warning: Adjusted start time {adjusted:.3f}s < 0, using 0")
        adjusted = 0.0
    return adjusted
