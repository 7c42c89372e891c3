"""Synchronized segment extraction from two aligned videos.

Stage parity with the reference's ``AlignedExtractor``
(reference: extract_aligned.py:16-218): consumes the alignment JSON
artifact, computes per-video extraction windows (video2's timeline is
shifted by the stored offset, clamped at 0), validates requests against
both videos' bounds, and cuts the clips.

Cutting prefers ffmpeg stream copy (the reference's ``-c copy`` contract,
extract_aligned.py:124-133: frame-accurate-ish, no re-encode); on hosts
without ffmpeg, MP4 inputs go through the native box-level remuxer
(native/mp4box.cc -- same keyframe-snap stream-copy semantics, zero
re-encode), and only non-MP4 containers degrade to an OpenCV
decode/re-encode of the window.
The interactive ``input()`` confirmation gate of the reference
(extract_aligned.py:274-276) is replaced by an ``assume_yes`` flag
(SURVEY.md SS2.4-11).
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from video3d_tpu.core import get_video_info
from video3d_tpu.stages.align import load_alignment_data


class AlignedExtractor:
    """Cut synchronized clips from both videos using the stored offset."""

    def __init__(self, alignment_file: str):
        self.alignment_data = load_alignment_data(alignment_file)
        self.video1_path = Path(self.alignment_data["video1_path"])
        self.video2_path = Path(self.alignment_data["video2_path"])
        self.offset = float(self.alignment_data["time_offset_seconds"])
        for p in (self.video1_path, self.video2_path):
            if not p.exists():
                raise FileNotFoundError(f"Video not found: {p}")
        self.video1_info = get_video_info(str(self.video1_path))
        self.video2_info = get_video_info(str(self.video2_path))

    # -- window math (extract_aligned.py:56-81) -----------------------------

    def calculate_extraction_times(
        self, start_frame: int, duration_seconds: float
    ) -> Dict:
        """Per-video (start, duration) for a window given in video1 frames.

        video2 events occur ``offset`` seconds later on its own timeline,
        so its start is shifted by +offset and clamped at 0 with a warning
        (reference extract_aligned.py:66-76).
        """
        fps1 = self.video1_info["fps"]
        start1 = start_frame / fps1
        start2 = start1 + self.offset
        if start2 < 0:
            print(f"Warning: video2 start {start2:.3f}s < 0, clamping to 0")
            start2 = 0.0
        return {
            "video1": {"start": start1, "duration": duration_seconds},
            "video2": {"start": start2, "duration": duration_seconds},
            "start_frame": start_frame,
            "offset_applied": self.offset,
        }

    # -- validation (extract_aligned.py:185-218) ----------------------------

    def validate_extraction_request(
        self, start_frame: int, duration_seconds: float
    ) -> Tuple[bool, List[str]]:
        """Bounds-check the window against both videos."""
        problems: List[str] = []
        times = self.calculate_extraction_times(start_frame, duration_seconds)
        if start_frame < 0:
            problems.append("start_frame must be >= 0")
        if duration_seconds <= 0:
            problems.append("duration must be positive")
        for name, info in (("video1", self.video1_info), ("video2", self.video2_info)):
            end = times[name]["start"] + times[name]["duration"]
            total = info["duration"]
            if times[name]["start"] >= total:
                problems.append(
                    f"{name}: start {times[name]['start']:.1f}s beyond "
                    f"duration {total:.1f}s"
                )
            elif end > total:
                problems.append(
                    f"{name}: window ends at {end:.1f}s beyond "
                    f"duration {total:.1f}s"
                )
        return (not problems, problems)

    # -- cutting (extract_aligned.py:83-145) --------------------------------

    def _cut(self, video: Path, start: float, duration: float, out: Path) -> None:
        if shutil.which("ffmpeg"):
            cmd = [
                shutil.which("ffmpeg"), "-y", "-v", "error",
                "-ss", f"{start:.6f}", "-t", f"{duration:.6f}",
                "-i", str(video), "-c", "copy", str(out),
            ]
            res = subprocess.run(cmd, capture_output=True)
            if res.returncode != 0:
                raise RuntimeError(
                    f"ffmpeg segment cut failed: {res.stderr.decode()[:400]}"
                )
            return
        # native box-level stream copy (no re-encode): same keyframe-snap
        # contract as ffmpeg -ss -c copy (native/mp4box.cc)
        if video.suffix.lower() in (".mp4", ".m4v", ".mov"):
            from video3d_tpu.core._native import cut_mp4

            err = cut_mp4(str(video), str(out), start, duration)
            if err is None:
                return
            print(f"Native mp4 cut unavailable ({err}); re-encoding")
        # decode-window-and-re-encode fallback through the core reader/
        # writer: libav in-process (x264 + frame-accurate seek) when
        # built, OpenCV/mp4v otherwise (core/video.py backend order)
        from video3d_tpu.core.probe import get_video_info
        from video3d_tpu.core.video import VideoReader, VideoWriter

        info = get_video_info(str(video))
        if info is None:
            raise RuntimeError(f"Cannot probe {video}")
        fps = info["fps"] or 24.0
        n = int(round(duration * fps))
        reader = VideoReader(
            str(video), start_frame=int(round(start * fps)), max_frames=n
        )
        with VideoWriter(
            str(out), info["width"], info["height"], fps
        ) as writer:
            for batch, valid in reader:
                for j in range(valid):
                    writer.write(batch[j])

    def extract_segment(
        self,
        start_frame: int,
        duration_seconds: float,
        output_dir: str = "extracted_segments",
        tag: Optional[str] = None,
    ) -> Dict[str, Path]:
        """Cut one synchronized segment from both videos.

        Output naming mirrors the reference's per-video segment files
        within ``output_dir``; returns {'video1': path, 'video2': path}.
        """
        ok, problems = self.validate_extraction_request(
            start_frame, duration_seconds
        )
        if not ok:
            raise ValueError("Invalid extraction request: " + "; ".join(problems))
        times = self.calculate_extraction_times(start_frame, duration_seconds)
        outdir = Path(output_dir)
        outdir.mkdir(parents=True, exist_ok=True)
        tag = tag or f"f{start_frame}_d{duration_seconds:g}"
        results: Dict[str, Path] = {}
        for name, video in (
            ("video1", self.video1_path),
            ("video2", self.video2_path),
        ):
            out = outdir / f"{video.stem}_{tag}{video.suffix}"
            print(
                f"Extracting {name}: {times[name]['start']:.3f}s "
                f"+{duration_seconds:g}s -> {out}"
            )
            self._cut(video, times[name]["start"], duration_seconds, out)
            results[name] = out
        return results

    def extract_multiple_segments(
        self,
        segments: List[Tuple[int, float]],
        output_dir: str = "extracted_segments",
    ) -> List[Dict[str, Path]]:
        """Cut several (start_frame, duration) windows
        (reference extract_aligned.py:147-171)."""
        return [
            self.extract_segment(sf, dur, output_dir) for sf, dur in segments
        ]

    def info(self) -> Dict:
        """Summary of the alignment + both videos (--info mode,
        extract_aligned.py:262-269)."""
        return {
            "video1": str(self.video1_path),
            "video2": str(self.video2_path),
            "offset_seconds": self.offset,
            "video1_duration": self.video1_info["duration"],
            "video2_duration": self.video2_info["duration"],
            "video1_fps": self.video1_info["fps"],
            "video2_fps": self.video2_info["fps"],
            "correlation_strength": self.alignment_data.get(
                "correlation_strength"
            ),
        }
