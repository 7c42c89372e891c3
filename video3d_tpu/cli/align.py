"""CLI: temporal alignment (reference: align.py:161-202).

The reference gates low-correlation results behind an interactive
``input()`` (align.py:190-192); here ``--min-correlation`` sets the
failure threshold directly and the exit code reports the outcome.
"""

from __future__ import annotations

import argparse
import sys

from video3d_tpu.stages.align import VideoAligner


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-align",
        description="Find the time offset between two videos via audio "
        "cross-correlation",
    )
    p.add_argument("video1", help="Reference video (e.g. 1080p SBS)")
    p.add_argument("video2", help="Video to align against it (e.g. 4K)")
    p.add_argument("--work-dir", default="temp_alignment")
    p.add_argument(
        "--max-audio", type=float, default=300.0,
        help="Seconds of audio to analyze (reference align.py:37)",
    )
    p.add_argument(
        "--tolerance-frames", type=float, default=2.0,
        help="Frame tolerance for the quality rating (align.py:87)",
    )
    p.add_argument(
        "--min-correlation", type=float, default=0.6,
        help="Fail (exit 1) below this correlation strength (align.py:172)",
    )
    p.add_argument("--no-plot", action="store_true",
                   help="Skip the 4-panel sync-analysis PNG")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    aligner = VideoAligner(args.video1, args.video2, work_dir=args.work_dir)
    alignment = aligner.find_alignment(
        max_audio_length=args.max_audio, plot=not args.no_plot
    )
    quality = aligner.assess_alignment_quality(
        alignment, tolerance_frames=args.tolerance_frames
    )
    print(f"Alignment quality: {quality}")
    if alignment["correlation_strength"] < args.min_correlation:
        print(
            f"FAIL: correlation {alignment['correlation_strength']:.3f} < "
            f"{args.min_correlation}"
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
