"""CLI: synchronized segment extraction (reference: extract_aligned.py:221-290).

``--info`` prints the alignment summary; ``--validate`` checks bounds
without cutting. The reference's interactive confirmation
(extract_aligned.py:274-276) is replaced by ``--yes`` (SURVEY.md SS2.4-11).
"""

from __future__ import annotations

import argparse
import json
import sys

from video3d_tpu.stages.extract import AlignedExtractor


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-extract",
        description="Cut synchronized clips from two aligned videos",
    )
    p.add_argument("alignment_file", help="alignment_data.json from the "
                   "alignment stage")
    p.add_argument("--start-frame", type=int, default=0,
                   help="Window start, in video1 frames")
    p.add_argument("--duration", type=float, default=60.0,
                   help="Window length in seconds")
    p.add_argument("--output-dir", default="extracted_segments")
    p.add_argument("--info", action="store_true",
                   help="Print alignment info and exit")
    p.add_argument("--validate", action="store_true",
                   help="Validate the window and exit")
    p.add_argument("--yes", "-y", action="store_true",
                   help="Proceed without confirmation even if validation "
                   "warns (replaces the reference's input() gate)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    extractor = AlignedExtractor(args.alignment_file)

    if args.info:
        print(json.dumps(extractor.info(), indent=2))
        return 0

    ok, problems = extractor.validate_extraction_request(
        args.start_frame, args.duration
    )
    if args.validate:
        print("VALID" if ok else "INVALID: " + "; ".join(problems))
        return 0 if ok else 1
    if not ok:
        print("Validation failed: " + "; ".join(problems))
        if not args.yes:
            return 1
        print("Proceeding anyway (--yes)")

    results = extractor.extract_segment(
        args.start_frame, args.duration, output_dir=args.output_dir
    )
    for name, path in results.items():
        print(f"{name}: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
