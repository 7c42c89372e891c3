"""CLI: full pipeline orchestrator (reference: run_pipeline.py:132-171)."""

from __future__ import annotations

import argparse
import sys

from video3d_tpu.stages.pipeline import run_pipeline


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-pipeline",
        description="Align -> extract depth -> upscale, one command",
    )
    p.add_argument("sbs_video", help="1080p side-by-side 3D video")
    p.add_argument("video_4k", help="4K 2D video of the same content")
    p.add_argument("--work-dir", default="temp_pipeline")
    p.add_argument("--skip-alignment", action="store_true")
    p.add_argument("--skip-depth", action="store_true")
    p.add_argument("--skip-upscale", action="store_true")
    p.add_argument("--max-frames", type=int, default=None,
                   help="Process only the first N frames (run_pipeline.py:139)")
    p.add_argument("--force", action="store_true",
                   help="Recompute cached artifacts")
    p.add_argument("--guidance", choices=["none", "dpt", "crestereo", "mono"],
                   default="crestereo",
                   help="Neural guidance backend for the depth stage. "
                        "Default matches the depth CLI: the bundled "
                        "CREStereo-lite hybrid (the reference's "
                        "run_pipeline also runs its neural depth "
                        "extractor by default, run_pipeline.py:63-68); "
                        "'none' = stereo-only")
    p.add_argument("--upscale-method", choices=["guided", "adaptive", "scale"],
                   default="adaptive",
                   help="'adaptive' (default): best or tied on every "
                        "eval_upscale.json family; 'guided': reference "
                        "README contract; 'scale': plain-resize parity")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--min-correlation", type=float, default=0.6,
                   help="Stop after alignment below this (align.py:172)")
    p.add_argument("--temporal-smooth", default=None,
                   choices=("none", "median", "flow"),
                   help="Temporal depth filtering for the depth stage")
    p.add_argument("--auto-range", action="store_true",
                   help="Probe and narrow the disparity range before the "
                        "depth stage (see video-3d-depth --auto-range)")
    p.add_argument("--auto-range-shots", action="store_true",
                   help="Per-SHOT auto-range for the depth stage (see "
                        "video-3d-depth --auto-range-shots); in --fused "
                        "mode falls back to the global probe")
    p.add_argument("--guidance-weight", type=float, default=0.7)
    p.add_argument("--blend", default="confidence",
                   choices=("confidence", "fixed"),
                   help="Guidance mixing mode (see video-3d-depth --blend)")
    p.add_argument("--fused", action="store_true",
                   help="Run depth+upscale as one device-resident loop: "
                        "no intermediate PNG round trip (stages/fused.py). "
                        "Default keeps the file-coupled stages whose PNG "
                        "cache enables resume")
    p.add_argument("--encode-preset", default="medium",
                   help="x264 preset for the 4K encode (contract: medium; "
                        "CPU hosts should use veryfast/ultrafast)")
    p.add_argument("--encode-workers", type=int, default=1,
                   help="segment-parallel encoder threads")
    p.add_argument("--encode-threads", type=int, default=0,
                   help="x264 internal frame threads per encoder "
                        "(0 = auto)")
    p.add_argument("--cache-depth", action="store_true",
                   help="In --fused mode, also write the depth PNG cache "
                        "(restores resumability at the cost of the "
                        "readback fused mode otherwise skips)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    result = run_pipeline(
        args.sbs_video,
        args.video_4k,
        work_dir=args.work_dir,
        skip_alignment=args.skip_alignment,
        skip_depth=args.skip_depth,
        skip_upscale=args.skip_upscale,
        max_frames=args.max_frames,
        force=args.force,
        guidance=args.guidance,
        upscale_method=args.upscale_method,
        batch_size=args.batch_size,
        min_correlation=args.min_correlation,
        temporal_smooth=args.temporal_smooth,
        auto_range=args.auto_range,
        auto_range_shots=args.auto_range_shots,
        guidance_weight=args.guidance_weight,
        blend=args.blend,
        fused=args.fused,
        cache_depth=args.cache_depth,
        encode_preset=args.encode_preset,
        encode_workers=args.encode_workers,
        encode_threads=args.encode_threads,
    )
    return 1 if result.get("stopped") else 0


if __name__ == "__main__":
    sys.exit(main())
