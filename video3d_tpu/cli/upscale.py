"""CLI: depth upscale + encode (reference: upscale.py:126-158).

``--method guided`` (default) is the edge-preserving upscale the reference
README promises; ``--method scale`` is plain-resize parity with its
shipped ffmpeg path (SURVEY.md SS2.4-3). ``--use-nvenc`` is accepted for
flag parity and maps to the software encoder.
"""

from __future__ import annotations

import argparse
import sys

from video3d_tpu.stages.upscale import DepthUpscaler


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-upscale",
        description="Upscale a depth-map sequence to a 4K source's geometry "
        "and encode",
    )
    p.add_argument("depth_dir", help="Directory of depth_*.png maps")
    p.add_argument("video_4k", help="4K source (target geometry/fps + guide)")
    p.add_argument("--work-dir", default="temp_upscale")
    p.add_argument("--output", default=None,
                   help="Output path (default: depth_4k_<dirname>.mp4)")
    p.add_argument("--method", choices=["guided", "adaptive", "scale"],
                   default="adaptive",
                   help="'adaptive' (default): per-pixel mix of guided "
                        "and plain by local depth/guide gradient "
                        "correlation -- best or tied on every "
                        "eval_upscale.json family; 'guided': the "
                        "edge-preserving filter the reference README "
                        "promises; 'scale': plain-resize parity")
    p.add_argument("--guide-mode", choices=["gray", "color"], default="gray",
                   help="Guided-filter guide: luma (fast) or full RGB "
                   "covariance (also preserves iso-luminant color edges)")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--radius", type=int, default=8,
                   help="Guided-filter window radius")
    p.add_argument("--eps", type=float, default=1e-3,
                   help="Guided-filter regularization")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--alignment-file", default=None,
                   help="alignment_data.json from video-3d-align; shifts the "
                   "4K guide reader by the measured offset so guide frames "
                   "pair with depth frames (extract_aligned.py:56-81 math)")
    p.add_argument("--guide-start-frame", type=int, default=None,
                   help="Explicit 4K guide start frame (overrides "
                   "--alignment-file)")
    p.add_argument("--png16-out", action="store_true",
                   help="Write a full-precision uint16 PNG sequence instead "
                   "of an 8-bit H.264 video")
    p.add_argument("--crf", type=int, default=18,
                   help="x264 rate factor (reference contract: 18)")
    p.add_argument("--preset", default="medium",
                   help="x264 preset (reference contract: medium; CPU "
                        "hosts encoding 4K should use veryfast/ultrafast)")
    p.add_argument("--encode-workers", type=int, default=1,
                   help="segment-parallel encoder threads (>1 scales "
                        "with host cores; native box-level concat)")
    p.add_argument("--encode-threads", type=int, default=0,
                   help="x264 internal frame threads per encoder "
                        "(0 = auto; scales one encoder across cores "
                        "without segment bookkeeping)")
    p.add_argument("--use-nvenc", action="store_true",
                   help="Accepted for parity (upscale.py:15); software encode")
    p.add_argument("--force", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    guide_start = 0
    if args.guide_start_frame is not None:
        guide_start = args.guide_start_frame
    elif args.alignment_file:
        from video3d_tpu.stages.align import load_alignment_data
        from video3d_tpu.stages.pipeline import alignment_start_frames

        sbs_start, guide_start = alignment_start_frames(
            load_alignment_data(args.alignment_file)
        )
        if sbs_start:
            print(
                f"Note: offset is negative; assuming the depth sequence was "
                f"extracted from SBS frame {sbs_start} (guide starts at 0)"
            )
    upscaler = DepthUpscaler(
        work_dir=args.work_dir,
        use_nvenc=args.use_nvenc,
        method=args.method,
        batch_size=args.batch_size,
        radius=args.radius,
        eps=args.eps,
        guide_mode=args.guide_mode,
        crf=args.crf,
        preset=args.preset,
        encode_workers=args.encode_workers,
        encode_threads=args.encode_threads,
    )
    out = upscaler.process_depth_upscaling(
        args.depth_dir,
        args.video_4k,
        output_path=args.output,
        force=args.force,
        max_frames=args.max_frames,
        png16_out=args.png16_out,
        guide_start_frame=guide_start,
    )
    print(f"Depth video: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
