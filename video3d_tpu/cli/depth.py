"""CLI: stereo depth extraction (reference: depth.py:479-538).

Flag parity: ``--stereo-only``/``--no-neural`` select guidance='none'
(depth.py:507), ``--no-unsqueeze`` disables the anamorphic restore
(depth.py:509), ``--max-frames``/``--start-frame`` window the run,
``--force`` busts the cache. Additions: ``--guidance`` picks the backend
explicitly (resolving SURVEY.md SS2.4-1/4) and ``--per-frame-normalize``
opts into the reference's per-frame min-max (SS2.4-8).
"""

from __future__ import annotations

import argparse
import sys

from video3d_tpu.stages.depth import StereoDepthExtractor


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="video-3d-depth",
        description="Extract depth maps from a side-by-side 3D video",
    )
    p.add_argument("video", help="SBS stereoscopic video")
    p.add_argument("--work-dir", default="temp_depth")
    p.add_argument("--start-frame", type=int, default=0)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="Frames per device batch (auto from memory if unset)")
    p.add_argument("--guidance", default=None,
                   choices=["none", "dpt", "crestereo", "mono"],
                   help="Neural guidance backend. Default: crestereo -- "
                        "the backend the reference INTENDED (its "
                        "depth.py:1 docstring, readme.md:112 and "
                        "CREStereo_model.txt all name CREStereo; the "
                        "committed code loads DPT only because the "
                        "integration was never checked in, SURVEY "
                        "2.4-4) and the one with a bundled TRAINED "
                        "checkpoint. 'dpt' is load-ready for real "
                        "Intel/dpt-large weights but unvalidated "
                        "offline; without weights it soft-falls-back "
                        "to stereo-only.")
    p.add_argument("--stereo-only", action="store_true",
                   help="Disable neural guidance (depth.py:507)")
    p.add_argument("--no-neural", action="store_true",
                   help="Alias of --stereo-only (depth.py:507)")
    p.add_argument("--model", default="Intel/dpt-large",
                   help="Guidance checkpoint (depth.py:26)")
    p.add_argument("--no-unsqueeze", action="store_true",
                   help="Skip the 2x anamorphic unsqueeze (depth.py:509)")
    p.add_argument("--per-frame-normalize", action="store_true",
                   help="Reference parity: per-frame min-max normalization "
                   "(depth.py:399-404)")
    p.add_argument("--no-speckle", action="store_true",
                   help="Skip speckle filtering")
    p.add_argument("--fill-holes", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Fill invalid pixels (occlusions, LR/uniqueness "
                        "failures) with the background-extension "
                        "occlusion fill (min of nearest valid left/"
                        "right neighbor) before any guidance blend. "
                        "Default: AUTO -- on whenever neural guidance "
                        "is active (the filled map is the confidence "
                        "blend's stereo base; better on every "
                        "eval_stereo.json family), off for stereo-only "
                        "(reference parity: holes ship as 0)")
    p.add_argument("--auto-range", action="store_true",
                   help="Probe a frame sample and narrow the disparity "
                        "range to the content (SGM cost is linear in "
                        "the range; 64 -> 32 nearly halves matcher "
                        "time). The cache key reflects the chosen "
                        "range.")
    p.add_argument("--range-sample-frames", type=int, default=6)
    p.add_argument("--auto-range-shots", action="store_true",
                   help="Per-SHOT auto-range: segment the clip at cuts "
                        "(downsampled-luma spike detector), probe D per "
                        "shot, process each shot at its own range into "
                        "one shared cache. Also resets the temporal "
                        "smoother at every cut.")
    p.add_argument("--shot-threshold", type=float, default=24.0,
                   help="Mean-luma-change cut threshold (0-255 scale) "
                        "for --auto-range-shots")
    p.add_argument("--guidance-weight", type=float, default=0.7,
                   help="Stereo weight of the FIXED guidance blend "
                        "(reference contract 0.7; only used with "
                        "--blend fixed)")
    p.add_argument("--blend", default="confidence",
                   choices=("confidence", "fixed"),
                   help="Guidance mixing: 'confidence' (default) weights "
                        "stereo per pixel by its SGM uniqueness margin "
                        "(learned backend takes over where matching "
                        "starves); 'fixed' is the reference 0.7/0.3 "
                        "contract (depth.py:358-363)")
    p.add_argument("--trust-scale", type=int, default=1, choices=[1, 2, 4],
                   help="Resolution divisor of the guidance trust field "
                        "(blend='confidence'): 1 = exact full-res local "
                        "agreement; 2/4 pool the agreement mass before "
                        "the windowed sums (same support, ~s^2 cheaper). "
                        "Quality-gated in eval_stereo.json "
                        "(hybrid_conf_ts4): 4 saves ~0.5 ms/frame at "
                        "1080p with equal-or-better EPE but bad1 "
                        "+0.007-0.009 on the OOD families, so full-res "
                        "stays the default")
    p.add_argument("--guidance-every", type=int, default=4,
                   help="Run the neural guidance on every Kth frame of a "
                        "batch and reuse it in between (keyframe "
                        "guidance). The per-frame SSI alignment and "
                        "trust gate re-anchor/mask stale guidance. The "
                        "default K=4 is quality-equal to per-frame on "
                        "the temporal eval (eval_keyframe.json: RMSE "
                        "+5%%, flicker LOWER, edge error equal) at ~30%% "
                        "higher hybrid throughput; 1 restores the "
                        "reference's per-frame inference (depth.py:348)")
    p.add_argument("--temporal-smooth", default=None,
                   choices=("none", "median", "flow"),
                   help="Temporal depth filtering: 'median' = median-of-3 "
                        "(flicker removal), 'flow' = optical-flow-guided "
                        "EMA (stronger smoothing, motion-compensated, "
                        "scene-cut aware)")
    p.add_argument("--flow-scale", type=int, default=4, choices=(2, 4),
                   help="Flow-EMA motion-estimation granularity: the flow "
                        "runs on a 1/N-resolution guide. 2 = finer motion "
                        "edges (less ghosting on moving objects) at ~4x "
                        "flow cost; 4 = throughput default")
    p.add_argument("--temporal-median", action="store_true",
                   help="Median-of-3 temporal smoothing over the frame "
                   "stream (stereo advantage the reference leaves unused, "
                   "readme.md:17)")
    p.add_argument("--force", action="store_true",
                   help="Recompute even if cached (depth.py:435-437)")
    p.add_argument("--multihost", action="store_true",
                   help="Process only this host's contiguous share of the "
                   "frame stream (jax.process_index) into a shared, "
                   "globally numbered cache dir")
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address for "
                   "--multihost runs (host:port)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--profile-dir", default=None,
                   help="Write a jax.profiler trace (TensorBoard format) "
                   "of the run to this directory")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.guidance is not None:
        guidance = args.guidance
    elif args.stereo_only or args.no_neural:
        guidance = "none"
    else:
        # the backend the reference intended AND the one that works out
        # of the box (bundled trained checkpoint); see --guidance help
        guidance = "crestereo"
    extractor = StereoDepthExtractor(
        work_dir=args.work_dir,
        batch_size=args.batch_size,
        guidance=guidance,
        model_checkpoint=args.model,
        unsqueeze_anamorphic=not args.no_unsqueeze,
        normalize="per_frame" if args.per_frame_normalize else "fixed",
        apply_speckle=not args.no_speckle,
        temporal_median=args.temporal_median,
        temporal_smooth=args.temporal_smooth,
        flow_scale=args.flow_scale,
        stereo_weight=args.guidance_weight,
        blend=args.blend,
        fill_holes=args.fill_holes,
        guidance_every=args.guidance_every,
        trust_scale=args.trust_scale,
    )
    from video3d_tpu.utils.profiling import trace

    with trace(args.profile_dir):
        # jax.distributed.initialize must run before ANY backend use, and
        # the --auto-range probe is a JAX computation -- so in multihost
        # mode init first, probe after (the probe is deterministic, every
        # host picks the same range and hence the same cache key).
        if args.multihost:
            from video3d_tpu.parallel.multihost import initialize

            initialize(args.coordinator, args.num_processes, args.process_id)
        if args.auto_range:
            extractor.apply_auto_range(
                args.video,
                start_frame=args.start_frame,
                n_frames=args.max_frames,
                sample_frames=args.range_sample_frames,
            )
        if args.auto_range_shots:
            if args.multihost:
                print("--auto-range-shots is not supported with "
                      "--multihost (shard by host instead)")
                return 1
            cache = extractor.process_video_sbs_shots(
                args.video,
                start_frame=args.start_frame,
                max_frames=args.max_frames,
                force=args.force,
                sample_frames=args.range_sample_frames,
                shot_threshold=args.shot_threshold,
            )
        elif args.multihost:
            cache = extractor.process_video_sbs_sharded(
                args.video, max_frames=args.max_frames, force=args.force
            )
        else:
            cache = extractor.process_video_sbs(
                args.video,
                start_frame=args.start_frame,
                max_frames=args.max_frames,
                force=args.force,
            )
    print(f"Depth maps: {cache}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
