"""One-command orchestrator: align -> depth -> upscale.

Parity with the reference's ``run_pipeline`` (reference:
run_pipeline.py:16-129): per-step wall-clock timing, skip flags,
``--max-frames`` windowing, ``--force`` cache busting, printed summary.
Differences by design: the depth extractor has a working canonical name
(SURVEY.md SS2.4-1), timings are returned as a dict (machine-readable,
not just printed), and there are no interactive gates.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

from video3d_tpu.stages.align import VideoAligner, load_alignment_data
from video3d_tpu.stages.depth import StereoDepthExtractor
from video3d_tpu.stages.upscale import DepthUpscaler


def alignment_start_frames(alignment: Dict) -> tuple:
    """(sbs_start_frame, guide_start_frame) from an alignment artifact.

    Offset semantics match the reference (extract_aligned.py:56-81,
    align.py:119-147): an event at time ``t`` on video1's (SBS) timeline
    occurs at ``t + offset`` on video2's (4K) timeline.  So for
    ``offset >= 0`` the SBS stream starts at 0 and the 4K guide reader
    skips ``offset`` seconds; for ``offset < 0`` the guide starts at 0
    and the SBS depth extraction skips ``-offset`` seconds.  Each start
    is converted to frames at that video's own fps and clamped at 0
    (the reference clamps the same way, extract_aligned.py:58-62).
    """
    offset = float(alignment["time_offset_seconds"])
    fps1 = float(alignment.get("video1_fps") or 0.0) or 23.976
    fps2 = float(alignment.get("video2_fps") or 0.0) or fps1
    if offset >= 0:
        return 0, int(round(offset * fps2))
    return int(round(-offset * fps1)), 0


def run_pipeline(
    sbs_video: str,
    video_4k: str,
    work_dir: str = "temp_pipeline",
    skip_alignment: bool = False,
    skip_depth: bool = False,
    skip_upscale: bool = False,
    max_frames: Optional[int] = None,
    force: bool = False,
    guidance: str = "crestereo",
    upscale_method: str = "adaptive",
    batch_size: Optional[int] = None,
    min_correlation: float = 0.6,
    temporal_smooth: Optional[str] = None,
    auto_range: bool = False,
    auto_range_shots: bool = False,
    guidance_weight: float = 0.7,
    blend: str = "confidence",
    fused: bool = False,
    cache_depth: bool = False,
    encode_preset: str = "medium",
    encode_workers: int = 1,
    encode_threads: int = 0,
) -> Dict:
    """Run the full pipeline; returns artifacts + per-step timings.

    ``min_correlation`` is the proceed threshold of the reference
    (align.py:172): below it the pipeline stops after alignment instead of
    asking interactively.

    ``fused=True`` runs depth+upscale as ONE device-resident loop
    (stages/fused.py): no intermediate PNG write/read, no extra
    device<->host round trip per frame. The default (False) keeps the
    reference's file-coupled stages (run_pipeline.py:61-111), whose PNG
    cache is the resume mechanism; ``cache_depth=True`` makes fused mode
    also write that cache.
    """
    work = Path(work_dir)
    work.mkdir(parents=True, exist_ok=True)
    timings: Dict[str, float] = {}
    result: Dict = {"work_dir": str(work), "timings": timings}
    t_total = time.time()

    # Step 1: temporal alignment (run_pipeline.py:37-59)
    alignment_file = work / "alignment_data.json"
    alignment = None
    if not skip_alignment:
        t0 = time.time()
        aligner = VideoAligner(sbs_video, video_4k, work_dir=str(work))
        alignment = aligner.find_alignment()
        quality = aligner.assess_alignment_quality(alignment)
        timings["alignment"] = time.time() - t0
        result["alignment"] = alignment
        result["alignment_quality"] = quality
        if alignment["correlation_strength"] < min_correlation:
            print(
                f"Stopping: correlation {alignment['correlation_strength']:.3f} "
                f"< {min_correlation} (use skip_alignment to override)"
            )
            result["stopped"] = "low_correlation"
            timings["total"] = time.time() - t_total
            return result
    elif alignment_file.exists():
        # resume: a prior run's offset still applies to depth/upscale
        alignment = load_alignment_data(str(alignment_file))

    # Thread the measured offset through the later stages: depth reads
    # the SBS stream from its aligned start, and the guided upscaler
    # shifts its 4K guide reader so guide frame i pairs with depth frame
    # i (the reference leaves this to a manual extract_aligned pre-cut,
    # extract_aligned.py:56-81).
    sbs_start, guide_start = (
        alignment_start_frames(alignment) if alignment else (0, 0)
    )
    if sbs_start or guide_start:
        print(
            f"Applying alignment offset: SBS starts at frame {sbs_start}, "
            f"4K guide at frame {guide_start}"
        )
        result["sbs_start_frame"] = sbs_start
        result["guide_start_frame"] = guide_start

    # Fused mode: depth + upscale in one device-resident loop
    if fused and not skip_depth and not skip_upscale:
        from video3d_tpu.core.cache import depth_cache_dir
        from video3d_tpu.stages.fused import run_fused_depth_upscale

        t0 = time.time()
        extractor = StereoDepthExtractor(
            work_dir=str(work), guidance=guidance, batch_size=batch_size,
            temporal_smooth=temporal_smooth, stereo_weight=guidance_weight,
            blend=blend,
        )
        if auto_range_shots:
            print("fused mode runs one device loop; using the global "
                  "--auto-range probe instead of per-shot ranges")
            auto_range = True
        if auto_range:
            extractor.apply_auto_range(
                sbs_video, start_frame=sbs_start, n_frames=max_frames
            )
        cache = None
        if cache_depth:
            cache = depth_cache_dir(
                extractor.work_dir, str(sbs_video), sbs_start,
                max_frames if max_frames is not None else "all",
                extractor._model_key(), extractor.unsqueeze_anamorphic,
            )
        out_name = work / f"depth_4k_fused_{Path(sbs_video).stem}.mp4"
        fused_res = run_fused_depth_upscale(
            sbs_video,
            video_4k,
            str(out_name),
            sbs_start_frame=sbs_start,
            guide_start_frame=guide_start,
            max_frames=max_frames,
            extractor=extractor,
            upscale_method=upscale_method,
            cache_depth=cache_depth,
            cache_dir=cache,
            preset=encode_preset,
            encode_workers=encode_workers,
            encode_threads=encode_threads,
        )
        timings["depth+upscale (fused)"] = time.time() - t0
        result.update(fused_res)
        timings["total"] = time.time() - t_total
        print("\nPipeline summary (run_pipeline.py:113-127 contract):")
        for step, dt in timings.items():
            print(f"  {step:>10}: {dt:8.1f}s")
        print(f"  output: {result['output']}")
        return result

    # Step 2: depth extraction (run_pipeline.py:61-88)
    depth_dir: Optional[Path] = None
    if not skip_depth:
        t0 = time.time()
        extractor = StereoDepthExtractor(
            work_dir=str(work), guidance=guidance, batch_size=batch_size,
            temporal_smooth=temporal_smooth, stereo_weight=guidance_weight,
            blend=blend,
        )
        if auto_range_shots:
            depth_dir = extractor.process_video_sbs_shots(
                sbs_video,
                start_frame=sbs_start,
                max_frames=max_frames,
                force=force,
            )
        else:
            if auto_range:
                extractor.apply_auto_range(
                    sbs_video, start_frame=sbs_start, n_frames=max_frames
                )
            depth_dir = extractor.process_video_sbs(
                sbs_video,
                start_frame=sbs_start,
                max_frames=max_frames,
                force=force,
            )
        timings["depth"] = time.time() - t0
        result["depth_dir"] = str(depth_dir)

    # Step 3: guided upscale + encode (run_pipeline.py:90-111)
    if not skip_upscale:
        if depth_dir is None:
            # resume: locate the most recent depth cache in the work dir
            candidates = sorted(
                work.glob("depth_*/"), key=lambda p: p.stat().st_mtime
            )
            if not candidates:
                raise RuntimeError(
                    "No depth cache found; run the depth step first"
                )
            depth_dir = candidates[-1]
        t0 = time.time()
        upscaler = DepthUpscaler(
            work_dir=str(work), method=upscale_method,
            preset=encode_preset, encode_workers=encode_workers,
            encode_threads=encode_threads,
        )
        output = upscaler.process_depth_upscaling(
            str(depth_dir),
            video_4k,
            force=force,
            max_frames=max_frames,
            guide_start_frame=guide_start,
        )
        timings["upscale"] = time.time() - t0
        result["output"] = str(output)

    timings["total"] = time.time() - t_total
    print("\nPipeline summary (run_pipeline.py:113-127 contract):")
    for step, dt in timings.items():
        print(f"  {step:>10}: {dt:8.1f}s")
    if "output" in result:
        print(f"  output: {result['output']}")
    return result
