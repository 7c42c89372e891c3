"""Fused depth -> upscale: device-to-device stage coupling.

The reference couples its stages strictly through disk files
(run_pipeline.py:61-111): depth writes a uint16 PNG per frame and the
upscaler reads the sequence back. Our default pipeline keeps that
artifact contract (it IS the resume mechanism) -- but when both stages
run in one invocation the round trip is pure overhead: per 1080p frame,
a 4 MB device->host readback, a PNG encode, a PNG decode and a 4 MB
host->device re-upload, all to hand a tensor from one jitted program to
the next.

``run_fused_depth_upscale`` keeps the depth batch on device and feeds it
straight into the guided upsampler: the only device traffic left is the
SBS upload, the 4K guide upload, and the final 4K uint8 readback for
encoding. The PNG cache path remains the default in the orchestrator
(``fused=False``); fused mode trades resumability of the intermediate
for throughput and can still emit the depth cache (``cache_depth=True``)
at the cost of the extra readback.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from video3d_tpu.core.xfer import to_device

from video3d_tpu.core import VideoReader, VideoWriter, get_video_info
from video3d_tpu.ops.guided import (
    adaptive_upsample,
    guided_upsample,
    plain_upsample,
)
from video3d_tpu.stages.depth import StereoDepthExtractor, depth_batch_pipeline


class _GuideFIFO:
    """Sequential 4K guide frames, buffered to absorb smoother lag.

    Temporal smoothers emit depth batches a little behind the input
    stream (median lags one batch); the guided filter must still pair
    depth frame i with guide frame ``guide_start + i``. Decoded guide
    batches queue here and are consumed by emitted-frame count.
    """

    def __init__(self, reader_iter):
        self._it = reader_iter
        self._buf: list = []  # per-frame uint8 (H, W, 3) arrays
        self._dry = False

    def take(self, n: int) -> Optional[np.ndarray]:
        while len(self._buf) < n and not self._dry:
            try:
                batch, valid = next(self._it)
            except StopIteration:
                self._dry = True
                break
            for j in range(valid):
                self._buf.append(batch[j])
        if len(self._buf) < n:
            return None  # guide ran dry: caller degrades to plain resize
        out = np.stack(self._buf[:n])
        del self._buf[:n]
        return out


def run_fused_depth_upscale(
    sbs_video: str,
    video_4k: str,
    output_path: str,
    sbs_start_frame: int = 0,
    guide_start_frame: int = 0,
    max_frames: Optional[int] = None,
    extractor: Optional[StereoDepthExtractor] = None,
    upscale_method: str = "adaptive",
    guide_mode: str = "gray",
    radius: int = 8,
    eps: float = 1e-3,
    batch_size: Optional[int] = None,
    cache_depth: bool = False,
    cache_dir: Optional[Path] = None,
    crf: int = 18,
    preset: str = "medium",
    encode_workers: int = 1,
    encode_threads: int = 0,
) -> Dict:
    """SBS video -> 4K depth video in one device-resident loop.

    Returns ``{"output", "frames", "seconds", "fps", "depth_dir"?}``.
    ``cache_depth`` additionally writes the uint16 depth PNG cache (the
    resume artifact) at the cost of the 1080p readback it otherwise
    skips; ``cache_dir`` must then name the extractor's cache dir.
    """
    extractor = extractor or StereoDepthExtractor()
    info_sbs = get_video_info(str(sbs_video))
    info_4k = get_video_info(str(video_4k))
    if info_sbs is None or info_4k is None:
        raise RuntimeError("Cannot probe input videos")
    out_w, out_h, fps = info_4k["width"], info_4k["height"], info_4k["fps"]

    n_total = info_sbs["frames"] - sbs_start_frame
    n_frames = min(n_total, max_frames) if max_frames is not None else n_total

    extractor.load_model()
    batch = (
        batch_size
        or extractor.batch_size
        or extractor._auto_batch_size(info_sbs["height"], info_sbs["width"])
    )

    reader = VideoReader(
        str(sbs_video),
        start_frame=sbs_start_frame,
        max_frames=n_frames,
        batch_size=batch,
    )
    guide = None
    if upscale_method in ("guided", "adaptive"):
        guide = _GuideFIFO(
            iter(
                VideoReader(
                    str(video_4k),
                    start_frame=guide_start_frame,
                    max_frames=n_frames,
                    batch_size=batch,
                )
            )
        )

    smoother = None
    if extractor.temporal_median:
        from video3d_tpu.parallel.temporal import TemporalMedianStream

        smoother = TemporalMedianStream()
    elif extractor.temporal_smooth == "flow":
        from video3d_tpu.parallel.temporal import TemporalFlowEMAStream

        smoother = TemporalFlowEMAStream()
    want_guide = extractor.temporal_smooth == "flow"

    depth_writer_cm = None
    if cache_depth:
        from video3d_tpu.core.depthio import DepthMapWriter

        if cache_dir is None:
            raise ValueError("cache_depth=True requires cache_dir")
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        depth_writer_cm = DepthMapWriter(Path(cache_dir))

    guidance_params = getattr(extractor._guidance_fn, "params", None)
    print(
        f"Fused depth+upscale: {n_frames} frames, batch={batch}, "
        f"guidance={extractor.guidance}, -> {out_w}x{out_h} "
        f"({upscale_method})"
    )

    t0 = time.time()
    emitted = 0
    result: Dict = {}

    def upscale_batch(depth_dev, n_valid):
        """Depth batch (device uint16) -> 4K batch (device uint8)."""
        g = guide.take(n_valid) if guide is not None else None
        if g is not None and upscale_method == "adaptive":
            if n_valid < depth_dev.shape[0]:
                pad = np.zeros(
                    (depth_dev.shape[0] - n_valid,) + g.shape[1:], g.dtype
                )
                g = np.concatenate([g, pad])
            return adaptive_upsample(
                depth_dev,
                to_device(g),
                out_h,
                out_w,
                radius=radius,
                eps=eps,
                out_dtype="uint8",
            )
        if g is not None:
            if guide_mode == "gray":
                import cv2

                g = np.stack(
                    [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in g]
                )
            # pad the guide tail to the static batch shape
            if n_valid < depth_dev.shape[0]:
                pad = np.zeros(
                    (depth_dev.shape[0] - n_valid,) + g.shape[1:], g.dtype
                )
                g = np.concatenate([g, pad])
            return guided_upsample(
                depth_dev,
                to_device(g),
                out_h,
                out_w,
                radius=radius,
                eps=eps,
                guide_mode=guide_mode,
                out_dtype="uint8",
            )
        return plain_upsample(depth_dev, out_h, out_w, out_dtype="uint8")

    if encode_workers > 1:
        from video3d_tpu.core import SegmentParallelVideoWriter

        writer_cm = SegmentParallelVideoWriter(
            str(output_path), out_w, out_h, fps, workers=encode_workers,
            crf=crf, preset=preset,
            threads=encode_threads if encode_threads > 0 else 1,
        )
    else:
        writer_cm = VideoWriter(
            str(output_path), out_w, out_h, fps, crf=crf, preset=preset,
            threads=encode_threads,
        )
    with writer_cm as writer:
        try:
            # one batch in flight: the pending 4K readback+encode overlaps
            # the current batch's decode and device compute
            pending = None  # (device uint8 4K batch, n_valid)

            def drain(p):
                up_dev, n_valid = p
                up = np.asarray(up_dev)
                for j in range(n_valid):
                    writer.write(up[j])

            for frames, valid in reader:
                depth = depth_batch_pipeline(
                    to_device(frames),
                    params=extractor.params,
                    unsqueeze=extractor.unsqueeze_anamorphic,
                    normalize=extractor.normalize,
                    apply_speckle=extractor.apply_speckle,
                    guidance_fn=extractor._guidance_fn,
                    guidance_params=guidance_params,
                    return_guide=want_guide,
                    stereo_weight=extractor.stereo_weight,
                    blend=getattr(extractor, "blend", "confidence"),
                )
                if want_guide:
                    depth, motion_guide = depth
                if smoother is not None:
                    out = (
                        smoother.push(depth[:valid], motion_guide[:valid])
                        if want_guide
                        else smoother.push(depth[:valid])
                    )
                else:
                    out = depth[:valid] if valid < batch else depth
                if out is None or out.shape[0] == 0:
                    continue
                n_out = int(out.shape[0])
                if depth_writer_cm is not None:
                    depth_writer_cm.put(np.asarray(out), emitted, n_out)
                if n_out < batch:  # pad on device: one static jit shape
                    out = jnp.concatenate(
                        [out, jnp.zeros((batch - n_out,) + out.shape[1:],
                                        out.dtype)]
                    )
                up_dev = upscale_batch(out, n_out)
                if pending is not None:
                    drain(pending)
                pending = (up_dev, n_out)
                emitted += n_out
                if emitted % 100 < n_out:
                    dt = time.time() - t0
                    print(
                        f"  {emitted} frames "
                        f"({emitted / max(dt, 1e-9):.1f} fps)"
                    )
            if smoother is not None:
                out = smoother.flush()
                if out is not None and out.shape[0]:
                    n_out = int(out.shape[0])
                    if depth_writer_cm is not None:
                        depth_writer_cm.put(np.asarray(out), emitted, n_out)
                    if n_out < batch:
                        out = jnp.concatenate(
                            [out, jnp.zeros((batch - n_out,) + out.shape[1:],
                                            out.dtype)]
                        )
                    up_dev = upscale_batch(out, n_out)
                    if pending is not None:
                        drain(pending)
                    pending = (up_dev, n_out)
                    emitted += n_out
            if pending is not None:
                drain(pending)
        finally:
            if depth_writer_cm is not None:
                depth_writer_cm.__exit__(None, None, None)

    dt = time.time() - t0
    print(
        f"Fused pipeline done: {emitted} frames in {dt:.1f}s "
        f"({emitted / max(dt, 1e-9):.1f} fps) -> {output_path}"
    )
    result.update(
        {
            "output": str(output_path),
            "frames": emitted,
            "seconds": round(dt, 3),
            "fps": round(emitted / max(dt, 1e-9), 3),
        }
    )
    if cache_dir is not None and cache_depth:
        result["depth_dir"] = str(cache_dir)
    return result
