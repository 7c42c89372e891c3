"""Depth upscaling + encode stage (reference: upscale.py:12-123).

Reads the depth PNG16 sequence, upscales to the 4K source's resolution and
encodes H.264 at its fps. Two methods:

* ``method='guided'`` (default) -- edge-preserving guided-filter upscale on
  device, guided by the 4K RGB frames (the behavior the reference README
  promises but never shipped, SURVEY.md SS2.4-3);
* ``method='scale'`` -- plain resize parity with the reference's ffmpeg
  ``scale`` path (upscale.py:50);
* ``method='adaptive'`` -- per-pixel mix of guided-color and plain by
  local depth/guide edge agreement (ops.guided.adaptive_upsample;
  matches or beats the better single method on every eval family of
  tools/eval_upscale.py).

Encode contract matches upscale.py:47-63: h264, crf=18, preset=medium,
yuv420p, fps from the 4K source; output ``depth_4k_<dirname>.mp4``
(upscale.py:99-100); existing output short-circuits (upscale.py:105-107).
Depth frames are 16-bit internally; the encoded video carries the top 8
bits (the reference's PNG->yuv420p conversion likewise quantizes to 8).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np
from video3d_tpu.core.xfer import to_device

from video3d_tpu.core import (
    VideoReader,
    VideoWriter,
    get_video_info,
    list_depth_frames,
    load_depth_png16,
)
from video3d_tpu.ops.guided import (
    adaptive_upsample,
    guided_upsample,
    plain_upsample,
)


class DepthUpscaler:
    """Upscale a depth-map sequence to 4K and encode (upscale.py:12-123)."""

    def __init__(
        self,
        work_dir: str = "temp_upscale",
        use_nvenc: bool = False,  # accepted for CLI parity; selects libx264
        # 'adaptive' (default since round 5): per-pixel mix of
        # guided-color and plain by local depth/guide gradient
        # correlation -- matches or beats the better single method on
        # every eval_upscale.json family (the guided filter halluci-
        # nates guide texture into flat depth on camouflaged content:
        # bad1 3x plain there). 'guided' = the reference README's
        # promised edge-preserving filter; 'scale' = plain-resize parity
        method: str = "adaptive",
        batch_size: int = 4,
        radius: int = 8,
        eps: float = 1e-3,
        guide_mode: str = "gray",
        crf: int = 18,
        preset: str = "medium",
        encode_workers: int = 1,
        encode_threads: int = 0,
    ):
        """``crf``/``preset`` follow the reference encode contract
        (upscale.py:56-59: crf=18, preset=medium). The reference offloads
        encoding to NVENC hardware; CPU hosts encoding 4K should pick a
        faster preset (same crf keeps the quality level; x264 'veryfast'/
        'ultrafast' trade bitrate for ~5-10x throughput) and/or
        ``encode_workers`` > 1 -- segment-parallel encoders on separate
        threads, stitched by the native box-level concat
        (core/video.py SegmentParallelVideoWriter), scaling with host
        cores. ``encode_threads`` is the x264-internal frame-thread
        count (0 = auto with a single writer, 1 per worker when
        segment-parallel); it scales ONE encoder across cores without
        segment bookkeeping."""
        self.work_dir = Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.use_nvenc = use_nvenc
        self.method = method
        self.batch_size = int(batch_size)
        self.radius = int(radius)
        self.eps = float(eps)
        self.guide_mode = guide_mode
        self.crf = int(crf)
        self.preset = str(preset)
        self.encode_workers = int(encode_workers)
        self.encode_threads = int(encode_threads)

    def process_depth_upscaling(
        self,
        depth_dir: str,
        video_4k_path: str,
        output_path: Optional[str] = None,
        force: bool = False,
        max_frames: Optional[int] = None,
        png16_out: bool = False,
        guide_start_frame: int = 0,
    ) -> Path:
        """Upscale ``depth_dir``'s PNG sequence to the 4K video's geometry.

        Returns the encoded video path (or, with ``png16_out``, a
        directory of full-precision ``depth_%06d.png`` uint16 maps -- the
        mp4 path quantizes to 8 bits through yuv420p like the reference).
        Skips work if the output already exists (upscale.py:105-107)
        unless ``force``.

        ``guide_start_frame`` shifts the 4K guide reader so guide frame
        ``guide_start_frame + i`` pairs with depth frame ``i`` -- the
        temporal-alignment offset applied on the video2 timeline (the
        reference applies the same shift when cutting aligned segments,
        extract_aligned.py:56-81; here it keeps the guided filter from
        transferring edges from the wrong frames).
        """
        depth_dir = Path(depth_dir)
        frames = list_depth_frames(depth_dir)
        if max_frames is not None:
            frames = frames[:max_frames]
        if not frames:
            raise RuntimeError(f"No depth maps found in {depth_dir}")

        info = get_video_info(str(video_4k_path))
        if info is None:
            raise RuntimeError(f"Cannot probe 4K video: {video_4k_path}")
        out_w, out_h, fps = info["width"], info["height"], info["fps"]

        if output_path is None:
            suffix = "" if png16_out else ".mp4"
            output_path = self.work_dir / f"depth_4k_{depth_dir.name}{suffix}"
        output_path = Path(output_path)
        if output_path.exists() and not force:
            if not png16_out or any(output_path.glob("depth_*.png")):
                print(f"Output already exists: {output_path}")
                return output_path

        print(
            f"Upscaling {len(frames)} depth maps -> {out_w}x{out_h} "
            f"@ {fps:.3f} fps ({self.method})"
        )
        guide_reader = None
        if self.method in ("guided", "adaptive"):
            guide_reader = iter(
                VideoReader(
                    str(video_4k_path),
                    start_frame=int(guide_start_frame),
                    max_frames=len(frames),
                    batch_size=self.batch_size,
                )
            )

        t0 = time.time()
        n_done = 0
        if png16_out:
            from video3d_tpu.core.depthio import DepthMapWriter

            writer_cm = DepthMapWriter(output_path)
        elif self.encode_workers > 1:
            from video3d_tpu.core import SegmentParallelVideoWriter

            writer_cm = SegmentParallelVideoWriter(
                str(output_path), out_w, out_h, fps,
                workers=self.encode_workers, crf=self.crf,
                preset=self.preset,
                threads=self.encode_threads if self.encode_threads > 0 else 1,
            )
        else:
            writer_cm = VideoWriter(
                str(output_path), out_w, out_h, fps,
                use_nvenc=self.use_nvenc, crf=self.crf, preset=self.preset,
                threads=self.encode_threads,
            )
        with writer_cm as writer:
            # one batch in flight: the previous batch's device->host
            # readback + encode overlaps the current batch's host load,
            # guide decode and device dispatch (same pattern as the
            # depth stage's 4-stage pipeline)
            pending = None  # (device_array, start_index, valid)

            def drain(p):
                arr, start, n_valid = p
                if png16_out:
                    writer.put(np.asarray(arr), start, n_valid)
                else:
                    gray8 = np.asarray(arr)
                    for j in range(n_valid):
                        writer.write(gray8[j])

            for i in range(0, len(frames), self.batch_size):
                chunk = frames[i : i + self.batch_size]
                depth = np.stack([load_depth_png16(p) for p in chunk])
                # pad the tail so jit sees one static batch shape
                valid = len(chunk)
                if valid < self.batch_size:
                    pad = np.zeros(
                        (self.batch_size - valid,) + depth.shape[1:], depth.dtype
                    )
                    depth = np.concatenate([depth, pad])

                # device-side quantization: read back 1-2 bytes/pixel
                # instead of f32 (transfer, not compute, bounds this stage)
                out_dtype = "uint16" if png16_out else "uint8"
                if self.method in ("guided", "adaptive"):
                    try:
                        guide, g_valid = next(guide_reader)
                    except StopIteration:
                        guide, g_valid = None, 0
                    if guide is not None and g_valid >= valid \
                            and self.method == "adaptive":
                        up = adaptive_upsample(
                            to_device(depth),
                            to_device(guide),
                            out_h,
                            out_w,
                            radius=self.radius,
                            eps=self.eps,
                            out_dtype=out_dtype,
                        )
                    elif guide is not None and g_valid >= valid:
                        if self.guide_mode == "gray":
                            # luma on host (SIMD cvtColor): uploads 1
                            # channel instead of 3
                            import cv2

                            guide = np.stack([
                                cv2.cvtColor(g, cv2.COLOR_RGB2GRAY)
                                for g in guide
                            ])
                        up = guided_upsample(
                            to_device(depth),
                            to_device(guide),
                            out_h,
                            out_w,
                            radius=self.radius,
                            eps=self.eps,
                            guide_mode=self.guide_mode,
                            out_dtype=out_dtype,
                        )
                    else:  # guide ran dry: degrade to plain for the tail
                        up = plain_upsample(to_device(depth), out_h, out_w,
                                            out_dtype=out_dtype)
                else:
                    up = plain_upsample(to_device(depth), out_h, out_w,
                                        out_dtype=out_dtype)

                if pending is not None:
                    drain(pending)  # previous batch: overlap with `up`
                pending = (up, n_done, valid)
                n_done += valid
                if n_done % 100 < valid:
                    dt = time.time() - t0
                    print(f"  {n_done} frames ({n_done / max(dt, 1e-9):.1f} fps)")
            if pending is not None:
                drain(pending)

        dt = time.time() - t0
        print(
            f"Upscale done: {n_done} frames in {dt:.1f}s "
            f"({n_done / max(dt, 1e-9):.1f} fps) -> {output_path}"
        )
        return output_path
