"""Streaming video decode/encode feeding the TPU pipeline.

The reference buffers every decoded frame of the clip in RAM
(depth.py:142-188) -- a feature film cannot fit. Here decode is a streaming
producer on a background thread filling a bounded queue of fixed-size numpy
batches, so host decode overlaps device compute (double buffering at the
host->HBM boundary, SURVEY.md north star).

Backends:
* ``ffmpeg`` -- rawvideo rgb24 pipe subprocess (reference depth.py:215-220),
  used when an ffmpeg binary exists;
* ``opencv`` -- cv2.VideoCapture (reference depth.py:142-188), always
  available; frames converted BGR->RGB at the boundary so the rest of the
  framework is RGB-only (fixing the reference's color-space confusion,
  SURVEY.md SS2.4-7).

Encoding likewise prefers ffmpeg (libx264 crf/preset contract of
upscale.py:47-63) and falls back to cv2.VideoWriter mp4v.
"""

from __future__ import annotations

import queue
import shutil
import subprocess
import threading
from pathlib import Path
from typing import Iterator, Optional

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


class VideoReader:
    """Streaming batched RGB frame reader.

    Iterating yields ``(batch, valid)`` where ``batch`` is uint8
    ``(batch_size, H, W, 3)`` RGB and ``valid <= batch_size`` is the number
    of real frames (the tail batch is zero-padded so shapes stay static for
    XLA). Frames are produced by a background decode thread through a
    bounded queue (depth ``prefetch`` batches).
    """

    def __init__(
        self,
        video_path: str,
        start_frame: int = 0,
        max_frames: Optional[int] = None,
        batch_size: int = 8,
        prefetch: int = 2,
        backend: Optional[str] = None,
    ):
        self.video_path = str(video_path)
        if not Path(video_path).exists():
            raise FileNotFoundError(f"Video not found: {video_path}")
        self.start_frame = int(start_frame)
        self.max_frames = max_frames
        self.batch_size = int(batch_size)
        self.prefetch = int(prefetch)
        if backend is None:
            backend = "ffmpeg" if ffmpeg_available() else "opencv"
        self.backend = backend

        from video3d_tpu.core.probe import get_video_info

        info = get_video_info(self.video_path)
        if info is None:
            raise RuntimeError(f"Cannot probe video: {video_path}")
        self.info = info
        total = info["frames"] - self.start_frame if info["frames"] else None
        if max_frames is not None:
            total = max_frames if total is None else min(total, max_frames)
        self.n_frames = total  # None if container hides nb_frames

    # -- frame producers ---------------------------------------------------

    def _frames_opencv(self) -> Iterator[np.ndarray]:
        import cv2

        cap = cv2.VideoCapture(self.video_path)
        if not cap.isOpened():
            raise RuntimeError(f"OpenCV cannot open: {self.video_path}")
        try:
            if self.start_frame:
                cap.set(cv2.CAP_PROP_POS_FRAMES, self.start_frame)
            count = 0
            while self.max_frames is None or count < self.max_frames:
                ok, frame = cap.read()
                if not ok:
                    break
                yield frame[..., ::-1]  # BGR -> RGB
                count += 1
        finally:
            cap.release()

    def _frames_ffmpeg(self) -> Iterator[np.ndarray]:
        w, h, fps = self.info["width"], self.info["height"], self.info["fps"]
        cmd = [shutil.which("ffmpeg"), "-v", "error"]
        if self.start_frame and fps > 0:
            cmd += ["-ss", f"{self.start_frame / fps:.6f}"]
        cmd += ["-i", self.video_path]
        if self.max_frames is not None:
            cmd += ["-frames:v", str(self.max_frames)]
        cmd += ["-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"]
        frame_bytes = w * h * 3
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, bufsize=frame_bytes * 4)
        try:
            while True:
                buf = proc.stdout.read(frame_bytes)
                if len(buf) < frame_bytes:
                    break
                yield np.frombuffer(buf, np.uint8).reshape(h, w, 3)
        finally:
            proc.stdout.close()
            proc.wait()

    def frames(self) -> Iterator[np.ndarray]:
        """Yield single RGB uint8 (H, W, 3) frames."""
        if self.backend == "ffmpeg":
            return self._frames_ffmpeg()
        return self._frames_opencv()

    # -- batched, prefetched iteration --------------------------------------

    def __iter__(self):
        h, w = self.info["height"], self.info["width"]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            batch = np.zeros((self.batch_size, h, w, 3), np.uint8)
            n = 0
            try:
                for frame in self.frames():
                    if stop.is_set():
                        return
                    batch[n] = frame
                    n += 1
                    if n == self.batch_size:
                        q.put((batch, n))
                        batch = np.zeros((self.batch_size, h, w, 3), np.uint8)
                        n = 0
                if n:
                    q.put((batch, n))
            except Exception as e:  # surface decode errors to the consumer
                q.put(e)
                return
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class VideoWriter:
    """Streaming video encoder for grayscale/RGB uint8 frames.

    ffmpeg backend reproduces the reference's encode contract
    (upscale.py:47-63): h264, crf=18, preset=medium, yuv420p. ``use_nvenc``
    is accepted for CLI parity but NVENC does not exist on TPU hosts, so it
    selects libx264. OpenCV fallback uses mp4v.
    """

    def __init__(
        self,
        output_path: str,
        width: int,
        height: int,
        fps: float,
        crf: int = 18,
        preset: str = "medium",
        use_nvenc: bool = False,
        backend: Optional[str] = None,
    ):
        self.output_path = str(output_path)
        self.width, self.height, self.fps = int(width), int(height), float(fps)
        if backend is None:
            backend = "ffmpeg" if ffmpeg_available() else "opencv"
        self.backend = backend
        self._proc = None
        self._cv = None
        if self.backend == "ffmpeg":
            cmd = [
                shutil.which("ffmpeg"), "-y", "-v", "error",
                "-f", "rawvideo", "-pix_fmt", "rgb24",
                "-s", f"{self.width}x{self.height}", "-r", f"{self.fps:.6f}",
                "-i", "pipe:0",
                "-c:v", "libx264", "-crf", str(crf), "-preset", preset,
                "-pix_fmt", "yuv420p", self.output_path,
            ]
            self._proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        else:
            import cv2

            self._cv = cv2.VideoWriter(
                self.output_path,
                cv2.VideoWriter_fourcc(*"mp4v"),
                self.fps,
                (self.width, self.height),
            )
            if not self._cv.isOpened():
                raise RuntimeError(f"Cannot open video writer: {output_path}")

    def write(self, frame: np.ndarray) -> None:
        """Write one uint8 frame: (H, W) grayscale or (H, W, 3) RGB."""
        if frame.ndim == 2:
            frame = np.repeat(frame[..., None], 3, axis=-1)
        if frame.dtype != np.uint8:
            raise TypeError(f"VideoWriter expects uint8, got {frame.dtype}")
        if self._proc is not None:
            self._proc.stdin.write(np.ascontiguousarray(frame).tobytes())
        else:
            self._cv.write(frame[..., ::-1])  # RGB -> BGR for OpenCV

    def close(self) -> None:
        if self._proc is not None:
            self._proc.stdin.close()
            ret = self._proc.wait()
            self._proc = None
            if ret != 0:
                raise RuntimeError(f"ffmpeg encoder exited with {ret}")
        if self._cv is not None:
            self._cv.release()
            self._cv = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
