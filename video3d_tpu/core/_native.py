"""ctypes bindings for the native runtime library (native/png16.cc).

The native layer owns the host-side PNG16 encode path -- a persistent
C++ thread pool compresses a whole device batch in parallel with zero
GIL involvement (the reference leans on cv2.imwrite per frame,
depth.py:406). Falls back cleanly when the library hasn't been built:
``lib()`` returns None and callers use the cv2 path.

Build with ``make -C native`` (or native/build.sh).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libv3dpng.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_if_source_newer() -> None:
    srcs = [
        p for p in (_LIB_PATH.parent / n for n in ("png16.cc", "mp4box.cc"))
        if p.exists()
    ]
    if not srcs:
        return
    newest = max(p.stat().st_mtime for p in srcs)
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= newest:
        return
    try:
        subprocess.run(
            ["make", "-C", str(_LIB_PATH.parent)],
            capture_output=True,
            timeout=120,
            check=True,
        )
    except Exception:
        pass  # no toolchain: stay on the cv2 fallback


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("VIDEO3D_TPU_NO_NATIVE"):
        return None
    _build_if_source_newer()
    if not _LIB_PATH.exists():
        return None
    try:
        l = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    l.v3d_png16_encode.restype = ctypes.c_size_t
    l.v3d_png16_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    l.v3d_png_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    l.v3d_png16_decode.restype = ctypes.c_int
    l.v3d_png16_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    l.v3d_png16_encode_batch_to_files.restype = ctypes.c_int
    l.v3d_png16_encode_batch_to_files.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    if hasattr(l, "v3d_mp4_cut"):
        l.v3d_mp4_cut.restype = ctypes.c_int
        l.v3d_mp4_cut.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
            ctypes.c_double, ctypes.c_char_p, ctypes.c_int,
        ]
    if hasattr(l, "v3d_mp4_concat"):
        l.v3d_mp4_concat.restype = ctypes.c_int
        l.v3d_mp4_concat.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ]
    if hasattr(l, "v3d_mp4_extract_pcm"):
        l.v3d_mp4_extract_pcm.restype = ctypes.c_int
        l.v3d_mp4_extract_pcm.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ]
    _lib = l
    return _lib


def cut_mp4(in_path: str, out_path: str, start_s: float,
            dur_s: float) -> Optional[str]:
    """Box-level MP4 stream copy of [start_s, start_s+dur_s).

    The video track snaps back to the previous keyframe (the ffmpeg
    ``-ss .. -c copy`` contract, reference extract_aligned.py:124-133);
    other tracks cut at that same time. Returns None on success, an
    error string on failure, and "native library unavailable" when the
    lib isn't built (callers fall back to a decode/re-encode path).
    """
    l = lib()
    if l is None or not hasattr(l, "v3d_mp4_cut"):
        return "native library unavailable"
    err = ctypes.create_string_buffer(512)
    rc = l.v3d_mp4_cut(
        str(in_path).encode(), str(out_path).encode(),
        float(start_s), float(dur_s), err, len(err),
    )
    if rc != 0:
        return err.value.decode(errors="replace") or "mp4 cut failed"
    return None


def concat_mp4(in_paths: List[str], out_path: str) -> Optional[str]:
    """Box-level stream-copy concat of same-codec MP4 segments.

    Joins the segment files the segment-parallel encoder writes
    (core/video.py SegmentParallelVideoWriter) without re-encoding:
    sample tables are merged and sample bytes copied verbatim. Every
    input must have byte-identical codec configuration (stsd) per
    track. Returns None on success, an error string on failure, and
    "native library unavailable" when the lib isn't built.
    """
    l = lib()
    if l is None or not hasattr(l, "v3d_mp4_concat"):
        return "native library unavailable"
    arr = (ctypes.c_char_p * len(in_paths))(
        *[str(p).encode() for p in in_paths]
    )
    err = ctypes.create_string_buffer(512)
    rc = l.v3d_mp4_concat(arr, len(in_paths), str(out_path).encode(), err,
                          len(err))
    if rc != 0:
        return err.value.decode(errors="replace") or "mp4 concat failed"
    return None


def encode_png16(depth: np.ndarray, zlevel: int = 1) -> Optional[bytes]:
    """Encode one uint16 (H, W) array to PNG bytes; None if no native lib."""
    l = lib()
    if l is None:
        return None
    depth = np.ascontiguousarray(depth, dtype=np.uint16)
    h, w = depth.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = l.v3d_png16_encode(
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h, w, zlevel, ctypes.byref(out),
    )
    if n == 0:
        return None
    try:
        return ctypes.string_at(out, n)
    finally:
        l.v3d_png_free(out)


def decode_png16(data: bytes, max_pixels: int = 64 << 20) -> Optional[np.ndarray]:
    """Decode grayscale PNG bytes to uint16 (H, W); None on failure."""
    l = lib()
    if l is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(max_pixels, np.uint16)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = l.v3d_png16_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.byref(h), ctypes.byref(w), max_pixels,
    )
    if rc != 0:
        return None
    return out[: h.value * w.value].reshape(h.value, w.value).copy()


def encode_batch_to_files(
    batch: np.ndarray, paths: List[str], zlevel: int = 1
) -> Optional[int]:
    """Encode+write a (N, H, W) uint16 batch in parallel (native pool).

    Returns the number of failures, or None if the native lib is absent.
    Blocks until all files are written.
    """
    l = lib()
    if l is None:
        return None
    batch = np.ascontiguousarray(batch, dtype=np.uint16)
    n, h, w = batch.shape
    assert len(paths) == n
    joined = b"\0".join(str(p).encode() for p in paths) + b"\0"
    return l.v3d_png16_encode_batch_to_files(
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n, h, w, zlevel, joined,
    )


def extract_pcm_wav(in_path: str, out_path: str) -> Optional[str]:
    """Extract an uncompressed PCM audio track from an MP4/MOV to WAV.

    Decodes nothing: QuickTime 'sowt'/'twos'/'raw '/'lpcm'-v0 and
    ISO-BMFF 'ipcm' sample bytes ARE the PCM, so alignment works without
    ffmpeg on such files. Returns None on success, an error string
    otherwise ("no uncompressed PCM audio track..." for AAC et al.).
    """
    l = lib()
    if l is None or not hasattr(l, "v3d_mp4_extract_pcm"):
        return "native library unavailable"
    err = ctypes.create_string_buffer(512)
    rc = l.v3d_mp4_extract_pcm(str(in_path).encode(),
                               str(out_path).encode(), err, len(err))
    if rc != 0:
        return err.value.decode(errors="replace") or "pcm extract failed"
    return None
