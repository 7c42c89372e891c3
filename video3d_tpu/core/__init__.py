"""Host-side media I/O and artifact store.

This layer owns every interaction with the filesystem and with media
containers: probing, streaming frame decode, audio extraction, 16-bit PNG
depth-map I/O, video encoding, content-hash cache keys, and the work-dir
layout that forms the inter-stage artifact contract (SURVEY.md SS1,
reference: src/video_3d_pipeline/utils.py).

All decode/encode is pluggable between an ffmpeg-subprocess backend (used
when an ffmpeg binary is on PATH -- the production path) and an
OpenCV + stdlib-``wave`` backend (always available). Device code never
touches this layer except through numpy arrays.
"""

from video3d_tpu.core.probe import get_video_info, verify_video_compatibility
from video3d_tpu.core.cache import (
    content_key,
    create_work_directory,
    depth_cache_dir,
    audio_cache_path,
)
from video3d_tpu.core.audio import (
    extract_audio,
    load_audio_for_sync,
    read_wav,
    write_wav,
)
from video3d_tpu.core.video import (
    SegmentParallelVideoWriter,
    VideoReader,
    VideoWriter,
    ffmpeg_available,
)
from video3d_tpu.core.depthio import (
    save_depth_png16,
    load_depth_png16,
    list_depth_frames,
    DepthMapWriter,
)
from video3d_tpu.core.shots import detect_shots

__all__ = [
    "get_video_info",
    "verify_video_compatibility",
    "content_key",
    "create_work_directory",
    "depth_cache_dir",
    "audio_cache_path",
    "extract_audio",
    "load_audio_for_sync",
    "read_wav",
    "write_wav",
    "VideoReader",
    "VideoWriter",
    "SegmentParallelVideoWriter",
    "ffmpeg_available",
    "save_depth_png16",
    "load_depth_png16",
    "list_depth_frames",
    "DepthMapWriter",
    "detect_shots",
]
