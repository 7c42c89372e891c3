"""video3d_tpu: TPU-native 3D video -> 4K depth pipeline.

Package exports mirror the reference's intended surface
(reference __init__.py:10-17, which named a class that did not exist --
SURVEY.md SS2.4-1; here every export resolves). Stage classes import
lazily so that ``import video3d_tpu`` stays cheap and JAX-free.
"""

__version__ = "0.3.0"

__all__ = [
    "VideoAligner",
    "StereoDepthExtractor",
    "DepthUpscaler",
    "AlignedExtractor",
    "run_pipeline",
    "get_video_info",
    "extract_audio",
    "verify_video_compatibility",
    "load_alignment_data",
    "apply_offset_to_pipeline",
]

_LAZY = {
    "VideoAligner": "video3d_tpu.stages.align",
    "load_alignment_data": "video3d_tpu.stages.align",
    "apply_offset_to_pipeline": "video3d_tpu.stages.align",
    "StereoDepthExtractor": "video3d_tpu.stages.depth",
    "DepthUpscaler": "video3d_tpu.stages.upscale",
    "AlignedExtractor": "video3d_tpu.stages.extract",
    "run_pipeline": "video3d_tpu.stages.pipeline",
    "get_video_info": "video3d_tpu.core.probe",
    "extract_audio": "video3d_tpu.core.audio",
    "verify_video_compatibility": "video3d_tpu.core.probe",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'video3d_tpu' has no attribute {name!r}")
