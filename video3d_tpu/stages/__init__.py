"""Pipeline stages: the public stage API layer (SURVEY.md SS1).

``VideoAligner`` (temporal alignment), ``StereoDepthExtractor`` (hybrid
stereo depth), ``DepthUpscaler`` (guided 4K upscale + encode) and
``AlignedExtractor`` (synchronized segment cutting), mirroring the
reference's stage classes with the TPU compute path underneath.
"""

from video3d_tpu.stages.align import (
    VideoAligner,
    apply_offset_to_pipeline,
    load_alignment_data,
)
from video3d_tpu.stages.depth import StereoDepthExtractor, depth_batch_pipeline
from video3d_tpu.stages.upscale import DepthUpscaler
from video3d_tpu.stages.extract import AlignedExtractor
from video3d_tpu.stages.pipeline import run_pipeline

__all__ = [
    "VideoAligner",
    "apply_offset_to_pipeline",
    "load_alignment_data",
    "StereoDepthExtractor",
    "depth_batch_pipeline",
    "DepthUpscaler",
    "AlignedExtractor",
    "run_pipeline",
]
