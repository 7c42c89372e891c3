"""Neural guidance models (Flax), TPU-native.

The reference blends 30% monocular neural depth (``Intel/dpt-large`` via
torch/CUDA, depth.py:74-103) into the stereo disparity. Here the same
architecture is implemented in Flax/JAX (NHWC, bfloat16-friendly,
jit/pjit-shardable over the frame axis) with a weight converter from the
HuggingFace torch checkpoint.
"""

from video3d_tpu.models.crestereo import (
    CREStereoConfig,
    CREStereoLite,
    load_crestereo_guidance,
)
from video3d_tpu.models.dpt import (
    DPTConfig,
    DPTDepthModel,
    convert_torch_state_dict,
    load_dpt_guidance,
)

__all__ = [
    "CREStereoConfig",
    "CREStereoLite",
    "load_crestereo_guidance",
    "DPTConfig",
    "DPTDepthModel",
    "convert_torch_state_dict",
    "load_dpt_guidance",
]
