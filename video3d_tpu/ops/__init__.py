"""Device-side compute ops (jax.numpy + Pallas).

Every op here is a pure function over arrays, jit-safe, static-shaped, and
batched over frames where applicable. Pallas TPU kernels live in
``video3d_tpu.kernels`` with pure-jnp reference implementations here for
CPU parity testing (SURVEY.md SS7-3).
"""

from video3d_tpu import runtime  # noqa: F401  (persistent compile cache)
from video3d_tpu.ops.correlate import (
    cross_correlate_full,
    find_audio_offset,
    znormalize,
)
from video3d_tpu.ops.guided import (
    box_filter,
    guided_filter,
    guided_upsample,
    plain_upsample,
)

__all__ = [
    "cross_correlate_full",
    "find_audio_offset",
    "znormalize",
    "box_filter",
    "guided_filter",
    "guided_upsample",
    "plain_upsample",
]
