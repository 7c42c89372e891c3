"""Multi-chip execution: frame-sharded SPMD over a device mesh.

The reference has zero distributed code (SURVEY.md SS2.3); this package
adds the TPU-native scaling story: a 1-D ``frames`` mesh, data-parallel
depth extraction via sharding annotations (XLA inserts any collectives),
and temporal-consistency filtering as a ``shard_map`` with ``ppermute``
halo exchange over ICI -- the video analogue of sequence/context
parallelism (SURVEY.md SS5-7).
"""

from video3d_tpu.parallel.mesh import frames_mesh, shard_frames
from video3d_tpu.parallel.sharded import sharded_depth_pipeline
from video3d_tpu.parallel.temporal import temporal_median3

__all__ = [
    "frames_mesh",
    "shard_frames",
    "sharded_depth_pipeline",
    "temporal_median3",
]
