"""Device mesh construction and frame-axis sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAMES_AXIS = "frames"


def frames_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or given) devices; axis name ``frames``.

    The pipeline's natural data-parallel axis is the frame index
    (SURVEY.md SS2.3): every per-frame op is independent, so a 1-D mesh
    with batch sharding scales linearly and the only cross-chip traffic
    is the temporal-filter halo exchange.
    """
    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs, (FRAMES_AXIS,))


def shard_frames(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (frame/batch) axis across the mesh."""
    return NamedSharding(mesh, P(FRAMES_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
