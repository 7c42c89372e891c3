"""Frame-sharded depth pipeline over a device mesh.

Data parallelism per SURVEY.md SS2.3: the batch of SBS frames is sharded
on the leading axis; every per-frame op (split, unsqueeze, SGM, guidance,
normalize) is element-wise over that axis, so XLA partitions the whole
jitted program with zero collectives. The optional temporal median then
adds the only cross-chip traffic (halo exchange, parallel/temporal.py).

This is the multi-chip execution path validated by
``__graft_entry__.dryrun_multichip`` on a virtual CPU mesh and intended
for v5e-8 (BASELINE.md north star: >=500 fps via 8-way frame sharding).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from video3d_tpu.ops.stereo import SGBMParams
from video3d_tpu.parallel.mesh import frames_mesh, shard_frames
from video3d_tpu.parallel.temporal import flow_ema_sharded, temporal_median3
from video3d_tpu.stages.depth import depth_batch_pipeline


def sharded_depth_pipeline(
    frames,
    mesh: Optional[Mesh] = None,
    params: SGBMParams = SGBMParams(),
    unsqueeze: bool = True,
    normalize: str = "fixed",
    apply_speckle: bool = True,
    guidance_fn: Optional[Callable] = None,
    guidance_params=None,
    temporal_filter: bool | str = False,
    flow_halo: int = 8,
) -> jnp.ndarray:
    """uint8 SBS batch (B, H, W, 3), B divisible by mesh size -> uint16 depth.

    Places the input with a frames-axis sharding and runs the single-chip
    pipeline program; XLA partitions it across the mesh.
    ``temporal_filter``: ``'median'`` (or True) runs the sharded
    median-of-3 (one-frame ppermute halo); ``'flow'`` runs the causal
    flow-EMA with ``flow_halo``-frame warm-up halo exchange
    (parallel/temporal.py flow_ema_sharded) on the quantized depth, with
    the motion guide emitted by the same pipeline program.
    """
    mesh = mesh or frames_mesh()
    sharding = shard_frames(mesh)
    # explicit sharding placement (also the jax 0.9.0 implicit-
    # transfer leak workaround, core/xfer.py): device_put takes
    # the host array directly, no intermediate implicit upload
    frames = jax.device_put(frames, sharding)
    mode = {False: None, True: "median"}.get(temporal_filter,
                                             temporal_filter)

    if mode is None:
        return depth_batch_pipeline(
            frames,
            params=params,
            unsqueeze=unsqueeze,
            normalize=normalize,
            apply_speckle=apply_speckle,
            guidance_fn=guidance_fn,
            guidance_params=guidance_params,
        )

    # temporal path: keep disparity in float, filter, then quantize
    @partial(jax.jit, static_argnames=())
    def run(fr):
        res = depth_batch_pipeline(
            fr,
            params=params,
            unsqueeze=unsqueeze,
            normalize=normalize,
            apply_speckle=apply_speckle,
            guidance_fn=guidance_fn,
            guidance_params=guidance_params,
            return_guide=(mode == "flow"),
        )
        if mode == "flow":
            depth_u16, guide = res
            filtered = flow_ema_sharded(
                depth_u16, guide, mesh, halo=flow_halo
            )
        else:
            filtered = temporal_median3(res.astype(jnp.float32), mesh)
        return jnp.clip(filtered, 0.0, 65535.0).astype(jnp.uint16)

    return run(frames)
