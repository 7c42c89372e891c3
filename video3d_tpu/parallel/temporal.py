"""Temporal-consistency filtering with cross-chip halo exchange.

The reference saves depth per frame with no temporal filtering, which its
own README lists as a stereo advantage left unexploited
(readme.md:17 "temporal consistency"; per-frame normalization actually
*breaks* it, SURVEY.md SS2.4-8). Here a temporal median-of-3 runs over the
frame stream; when frames are sharded across chips, each shard swaps one
boundary frame with its neighbors via ``jax.lax.ppermute`` inside
``shard_map`` -- halo exchange over ICI, the video analogue of
ring/blockwise context parallelism (SURVEY.md SS5-7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from video3d_tpu.core.xfer import to_device
from jax.sharding import Mesh, PartitionSpec as P

from video3d_tpu.parallel.mesh import FRAMES_AXIS


def _median3(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(jnp.minimum(jnp.maximum(a, b), c), jnp.minimum(a, b))


def temporal_median3_local(depth: jnp.ndarray) -> jnp.ndarray:
    """Median-of-3 along the leading frame axis, edges clamped."""
    padded = jnp.concatenate([depth[:1], depth, depth[-1:]], axis=0)
    return _median3(padded[:-2], padded[1:-1], padded[2:])


class TemporalMedianStream:
    """Streaming median-of-3 over a batched frame stream (host driver).

    Frame i's output needs frames i-1 and i+1, so emission lags one
    batch: ``push(batch)`` returns the *previous* batch filtered, and
    ``flush()`` returns the final one. Global stream edges clamp,
    matching :func:`temporal_median3_local` on the whole stream exactly.
    """

    def __init__(self):
        self._prev = None  # (B, H, W) jnp array
        self._prev_prev_last = None  # (1, H, W): frame before prev[0]

    def push(self, batch):
        if not isinstance(batch, jax.Array):  # host input: explicit
            batch = to_device(batch)          # placement (core/xfer.py)
        out = None
        if self._prev is not None:
            left = (
                self._prev_prev_last
                if self._prev_prev_last is not None
                else self._prev[:1]
            )
            window = jnp.concatenate([left, self._prev, batch[:1]], axis=0)
            out = _median3(window[:-2], window[1:-1], window[2:])
        self._prev_prev_last = (
            self._prev[-1:] if self._prev is not None else None
        )
        self._prev = batch
        return out

    def flush(self):
        if self._prev is None:
            return None
        left = (
            self._prev_prev_last
            if self._prev_prev_last is not None
            else self._prev[:1]
        )
        window = jnp.concatenate([left, self._prev, self._prev[-1:]], axis=0)
        out = _median3(window[:-2], window[1:-1], window[2:])
        self._prev = None
        self._prev_prev_last = None
        return out


class TemporalFlowEMAStream:
    """Streaming flow-guided EMA over a batched frame stream (host driver).

    Causal (output i needs only frames <= i), so unlike
    :class:`TemporalMedianStream` there is no one-batch emission lag:
    ``push(depth, guide)`` returns the same batch filtered. The carry
    (previous smoothed frame + guide) stays on device between batches.

    ``guide`` is the reduced-resolution left-eye grayscale of the same
    frames (the depth pipeline emits it alongside the depth batch, see
    ``depth_batch_pipeline(..., return_guide=True)``); motion is
    estimated on it and the previous output is warped along that motion
    before blending, with a photometric-residual gate falling back to
    the current frame at scene cuts and occlusions (ops/flow.py).

    Frame 0 of the stream is emitted bit-exactly unfiltered and seeds
    the carry.
    """

    def __init__(self, params=None):
        from video3d_tpu.ops.flow import FlowEMAParams

        self.params = params or FlowEMAParams()
        self._carry = None

    def push(self, depth, guide):
        """(B, H, W) uint16 depth + (B, hq, wq) guide -> (B, H, W) uint16."""
        from video3d_tpu.ops.flow import flow_ema_scan

        if not isinstance(depth, jax.Array):
            depth = to_device(depth)
        if not isinstance(guide, jax.Array):
            guide = to_device(guide)
        head = None
        if self._carry is None:
            head = depth[:1]  # frame 0: bit-exact passthrough
            self._carry = (
                depth[0].astype(jnp.float32),
                guide[0].astype(jnp.float32),
            )
            depth, guide = depth[1:], guide[1:]
        if depth.shape[0] == 0:
            out = depth.astype(jnp.uint16)
        else:
            self._carry, out = flow_ema_scan(
                self._carry, depth, guide, self.params
            )
            out = jnp.clip(jnp.round(out), 0.0, 65535.0).astype(jnp.uint16)
        return out if head is None else jnp.concatenate([head, out], axis=0)

    def flush(self):
        self._carry = None
        return None


def flow_ema_sharded(
    depth: jnp.ndarray,
    guide: jnp.ndarray,
    mesh: Mesh,
    halo: int = 8,
    params=None,
) -> jnp.ndarray:
    """Frame-sharded causal flow-EMA with warm-up halo exchange.

    The flow-EMA carry is sequential along time, so exact multi-chip
    evaluation would serialize the mesh. Instead each shard warms its
    carry on ``halo`` halo frames pulled from the left neighbor over ICI
    (one ``ppermute`` per input) and discards the halo outputs — the
    same error-bounded warm-up contract the multi-host fan-out driver
    uses with 24-frame host-side halos
    (stages/depth.py ``_slice_halos``), here as a single jitted
    shard_map program. The EMA's geometric memory (alpha_min >= 0.35)
    makes the carry mismatch decay by >= 0.65/frame: 8 halo frames bound
    the boundary error at ~0.03 of the carry scale, 24 at ~3e-5.

    Shard 0 has no left neighbor; its halo replicates its own frame 0,
    so its warm-up converges to frame 0 (the stream head is near-
    passthrough, matching the single-chip stream's exact-passthrough
    head up to the same bound).

    ``depth`` (T, H, W) float32/uint16 and ``guide`` (T, hq, wq) float32
    are sharded on T; each shard's local length must be >= ``halo``.
    Returns float32, same sharding.
    """
    from functools import partial as _partial

    from video3d_tpu.ops.flow import FlowEMAParams, _ema_step

    params = params or FlowEMAParams()
    depth = depth.astype(jnp.float32)
    guide = guide.astype(jnp.float32)

    def _local_scan(d, g):
        carry = (d[0], g[0])
        _, out = jax.lax.scan(
            _partial(_ema_step, params), carry, (d[1:], g[1:])
        )
        return jnp.concatenate([d[:1], out], axis=0)

    n = mesh.shape[FRAMES_AXIS]
    if n == 1:
        return _local_scan(depth, guide)

    def local(d_blk, g_blk):
        idx = jax.lax.axis_index(FRAMES_AXIS)
        perm = [(i, (i + 1) % n) for i in range(n)]
        dh = jax.lax.ppermute(d_blk[-halo:], FRAMES_AXIS, perm)
        gh = jax.lax.ppermute(g_blk[-halo:], FRAMES_AXIS, perm)
        # global stream head: shard 0's halo replicates its frame 0
        dh = jnp.where(idx == 0,
                       jnp.broadcast_to(d_blk[:1], dh.shape), dh)
        gh = jnp.where(idx == 0,
                       jnp.broadcast_to(g_blk[:1], gh.shape), gh)
        out = _local_scan(
            jnp.concatenate([dh, d_blk], axis=0),
            jnp.concatenate([gh, g_blk], axis=0),
        )
        return out[halo:]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(FRAMES_AXIS), P(FRAMES_AXIS)),
        out_specs=P(FRAMES_AXIS),
    )(depth, guide)


def temporal_median3(depth: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Sharded temporal median-of-3: (T, H, W) sharded on T over ``mesh``.

    Each shard sends its first frame to the left neighbor and its last
    frame to the right neighbor (two ``ppermute`` rings), so every chip
    can filter its boundary frames without gathering the stream. Global
    stream edges clamp (first/last frame replicate), matching the
    single-chip reference implementation exactly.
    """
    n = mesh.shape[FRAMES_AXIS]
    if n == 1:
        return temporal_median3_local(depth)

    def local(block):
        idx = jax.lax.axis_index(FRAMES_AXIS)
        # halo from left neighbor: their last frame (ring shift right)
        left_halo = jax.lax.ppermute(
            block[-1:], FRAMES_AXIS, [(i, (i + 1) % n) for i in range(n)]
        )
        # halo from right neighbor: their first frame (ring shift left)
        right_halo = jax.lax.ppermute(
            block[:1], FRAMES_AXIS, [(i, (i - 1) % n) for i in range(n)]
        )
        # clamp at global stream edges (the ring wraps; shard 0's left
        # halo and shard n-1's right halo are invalid)
        left_halo = jnp.where(idx == 0, block[:1], left_halo)
        right_halo = jnp.where(idx == n - 1, block[-1:], right_halo)
        padded = jnp.concatenate([left_halo, block, right_halo], axis=0)
        return _median3(padded[:-2], padded[1:-1], padded[2:])

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(FRAMES_AXIS),
        out_specs=P(FRAMES_AXIS),
    )(depth)
