"""Explicit-placement host->device transfer (jax 0.9.0 leak workaround).

Measured on this toolchain (jax 0.9.0; reproduced on the CPU backend,
and the axon-TPU trainer exhibited the same host-RSS growth): a
host->device transfer whose placement is IMPLICIT -- ``jnp.asarray(np_x)``,
``jax.device_put(np_x)`` with no device, or passing a fresh numpy array
directly as a jitted-function argument -- permanently retains the full
transferred buffer below Python: ``jax.live_arrays()`` stays empty and
``arr.delete()`` does not release it (+3.25 MB per 3.1 MB transfer,
60-call probe). The same transfer with an EXPLICIT device or sharding
is flat (~0.1 MB/call, amortizing to allocator noise).

Consequence: every long-running loop that feeds fresh host arrays to
the device (film-scale depth extraction, the trainers, serve) must
route batches through :func:`to_device` (or ``jax.device_put`` with an
explicit sharding, which the data-parallel paths already use). The
round-4 20k-step CREStereo run was OOM-killed at 82 GB host RSS by
exactly this leak -- ~22 MB/step of implicitly-placed batch uploads.

Re-test on toolchain upgrades; if a future jax releases the buffers on
implicit placement, this shim reduces to a no-op wrapper.
"""

from __future__ import annotations

import jax


def to_device(x, placement=None):
    """``jax.device_put`` with EXPLICIT placement.

    ``placement`` may be a device or a ``Sharding``; default is the
    first local device (the single-chip pipelines' placement). Pytrees
    pass through like ``jax.device_put``.
    """
    if placement is None:
        placement = jax.local_devices()[0]
    return jax.device_put(x, placement)
