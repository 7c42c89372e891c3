"""Pallas TPU kernels for the hot ops.

Each kernel has a pure-jnp reference implementation in
``video3d_tpu.ops`` used for CPU parity testing (SURVEY.md SS7-3); the
dispatchers here select the Pallas path on TPU and fall back to jnp
elsewhere (or run the kernel in interpreter mode under tests).
"""

from video3d_tpu.kernels.sgm import sgm_aggregate_pallas

__all__ = ["sgm_aggregate_pallas"]
