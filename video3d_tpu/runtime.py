"""Process-level JAX runtime configuration.

Every CLI tool is a separate process; without a persistent compilation
cache each one pays the full XLA compile (~100 s for the SGM program over
the remote-compile tunnel). Importing this module enables the on-disk
cache so repeat invocations start hot. Idempotent; respects an existing
user configuration.

The reference has no analogue (torch eager has no compile step); this is
TPU-runtime plumbing, kin to the reference's model-load caching
(depth.py:60-114).
"""

from __future__ import annotations

import os

import jax

_CACHE_ENV = "VIDEO3D_TPU_JAX_CACHE"
_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "video3d_tpu", "jax"
)


def _intended_platform() -> str:
    """Best-effort platform name WITHOUT initializing any backend.

    ``jax.default_backend()`` would lock in the platform for the whole
    process; callers like ``parallel.dryrun`` must still be able to
    force CPU after this module imports. Reads the config/env hints
    only (empty string when JAX would autodetect).
    """
    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    return plats.split(",")[0].strip() if plats else ""


def enable_compilation_cache() -> None:
    if jax.config.jax_compilation_cache_dir:  # user already configured it
        return
    backend = _intended_platform()
    if backend == "cpu":
        # CPU executables are AOT-compiled for exact machine features; a
        # cache shared across heterogeneous hosts risks SIGILL. The CPU
        # path is tests/dryruns where compiles are cheap anyway.
        return
    cache_dir = os.environ.get(_CACHE_ENV, _DEFAULT_CACHE)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


enable_compilation_cache()
