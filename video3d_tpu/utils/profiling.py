"""Tracing / profiling utilities (SURVEY.md SS5-1).

The reference's observability is ``time.time()`` prints around each stage
(run_pipeline.py:33-119) and CUDA memory prints per batch
(depth.py:306-309). Equivalents here:

* :class:`StageTimer` -- structured per-stage wall-clock accounting
  (machine-readable dict, not just prints);
* :func:`trace` -- ``jax.profiler`` trace context writing a TensorBoard-
  loadable profile (set ``VIDEO3D_TPU_PROFILE_DIR`` or pass a path);
* :func:`device_memory_stats` -- HBM usage snapshot, the TPU analogue of
  the reference's ``torch.cuda.memory_allocated`` prints.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

PROFILE_ENV = "VIDEO3D_TPU_PROFILE_DIR"


class StageTimer:
    """Accumulate named wall-clock spans; print a summary like the
    reference orchestrator's (run_pipeline.py:113-127)."""

    def __init__(self):
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def summary(self) -> str:
        lines = [f"  {k:>12}: {v:8.2f}s" for k, v in self.timings.items()]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op unless a directory is configured."""
    log_dir = log_dir or os.environ.get(PROFILE_ENV)
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"Profile trace written to {log_dir}")


def device_memory_stats() -> Dict[str, int]:
    """Bytes in use / limit on the default device (best effort)."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": int(stats.get("bytes_in_use", -1)),
        "bytes_limit": int(stats.get("bytes_limit", -1)),
        "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", -1)),
    }
