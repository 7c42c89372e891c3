"""Multi-host execution: distributed init + frame-range work partitioning.

The reference has no inter-process story at all (SURVEY.md SS2.3); the
TPU-native scaling model is:

* ``jax.distributed`` initialization per host (``initialize()``);
* the frame stream is embarrassingly parallel, so hosts take disjoint
  contiguous frame ranges (``frame_ranges``); each host decodes its own
  range locally (ffmpeg/OpenCV per host) and feeds its local chips;
* recovery is cache-idempotent (SURVEY.md SS5-4): a failed host's range
  is simply reassigned -- completed ``depth_%06d.png`` frames are found
  in the shared cache dir and skipped.

``host_frame_slice`` is the one-call entry: given the total frame count
it returns this host's (start, count) based on ``jax.process_index``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if single-process or already up)."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    if coordinator_address is None:
        return  # single-host run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def frame_ranges(n_frames: int, n_parts: int) -> List[Tuple[int, int]]:
    """Split ``n_frames`` into ``n_parts`` contiguous (start, count) ranges.

    Remainder frames go to the leading ranges so sizes differ by <= 1.
    """
    if n_parts <= 0:
        raise ValueError("n_parts must be positive")
    base, rem = divmod(n_frames, n_parts)
    out: List[Tuple[int, int]] = []
    start = 0
    for i in range(n_parts):
        count = base + (1 if i < rem else 0)
        out.append((start, count))
        start += count
    return out


def host_frame_slice(
    n_frames: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """(start_frame, max_frames) for this host's share of the stream."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return frame_ranges(n_frames, pc)[pi]
