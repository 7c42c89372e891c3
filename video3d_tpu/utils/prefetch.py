"""Background batch prefetching for the trainers.

Host-side data synthesis (scipy renders, SGM pseudo-labeling) and the
device train dispatch are serialized in a naive loop; on a single-core
host with a tunneled device each leg costs real wall time. A one-thread
producer overlaps them: the thread keeps a bounded queue of ready
batches while the main thread's K-step dispatch is in flight.

The producer may itself dispatch device work (SGM pseudo-labels in
``video_batch``) — JAX dispatch is thread-safe, the calls simply queue
behind the training step on the device.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable


class BatchPrefetcher:
    """Run ``make_batch`` in a daemon thread, buffering up to ``depth``
    results. Use as a context manager; call the instance to fetch.

    Exceptions in the producer are captured and re-raised on the next
    fetch so data-generation failures surface in the main thread.
    """

    def __init__(self, make_batch: Callable[[], Any], depth: int = 8):
        self._make = make_batch
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        item = None
        while not self._stop.is_set():
            if item is None:
                try:
                    item = self._make()
                except BaseException as e:  # surfaced on next fetch
                    self._err = e
                    return
            try:
                self._q.put(item, timeout=0.25)
                item = None
            except queue.Full:
                continue

    def __enter__(self) -> "BatchPrefetcher":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        # drain so a blocked put() wakes and the thread exits
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __call__(self) -> Any:
        while True:
            if self._err is not None:
                raise self._err
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                if not self._thread.is_alive() and self._err is None:
                    raise RuntimeError("batch producer thread exited")
