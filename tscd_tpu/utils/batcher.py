"""Latency-budgeted frame batching for online serving (VERDICT r4
weak #5 / next #7).

Batch-1 streaming on this class of deployment is dispatch-bound (~64
fps at 15.7 ms/frame pipelined, PROFILE.md §latency) while the model
itself sustains 783 fps windowed — so the serving move is to trade a
bounded amount of buffering latency for batch size: accumulate frames
until either `max_batch` are waiting or the OLDEST frame has waited
`max_wait_ms`, then flush the batch to one `YOLOVOnline.window` /
TSCD small-window call (F=2/4/8 -> 164/267/418 fps measured ladder).

Host-side and model-agnostic; the clock is injectable so tests pin the
flush policy deterministically (tests/test_online_batch.py).
"""

import time
from typing import Any, Callable, List, Optional


class FrameBatcher:
    """Accumulate items; flush on size or age of the oldest item."""

    def __init__(self, max_batch: int, max_wait_ms: float = 25.0,
                 clock: Callable[[], float] = time.monotonic):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.clock = clock
        self._items: List[Any] = []
        self._oldest_t: Optional[float] = None

    def __len__(self) -> int:
        return len(self._items)

    def push(self, item: Any) -> Optional[List[Any]]:
        """Add a frame. Returns a full batch when `max_batch` is
        reached, else None (call `poll()` for the age-based flush)."""
        if not self._items:
            self._oldest_t = self.clock()
        self._items.append(item)
        if len(self._items) >= self.max_batch:
            return self.flush()
        return None

    def poll(self) -> Optional[List[Any]]:
        """Age-based flush: returns the pending batch iff the oldest
        queued frame has waited at least `max_wait_ms`."""
        if self._items and self._oldest_t is not None:
            if (self.clock() - self._oldest_t) * 1e3 >= self.max_wait_ms:
                return self.flush()
        return None

    def flush(self) -> Optional[List[Any]]:
        """Unconditionally return whatever is pending (None if empty).
        Call at end-of-stream so no frame is dropped."""
        if not self._items:
            return None
        out = self._items
        self._items = []
        self._oldest_t = None
        return out
