"""Request micro-batching.

Production serving feature (no analog in the reference — its Flask dev
server handles one request at a time, engine.py:137): concurrent queries
are collected for a few milliseconds and executed as ONE padded device
batch, so under load the TPU sees large matmuls instead of a stream of
batch-1 programs. Batch sizes are padded to a fixed ladder so only a
handful of programs ever compile.
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

def pad_to_ladder(n: int, max_batch: int) -> int:
    """Two-program ladder: singletons stay at 1, anything else pads to
    max_batch — each distinct batch size is a separate XLA program, and
    compiles are expensive (minutes through the remote-compile tunnel)."""
    return 1 if n <= 1 else max_batch


@dataclass
class _Pending:
    image: np.ndarray
    k: int
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[Tuple[np.ndarray, np.ndarray]] = None
    error: Optional[Exception] = None


class MicroBatcher:
    """Wraps a batched search fn with a collect-then-execute loop.

    Args:
      batched_search: fn(images (B, H, W, 3) f32, k) -> (dists (B, k'),
        ids (B, k')) — must accept any B in BATCH_LADDER.
      max_batch: largest batch to collect (also the padded batch size for
        any multi-request batch).
      max_wait_ms: how long the collector waits for co-riders after the
        first request arrives (latency cost under low load).
    """

    def __init__(
        self,
        batched_search: Callable[[np.ndarray, int], Tuple[np.ndarray, np.ndarray]],
        max_batch: int = 8,
        max_wait_ms: float = 3.0,
    ):
        self._fn = batched_search
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side ---------------------------------------------------------
    def search(self, image: np.ndarray, k: int, timeout: float = 300.0):
        p = _Pending(image=image, k=k)
        self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("micro-batched search timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=2)

    # -- worker ----------------------------------------------------------------
    def _collect(self) -> List[_Pending]:
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = self.max_wait_s
        while len(batch) < self.max_batch:
            try:
                nxt = self._q.get(timeout=deadline)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                k = max(p.k for p in batch)
                b = pad_to_ladder(len(batch), self.max_batch)
                images = np.stack(
                    [p.image for p in batch]
                    + [np.zeros_like(batch[0].image)] * (b - len(batch))
                )
                dists, ids = self._fn(images, k)
                for j, p in enumerate(batch):
                    p.result = (dists[j : j + 1, : p.k], ids[j : j + 1, : p.k])
                    p.event.set()
            except Exception as e:  # noqa: BLE001 — propagate to every waiter
                for p in batch:
                    p.error = e
                    p.event.set()
