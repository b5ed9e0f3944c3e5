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


def measure_micro_batch_gain(
    batched_search: Callable[[np.ndarray, int], Tuple[np.ndarray, np.ndarray]],
    image_shape: Tuple[int, ...],
    k: int,
    max_batch: int,
    reps: int = 3,
) -> Tuple[float, float]:
    """Measure whether coalescing pays ON THIS TOPOLOGY.

    Micro-batching trades per-dispatch overhead (amortized over B riders)
    against a collect wait — but independent dispatches already pipeline
    through the device stream, so on remote-tunnel topologies it measured
    STRICTLY WORSE at every concurrency (BENCH_NOTES "Serving-layer
    scaling, in-process"). Whether it pays is a property of the serving
    host's dispatch overhead, not of this code, so ``--micro-batch auto``
    measures instead of guessing: run ``max_batch`` independent B=1
    searches from ``max_batch`` threads (the no-batcher serving shape)
    vs one padded B=``max_batch`` dispatch, both warm.

    Returns ``(threaded_ms_per_query, batched_ms_per_query)`` using the
    best of ``reps`` runs for each side (min filters scheduler noise;
    both sides get the same treatment).
    """
    import time

    img1 = np.zeros((1, *image_shape), np.float32)
    imgb = np.zeros((max_batch, *image_shape), np.float32)
    # warm both programs so neither side's timing includes a compile
    batched_search(img1, k)
    batched_search(imgb, k)

    threaded: List[float] = []
    for _ in range(reps):
        # threads are created AND started outside the timed region, parked
        # on an Event — thread spawn overhead has no analog on the batched
        # side and would bias the auto decision toward batching; and any
        # exception inside a thread is captured and re-raised so a failing
        # B=1 dispatch routes through the calibration-failed path instead
        # of being reported as an artificially fast "threaded" time
        errors: List[BaseException] = []
        release = threading.Event()

        def target():
            release.wait()
            try:
                batched_search(img1, k)
            except BaseException as e:  # noqa: BLE001 — re-raised after join
                errors.append(e)

        threads = [threading.Thread(target=target) for _ in range(max_batch)]
        for t in threads:
            t.start()
        t0 = time.perf_counter()
        release.set()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        if errors:
            raise errors[0]
        threaded.append(dt / max_batch * 1e3)

    batched: List[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        batched_search(imgb, k)
        batched.append((time.perf_counter() - t0) / max_batch * 1e3)

    return min(threaded), min(batched)


def micro_batch_pays(
    threaded_ms: float, batched_ms: float, margin: float = 0.9
) -> bool:
    """Decision rule for ``--micro-batch auto``: coalescing must beat the
    pipelined independent-dispatch baseline by >10% per query to justify
    the batcher's collect wait (``max_wait_ms`` of added latency under
    low load) — a tie goes to the simpler per-request path."""
    return batched_ms < threaded_ms * margin


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
