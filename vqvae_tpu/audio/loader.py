"""Prefetching batch loader — the TPU-side replacement for the
reference's ``MultiprocessIterator`` (SURVEY.md §3.1 process boundary).

This machine exposes a single host core, so worker *threads* (decode is
numpy/scipy, which releases the GIL in the hot parts) + a bounded queue
replace the reference's worker processes.  Batches are raw float audio
[B, length+1] + speaker ids; companding/one-hot framing happen on device
(audio/framing.frame_batch), so host->device traffic is 4 bytes/sample
instead of the reference's mu*4 bytes one-hot.

Determinism/resume (reference parity: ``load_npz`` restores the
iterator position — SURVEY.md §3.5): batch ``i`` is a pure function of
``(seed, i)``; workers may race but a sequencer releases batches in
index order, so the stream is identical across runs and a resume from
step N (``start_batch=N``) continues exactly where a straight run
would be.
"""

from __future__ import annotations

import heapq
import queue
import threading
from typing import Iterator, Tuple

import numpy as np


class BatchLoader:
    """Deterministic, resumable iterator of
    (wav [B, length+1] f32, speaker [B] i32)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_threads: int = 2, prefetch: int = 4,
                 start_batch: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self._next_index = start_batch       # next index to hand out
        self._emit_index = start_batch       # next index to emit
        self._index_lock = threading.Lock()
        self._heap: list = []                # (index, batch) reorder buf
        self._heap_lock = threading.Lock()
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_threads))
        ]
        self._threads.append(
            threading.Thread(target=self._emitter, daemon=True))
        for t in self._threads:
            t.start()

    def _make_batch(self, index: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, index]))
        wavs, spks = [], []
        for _ in range(self.batch_size):
            w, s = self.dataset.sample(rng)
            wavs.append(w)
            spks.append(s)
        return np.stack(wavs), np.asarray(spks, dtype=np.int32)

    def _worker(self) -> None:
        while not self._stop.is_set():
            with self._index_lock:
                index = self._next_index
                self._next_index += 1
            # back-pressure: don't decode unboundedly ahead of the emitter
            while (not self._stop.is_set()
                   and index - self._emit_index > 4 * len(self._threads)):
                self._stop.wait(0.01)
            if self._stop.is_set():
                return
            # a raised batch still occupies its heap slot (as the
            # exception object) so the in-order emitter can't stall —
            # __next__ re-raises it on the consumer thread
            try:
                batch = self._make_batch(index)
            except BaseException as exc:  # noqa: BLE001
                batch = exc
            with self._heap_lock:
                heapq.heappush(self._heap, (index, batch))

    def _emitter(self) -> None:
        """Single thread releases batches strictly in index order."""
        while not self._stop.is_set():
            b0 = None
            with self._heap_lock:
                if self._heap and self._heap[0][0] == self._emit_index:
                    _, b0 = heapq.heappop(self._heap)
            if b0 is None:
                self._stop.wait(0.002)
                continue
            while not self._stop.is_set():
                try:
                    self._q.put(b0, timeout=0.5)
                    self._emit_index += 1
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        batch = self._q.get()
        if isinstance(batch, BaseException):
            self.close()
            raise batch
        return batch

    def close(self) -> None:
        self._stop.set()
        while not self._q.empty():
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
