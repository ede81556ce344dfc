"""Prefetching batch loader — the TPU-side replacement for the
reference's ``MultiprocessIterator`` (SURVEY.md §3.1 process boundary).

This machine exposes a single host core, so worker *threads* (decode is
numpy/scipy, which releases the GIL in the hot parts) + a bounded queue
replace the reference's worker processes.  Batches are raw float audio
[B, length+1] + speaker ids; companding/one-hot framing happen on device
(audio/framing.frame_batch), so host->device traffic is 4 bytes/sample
instead of the reference's mu*4 bytes one-hot.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Tuple

import numpy as np


class BatchLoader:
    """Infinite iterator of (wav [B, length+1] f32, speaker [B] i32)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_threads: int = 2, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(
                target=self._worker,
                args=(np.random.default_rng(seed * 1000 + t),),
                daemon=True,
            )
            for t in range(max(1, num_threads))
        ]
        for t in self._threads:
            t.start()

    def _worker(self, rng: np.random.Generator) -> None:
        while not self._stop.is_set():
            wavs, spks = [], []
            for _ in range(self.batch_size):
                w, s = self.dataset.sample(rng)
                wavs.append(w)
                spks.append(s)
            batch = (np.stack(wavs), np.asarray(spks, dtype=np.int32))
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        return self._q.get()

    def close(self) -> None:
        self._stop.set()
        while not self._q.empty():
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
