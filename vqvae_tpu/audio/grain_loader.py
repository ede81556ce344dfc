"""grain-backed batch loader — an alternative host pipeline to
``audio.loader.BatchLoader`` (ROADMAP item 7; SURVEY.md §7 verified
``grain`` in the toolbox; the reference's analogue is Chainer's
``MultiprocessIterator``, SURVEY.md §3.1 process boundary).

Design: the grain pipeline is built so its stream is **bit-identical**
to ``BatchLoader``'s — batch ``i`` is the same pure function of
``(seed, i)`` (same ``SeedSequence([seed, index])``, same per-element
``dataset.sample`` walk), so the two loaders are interchangeable mid-
training and the checkpoint/resume contract (``start_batch=N``) carries
over unchanged.  What grain adds over the thread loader:

* worker *processes* (``worker_count>0``) for hosts where numpy/scipy
  decode does not release the GIL enough — the thread loader is the
  default on this single-core machine, where processes only add IPC;
* grain's own bounded prefetch and per-worker buffers
  (``read_options``);
* the battle-tested shutdown/fault paths of a production input
  pipeline.

Stream identity + resume are pinned in tests/test_grain_loader.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


class _BatchSource:
    """grain RandomAccessDataSource: record ``i`` = whole batch
    ``start_batch + i`` (wav [B, length+1] f32, speaker [B] i32)."""

    def __init__(self, dataset, batch_size: int, seed: int,
                 start_batch: int):
        self._dataset = dataset
        self._batch_size = batch_size
        self._seed = seed
        self._start = start_batch

    def __len__(self) -> int:
        # grain requires a finite length; training is open-ended, so
        # expose an effectively-infinite index space (2**40 batches)
        return 1 << 40

    def __getitem__(self, i: int):
        index = self._start + i
        rng = np.random.default_rng(
            np.random.SeedSequence([self._seed, index]))
        wavs, spks = [], []
        for _ in range(self._batch_size):
            w, s = self._dataset.sample(rng)
            wavs.append(w)
            spks.append(s)
        return np.stack(wavs), np.asarray(spks, dtype=np.int32)


class GrainBatchLoader:
    """Drop-in replacement for ``BatchLoader`` backed by
    ``grain.python.DataLoader`` (same constructor contract, same
    deterministic stream)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_workers: int = 0, prefetch: int = 4,
                 start_batch: int = 0, num_threads: int | None = None):
        # num_threads accepted (ignored) so call sites can switch
        # loaders without changing kwargs
        import grain.python as pygrain

        source = _BatchSource(dataset, batch_size, seed, start_batch)
        sampler = pygrain.IndexSampler(
            num_records=len(source),
            shard_options=pygrain.NoSharding(),
            shuffle=False,           # determinism comes from (seed, i)
            num_epochs=1,
            seed=seed,
        )
        self._dl = pygrain.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[],
            worker_count=num_workers,
            read_options=pygrain.ReadOptions(
                num_threads=1, prefetch_buffer_size=max(1, prefetch)),
        )
        self._it = iter(self._dl)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        wav, spk = next(self._it)
        return np.asarray(wav), np.asarray(spk)

    def close(self) -> None:
        # deterministic shutdown: with worker_count>0 the prefetch
        # threads/worker processes must be reaped NOW, not whenever GC
        # collects the iterator (BatchLoader.close parity). grain's
        # public DataLoaderIterator has no close(), but its inner
        # dataset iterator does — call it defensively so an API shift
        # degrades back to GC cleanup instead of crashing.
        it, self._it, self._dl = self._it, None, None
        inner = getattr(it, "_iterator", None)
        closer = getattr(inner, "close", None)
        if closer is not None:
            closer()


def make_loader(kind: str, dataset, batch_size: int, seed: int = 0,
                start_batch: int = 0, **kw):
    """Loader factory: ``kind`` in {"threads", "grain"}."""
    if kind == "grain":
        return GrainBatchLoader(dataset, batch_size, seed=seed,
                                start_batch=start_batch, **kw)
    if kind == "threads":
        from vqvae_tpu.audio.loader import BatchLoader
        return BatchLoader(dataset, batch_size, seed=seed,
                           start_batch=start_batch, **kw)
    raise ValueError(f"unknown loader kind: {kind!r}")
