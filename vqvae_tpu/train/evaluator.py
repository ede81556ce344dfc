"""Deterministic validation evaluator (reference: the Evaluator
trainer extension iterating the valid split — SURVEY.md §2.1 Training
CLI row).

Unlike training (IID random crops), validation is a *reproducible
function of the split*: a fixed utterance list (dataset order), one
deterministic center crop per utterance, iterated in fixed batches.
Two evals at different steps — or on different hosts / mesh layouts —
score exactly the same windows, so val-loss curves are comparable
run-to-run with zero RNG noise.
"""

from __future__ import annotations

import numpy as np

from vqvae_tpu.configs import Config

# ceiling on deterministic eval windows when eval_batches == 0 asks for
# the full split (a [n, length+1] float32 stack is held for the run:
# 16384 windows ~ 500 MB at flagship length — the cap bounds both that
# and the per-eval batch count; synthetic datasets additionally expose
# a small nominal __len__ so they never get near it)
MAX_EVAL_WINDOWS = 16384


def eval_windows(dataset, cfg: Config) -> tuple[np.ndarray, np.ndarray]:
    """Fixed eval set: one center crop of ``length+1`` samples per
    utterance, dataset order, count rounded down to a batch multiple
    (tiny splits cycle to fill one batch)."""
    B = cfg.train.batch_size
    cap = (cfg.train.eval_batches * B if cfg.train.eval_batches > 0
           else MAX_EVAL_WINDOWS)
    n = min(len(dataset), cap)
    n = max(B, (n // B) * B)
    need = cfg.data.length + 1
    wavs, spks = [], []
    for j in range(n):
        wav, spk = dataset.full(j % len(dataset))
        if len(wav) < need:
            wav = np.pad(wav, (0, need - len(wav)))
        start = (len(wav) - need) // 2
        wavs.append(wav[start:start + need].astype(np.float32))
        spks.append(spk)
    return np.stack(wavs), np.asarray(spks, np.int32)


class Evaluator:
    """Runs the fixed eval set through the jitted eval step and returns
    ``val_*`` metric means over the whole set (every batch is full, so
    the mean of batch means is the exact per-window mean)."""

    def __init__(self, dataset, cfg: Config, mesh, impl: str = "lax"):
        from vqvae_tpu.train.step import make_eval_step
        self.cfg = cfg
        self._eval_fn = make_eval_step(cfg, mesh, impl)
        self._dataset = dataset
        self._windows = None      # built lazily (decodes the split once)
        self._mesh = mesh

    @property
    def n_windows(self) -> int:
        """Size of the fixed eval set (builds it on first access)."""
        if self._windows is None:
            self._windows = eval_windows(self._dataset, self.cfg)
        return len(self._windows[0])

    def __call__(self, params) -> dict:
        import jax

        from vqvae_tpu.parallel.distributed import (
            local_batch_slice, put_global_batch,
        )
        from vqvae_tpu.parallel.mesh import batch_sharding

        if self._windows is None:
            self._windows = eval_windows(self._dataset, self.cfg)
        wavs, spks = self._windows
        B = self.cfg.train.batch_size
        bshard = batch_sharding(self._mesh)
        hsl = local_batch_slice(B)
        acc = None
        n_batches = len(wavs) // B
        for i in range(n_batches):
            wav, spk = put_global_batch(
                bshard,
                wavs[i * B:(i + 1) * B][hsl],
                spks[i * B:(i + 1) * B][hsl])
            m = jax.device_get(self._eval_fn(params, wav, spk))
            acc = m if acc is None else {k: acc[k] + m[k] for k in acc}
        return {f"val_{k}": v / n_batches for k, v in acc.items()}
