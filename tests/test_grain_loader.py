"""grain-backed loader: stream identity with BatchLoader + resume.

The grain pipeline (audio/grain_loader.py) must produce the *same*
deterministic stream as the thread loader — batch i is a pure function
of (seed, i) — so the two are interchangeable and checkpoints resume
identically under either (reference parity: iterator-position restore,
SURVEY.md §3.5).
"""

import numpy as np
import pytest

pytest.importorskip("grain")

from vqvae_tpu.audio.datasets import SineDataset  # noqa: E402
from vqvae_tpu.audio.grain_loader import (  # noqa: E402
    GrainBatchLoader, make_loader,
)
from vqvae_tpu.audio.loader import BatchLoader  # noqa: E402
from vqvae_tpu.configs.presets import DataConfig  # noqa: E402


def _take(loader, n):
    out = [next(loader) for _ in range(n)]
    loader.close()
    return out


def test_grain_loader_matches_thread_loader():
    cfg = DataConfig(length=128, n_speakers=4)
    ds = SineDataset(cfg)
    a = _take(BatchLoader(ds, 4, seed=7), 5)
    g = _take(GrainBatchLoader(ds, 4, seed=7), 5)
    for (wa, sa), (wg, sg) in zip(a, g):
        np.testing.assert_array_equal(wa, wg)
        np.testing.assert_array_equal(sa, sg)


def test_grain_loader_shapes_and_resume():
    cfg = DataConfig(length=256, n_speakers=4)
    ds = SineDataset(cfg)
    a = _take(GrainBatchLoader(ds, 4, seed=3), 6)
    wav, spk = a[0]
    assert wav.shape == (4, 257) and wav.dtype == np.float32
    assert spk.shape == (4,) and spk.dtype == np.int32
    # resume from batch 2 == tail of the straight stream
    c = _take(GrainBatchLoader(ds, 4, seed=3, start_batch=2), 4)
    for (wa, sa), (wc, sc) in zip(a[2:], c):
        np.testing.assert_array_equal(wa, wc)
        np.testing.assert_array_equal(sa, sc)


def test_make_loader_factory():
    cfg = DataConfig(length=128, n_speakers=2)
    ds = SineDataset(cfg)
    for kind, typ in [("threads", BatchLoader),
                      ("grain", GrainBatchLoader)]:
        ld = make_loader(kind, ds, 2, seed=1)
        assert isinstance(ld, typ)
        wav, spk = next(ld)
        assert wav.shape == (2, 129)
        ld.close()
    with pytest.raises(ValueError):
        make_loader("nope", ds, 2)
