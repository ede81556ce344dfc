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


def test_resume_across_loader_kinds(tmp_path):
    """The two host pipelines are interchangeable MID-TRAINING: a run
    checkpointed under the thread loader and resumed under grain
    reproduces the straight thread-loader run exactly (batch i is the
    same pure function of (seed, i) in both)."""
    import dataclasses

    import jax
    import numpy as np

    from vqvae_tpu.audio.datasets import SineDataset
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.train import train

    def cfg_for(loader, steps):
        cfg = get_config("tiny")
        return cfg.replace(train=dataclasses.replace(
            cfg.train, batch_size=8, num_steps=steps, log_every=10,
            checkpoint_every=2, loader=loader))

    ds = SineDataset(cfg_for("threads", 4).data)
    straight = train(cfg_for("threads", 4), ds,
                     out_dir=str(tmp_path / "a"), echo=False)
    train(cfg_for("threads", 2), ds, out_dir=str(tmp_path / "b"),
          echo=False)
    resumed = train(cfg_for("grain", 4), ds,
                    out_dir=str(tmp_path / "b"), resume=True,
                    echo=False)
    for la, lb in zip(
            jax.tree_util.tree_leaves(jax.device_get(straight.params)),
            jax.tree_util.tree_leaves(jax.device_get(resumed.params))):
        np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)
