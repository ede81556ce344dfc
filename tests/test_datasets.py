"""VCTK-style dataset pipeline tests over a synthetic wav tree
(no real VCTK in CI), plus train/valid split and eval integration."""

import dataclasses
import json
import os

import numpy as np

from vqvae_tpu.audio.datasets import (
    SineDataset, WavDataset, scan_vctk, train_valid_split,
)
from vqvae_tpu.audio.wav_io import save_wav
from vqvae_tpu.configs import get_config


def _fake_vctk(root, n_speakers=3, n_utts=4, sr=16000):
    rng = np.random.default_rng(0)
    for s in range(n_speakers):
        d = os.path.join(root, "wav48", f"p{225 + s}")
        os.makedirs(d)
        for u in range(n_utts):
            f = 200 + 50 * s
            t = np.arange(int(sr * 0.6)) / sr
            wav = 0.4 * np.sin(2 * np.pi * f * t) + \
                rng.normal(0, 0.01, t.shape)
            save_wav(os.path.join(d, f"p{225 + s}_{u:03d}.wav"),
                     wav.astype(np.float32), 48000)  # 48k: resample path
    return root


def test_scan_vctk_and_speaker_dict(tmp_path):
    root = _fake_vctk(str(tmp_path))
    paths, ids, spk = scan_vctk(root)
    assert len(paths) == 12
    assert spk == {"p225": 0, "p226": 1, "p227": 2}
    assert sorted(set(ids)) == [0, 1, 2]
    # single-speaker restriction (reference: vctk-single preset)
    paths1, ids1, spk1 = scan_vctk(root, speaker="p226")
    assert len(paths1) == 4 and set(ids1) == {0}


def test_wav_dataset_crop_and_full(tmp_path):
    root = _fake_vctk(str(tmp_path))
    paths, ids, _ = scan_vctk(root)
    cfg = dataclasses.replace(get_config("tiny").data, length=512)
    ds = WavDataset(paths, ids, cfg)
    rng = np.random.default_rng(1)
    wav, spk = ds.sample(rng)
    assert wav.shape == (513,) and wav.dtype == np.float32
    assert 0 <= spk < 3
    full, spk0 = ds.full(0)
    assert len(full) > 513  # whole trimmed utterance


def test_train_valid_split():
    paths = [f"f{i}.wav" for i in range(100)]
    ids = list(range(100))
    (tp, ti), (vp, vi) = train_valid_split(paths, ids, 0.1, seed=3)
    assert len(tp) == 90 and len(vp) == 10
    assert set(tp) | set(vp) == set(paths)
    assert not set(tp) & set(vp)
    # deterministic
    (tp2, _), _ = train_valid_split(paths, ids, 0.1, seed=3)
    assert tp == tp2


def test_train_with_eval(tmp_path):
    import jax
    from vqvae_tpu.train import train
    cfg = get_config("tiny")
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=8, num_steps=4, log_every=2,
        eval_every=2, eval_batches=1, checkpoint_every=4))
    out = str(tmp_path / "run")
    state = train(cfg, SineDataset(cfg.data), out_dir=out, echo=False,
                  valid_dataset=SineDataset(cfg.data, f0=137.0))
    recs = [json.loads(l) for l in open(os.path.join(out, "log.jsonl"))]
    has_val = [r for r in recs if "val_loss1" in r]
    assert has_val, "validation metrics missing from log"
    assert np.isfinite(has_val[-1]["val_loss1"])
