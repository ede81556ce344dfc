"""Training-engine tests (SURVEY.md §4.4): tiny end-to-end train on the
synthetic sine dataset, loss decrease, checkpoint->resume equivalence,
EMA codebook training."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from vqvae_tpu.audio.datasets import SineDataset
from vqvae_tpu.configs import get_config
from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
from vqvae_tpu.train import create_train_state, make_train_step, train
from vqvae_tpu.train.checkpoint import (
    export_weights, latest_step, restore_checkpoint, save_checkpoint,
)


def _cfg(**train_kw):
    cfg = get_config("tiny")
    if train_kw:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))
    return cfg


def _fixed_batches(cfg, n, seed=0):
    ds = SineDataset(cfg.data)
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        wavs, spks = zip(*[ds.sample(rng)
                           for _ in range(cfg.train.batch_size)])
        out.append((np.stack(wavs), np.asarray(spks, np.int32)))
    return out


def _make_step(cfg, mesh):
    jit_for, shardings_of = make_train_step(cfg, mesh)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    sh = shardings_of(state)
    state = jax.device_put(state, sh)
    return jit_for(sh), state, sh


def test_train_step_runs_and_loss_drops():
    cfg = _cfg(batch_size=8)
    mesh = make_mesh()  # 8 CPU devices, pure DP
    step_fn, state, _ = _make_step(cfg, mesh)
    batches = _fixed_batches(cfg, 30)
    first = None
    bsh = batch_sharding(mesh)
    for wav, spk in batches:
        state, metrics = step_fn(state,
                                 jax.device_put(wav, bsh),
                                 jax.device_put(spk, bsh))
        if first is None:
            first = float(metrics["loss1"])
    last = float(metrics["loss1"])
    assert np.isfinite(last)
    assert last < first  # learns the sine quickly
    assert int(jax.device_get(state.step)) == 30


@pytest.mark.parametrize("ema,restart,mult",
                         [(False, 0.0, 1.0), (True, 0.0, 1.0),
                          (True, 1e-3, 1.0), (False, 1e-3, 1.0),
                          (False, 1e-3, 20.0)])
def test_dp_matches_single_device(ema, restart, mult):
    """Same data, same init: 8-way DP must produce the same update as
    one device (XLA psum == serial sum), to float tolerance — including
    the EMA codebook path (per-shard count/sum psum'd by XLA), the
    dead-code restart, and the codebook-LR-mult masked optimizer."""
    cfg = _cfg(batch_size=8, codebook_lr_mult=mult)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, ema=ema, code_restart_threshold=restart))
    batches = _fixed_batches(cfg, 3)
    results = []
    for ndev in (1, 8):
        mesh = make_mesh(devices=jax.devices()[:ndev])
        step_fn, state, _ = _make_step(cfg, mesh)
        bsh = batch_sharding(mesh)
        for wav, spk in batches:
            state, metrics = step_fn(state, jax.device_put(wav, bsh),
                                     jax.device_put(spk, bsh))
        results.append((float(metrics["loss"]),
                        jax.device_get(state.params["vq"]["codebook"]),
                        jax.device_get(state.vq_state.count),
                        jax.device_get(state.vq_state.sum)))
    assert abs(results[0][0] - results[1][0]) < 1e-5
    # the codebook-LR multiplier scales the Adam update — and with it
    # the psum-ordering noise floor between the serial and 8-way sums —
    # linearly, so the absolute tolerance scales with it too (at mult=20
    # the worst element sits ~1.1e-5 after 3 steps, rel ~2.6e-4 of the
    # update)
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=2e-5, atol=2e-6 * max(1.0, mult))
    # the EMA accumulators themselves must be sharding-invariant too
    np.testing.assert_allclose(results[0][2], results[1][2],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(results[0][3], results[1][3],
                               rtol=2e-5, atol=2e-5)


def test_checkpoint_resume_equivalence(tmp_path):
    """Step N then save/restore then M more == straight N+M run
    (SURVEY.md §4.4)."""
    cfg = _cfg(batch_size=8)
    mesh = make_mesh()
    batches = _fixed_batches(cfg, 4)
    bsh = batch_sharding(mesh)

    def run(state, step_fn, bs):
        for wav, spk in bs:
            state, _ = step_fn(state, jax.device_put(wav, bsh),
                               jax.device_put(spk, bsh))
        return state

    step_fn, state, sh = _make_step(cfg, mesh)
    straight = run(state, step_fn, batches)

    step_fn2, state2, sh2 = _make_step(cfg, mesh)
    half = run(state2, step_fn2, batches[:2])
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, half)
    assert latest_step(ckpt) == 2
    restored = restore_checkpoint(ckpt, half)
    restored = jax.device_put(restored, sh2)
    resumed = run(restored, step_fn2, batches[2:])

    a = jax.device_get(straight.params)
    b = jax.device_get(resumed.params)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)
    assert int(jax.device_get(resumed.step)) == 4


def test_ema_training_step():
    cfg = _cfg(batch_size=8)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, ema=True))
    mesh = make_mesh()
    step_fn, state, _ = _make_step(cfg, mesh)
    cb0 = jax.device_get(state.params["vq"]["codebook"])
    bsh = batch_sharding(mesh)
    for wav, spk in _fixed_batches(cfg, 3):
        state, metrics = step_fn(state, jax.device_put(wav, bsh),
                                 jax.device_put(spk, bsh))
    cb1 = jax.device_get(state.params["vq"]["codebook"])
    assert not np.allclose(cb0, cb1)        # EMA moved the codebook
    assert np.isfinite(float(metrics["loss"]))
    assert float(np.sum(jax.device_get(state.vq_state.count))) > 0


def test_non_ema_dead_code_restart():
    """Gradient-trained codebook + dead-code restart (ROADMAP r1 #5):
    usage counts are tracked without overwriting live rows, and rows
    the data never selects get re-seeded from encoder outputs."""
    cfg = _cfg(batch_size=8)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, ema=False, code_restart_threshold=1e-3))
    mesh = make_mesh()
    step_fn, state, _ = _make_step(cfg, mesh)
    cb0 = jax.device_get(state.params["vq"]["codebook"])
    bsh = batch_sharding(mesh)
    for wav, spk in _fixed_batches(cfg, 3):
        state, metrics = step_fn(state, jax.device_put(wav, bsh),
                                 jax.device_put(spk, bsh))
    assert np.isfinite(float(metrics["loss"]))
    count = jax.device_get(state.vq_state.count)
    assert float(np.sum(count)) > 0          # usage EMA is live
    cb1 = jax.device_get(state.params["vq"]["codebook"])
    # unused rows were re-seeded from batch encoder outputs (different
    # distribution than the N(0,1) init), used rows took Adam steps —
    # either way the codebook moved and stays finite
    assert not np.allclose(cb0, cb1)
    assert np.all(np.isfinite(cb1))


def test_train_loop_end_to_end(tmp_path):
    """Full train() loop: logs written, checkpoints created, resume
    continues from the saved step."""
    cfg = _cfg(batch_size=8, num_steps=6, log_every=2,
               checkpoint_every=3)
    out = str(tmp_path / "run")
    ds = SineDataset(cfg.data)
    state = train(cfg, ds, out_dir=out, echo=False)
    assert int(jax.device_get(state.step)) == 6
    recs = [json.loads(l) for l in open(os.path.join(out, "log.jsonl"))]
    assert recs and recs[-1]["iteration"] == 6
    assert {"loss", "loss1", "loss2", "loss3"} <= set(recs[-1])
    assert latest_step(os.path.join(out, "checkpoints")) == 6
    # resume two more steps
    state = train(cfg, ds, out_dir=out, resume=True, num_steps=8,
                  echo=False)
    assert int(jax.device_get(state.step)) == 8


def test_export_weights(tmp_path):
    cfg = _cfg()
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    p = str(tmp_path / "w.npz")
    export_weights(p, state.params)
    z = np.load(p)
    assert any("codebook" in k for k in z.files)
    assert any(k.startswith("decoder/") for k in z.files)


def test_full_fidelity_resume_including_data_stream(tmp_path):
    """train() resumed at step N reproduces the straight run exactly —
    params AND data stream (reference parity: trainer snapshot restores
    iterator position, SURVEY.md §3.5)."""
    from vqvae_tpu.audio.datasets import SineDataset
    cfg = _cfg(batch_size=8, num_steps=4, log_every=10,
               checkpoint_every=2)
    ds = SineDataset(cfg.data)
    straight = train(cfg, ds, out_dir=str(tmp_path / "a"), echo=False)
    # second run: stop at 2 (checkpoint), then resume to 4
    cfg2 = _cfg(batch_size=8, num_steps=2, log_every=10,
                checkpoint_every=2)
    train(cfg2, ds, out_dir=str(tmp_path / "b"), echo=False)
    resumed = train(cfg, ds, out_dir=str(tmp_path / "b"), resume=True,
                    echo=False)
    a = jax.device_get(straight.params)
    b = jax.device_get(resumed.params)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)


def test_weights_npz_round_trip(tmp_path):
    """export_weights -> load_weights_npz reproduces params exactly,
    and the CLI loader accepts a .npz path."""
    from vqvae_tpu.train.checkpoint import load_weights_npz
    cfg = _cfg()
    state = create_train_state(jax.random.PRNGKey(3), cfg)
    p = str(tmp_path / "w.npz")
    export_weights(p, state.params)
    back = load_weights_npz(p, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    from vqvae_tpu.cli.common import load_params
    params = load_params(p, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["vq"]["codebook"]),
        np.asarray(state.params["vq"]["codebook"]))


def test_codebook_lr_mult_scales_only_codebook_update():
    """codebook_lr_mult multiplies the codebook leaf's Adam update and
    leaves every other leaf bit-identical (train/state.py)."""
    from vqvae_tpu.models import init_model
    from vqvae_tpu.train.state import make_optimizer

    cfg1 = _cfg()
    cfg5 = _cfg(codebook_lr_mult=5.0)
    params = init_model(jax.random.PRNGKey(0), cfg1.model)
    grads = jax.tree_util.tree_map(lambda p: np.ones_like(p), params)

    def one_update(cfg):
        opt = make_optimizer(cfg)
        st = opt.init(params)
        up, _ = opt.update(grads, st, params)
        return up

    u1, u5 = one_update(cfg1), one_update(cfg5)
    flat1 = jax.tree_util.tree_flatten_with_path(u1)[0]
    flat5 = jax.tree_util.tree_flatten_with_path(u5)[0]
    saw_codebook = False
    for (path, a), (_, b) in zip(flat1, flat5):
        if any(getattr(k, "key", None) == "codebook" for k in path):
            saw_codebook = True
            np.testing.assert_allclose(np.asarray(b), 5.0 * np.asarray(a),
                                       rtol=1e-6)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert saw_codebook


def test_evaluator_deterministic_full_split():
    """Validation is a reproducible function of the split, not the RNG
    (reference Evaluator parity): fixed utterance list, center crops,
    identical metrics across calls and across batch caps that cover the
    same windows."""
    from vqvae_tpu.train import create_train_state
    from vqvae_tpu.train.evaluator import Evaluator, eval_windows

    class TinySplit:
        """8 fixed utterances of varying length."""

        def __init__(self, cfg):
            self.cfg = cfg

        def __len__(self):
            return 8

        def full(self, i):
            rng = np.random.default_rng(1000 + i)
            n = self.cfg.length + 1 + 37 * i
            return rng.uniform(-0.5, 0.5, n).astype(np.float32), i % 4

    cfg = _cfg(batch_size=8, eval_batches=0)
    ds = TinySplit(cfg.data)
    wavs, spks = eval_windows(ds, cfg)
    assert wavs.shape == (8, cfg.data.length + 1)
    # center crop: utterance 2's window is reproducible
    w2, _ = ds.full(2)
    start = (len(w2) - (cfg.data.length + 1)) // 2
    np.testing.assert_array_equal(
        wavs[2], w2[start:start + cfg.data.length + 1])

    mesh = make_mesh()
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    ev = Evaluator(ds, cfg, mesh)
    m1 = ev(state.params)
    m2 = ev(state.params)
    assert m1 == m2                       # zero RNG noise
    assert {"val_loss", "val_loss1", "val_loss3"} <= set(m1)
    # an explicit cap covering the same 8 windows scores identically
    ev_cap = Evaluator(ds, _cfg(batch_size=8, eval_batches=1), mesh)
    m3 = ev_cap(state.params)
    assert m3 == m1


def test_eval_fires_on_its_own_schedule(tmp_path):
    """eval_every independent of log_every: validation rows appear even
    when the two schedules never coincide (regression: eval used to be
    gated on log steps)."""
    import json
    from vqvae_tpu.audio.datasets import SineDataset

    cfg = _cfg(batch_size=8, num_steps=6, eval_every=3, eval_batches=1,
               log_every=100, checkpoint_every=100)
    out = str(tmp_path)
    train(cfg, SineDataset(cfg.data), out_dir=out,
          valid_dataset=SineDataset(cfg.data, f0=137.0))
    rows = [json.loads(l) for l in open(os.path.join(out, "log.jsonl"))]
    eval_steps = [r["iteration"] for r in rows if "val_loss1" in r]
    assert eval_steps == [3, 6], rows
