"""Audio-core unit tests (SURVEY.md §4.1): mu-law round trip, framing
shapes, silence trim, loader."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio import frame_batch, mu_law_decode, mu_law_encode
from vqvae_tpu.audio.datasets import SineDataset
from vqvae_tpu.audio.loader import BatchLoader
from vqvae_tpu.audio.wav_io import save_wav, load_wav, trim_silence
from vqvae_tpu.configs import DataConfig


def test_mu_law_round_trip():
    x = jnp.linspace(-1.0, 1.0, 4097)
    ids = mu_law_encode(x, 256)
    assert ids.dtype == jnp.int32
    assert int(ids.min()) >= 0 and int(ids.max()) <= 255
    x2 = mu_law_decode(ids, 256)
    # round-trip error bounded by quantization bin half-width (non-uniform;
    # widest near |x|=1: dx/dy * bin = ln(256)*256/255 / 255 ~= 0.0218)
    assert float(jnp.max(jnp.abs(x - x2))) < 0.022
    # decode is exact fixed point of encode
    assert jnp.array_equal(mu_law_encode(x2, 256), ids)


def test_mu_law_extremes_and_zero():
    x = jnp.array([-1.0, 0.0, 1.0])
    ids = mu_law_encode(x, 256)
    assert ids[0] == 0 and ids[2] == 255
    # zero is not a bin centre with an even number of bins; residual is
    # half the centre bin (~-81 dB), inaudible
    assert abs(float(mu_law_decode(ids, 256)[1])) < 1e-4


def test_mu_law_chainer_mode():
    """The Chainer-parity binning (digitize-style, mu companding
    constant): valid range, monotone, bounded round-trip error, and a
    closed-form match of np.digitize over the reference's bin edges."""
    x = jnp.linspace(-1.0, 1.0, 4097)
    ids = mu_law_encode(x, 256, mode="chainer")
    assert int(ids.min()) == 0 and int(ids.max()) == 255
    assert bool(jnp.all(jnp.diff(ids) >= 0))  # monotone in x
    x2 = mu_law_decode(ids, 256, mode="chainer")
    assert float(jnp.max(jnp.abs(x - x2))) < 0.045  # floor-binning: one
    # full bin of error near |x|=1 (round mode halves this)
    # closed form == np.digitize(y, 2*arange(mu)/mu - 1) - 1
    mu = 256
    y = np.sign(x) * np.log1p(mu * np.abs(np.asarray(x))) / np.log1p(mu)
    ref = np.digitize(y, 2 * np.arange(mu) / mu - 1) - 1
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.clip(ref, 0, mu - 1))
    # edge deltas vs the TPU-native rounding stay within 1 id
    ids_round = mu_law_encode(x, 256, mode="round")
    assert int(jnp.max(jnp.abs(ids - ids_round))) <= 1


def test_chainer_mode_trains():
    """mulaw_mode='chainer' flows through framing + train step."""
    import dataclasses
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
    from vqvae_tpu.train import create_train_state, make_train_step
    cfg = get_config("tiny")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, mulaw_mode="chainer"),
        train=dataclasses.replace(cfg.train, batch_size=8))
    mesh = make_mesh()
    jit_for, sh_of = make_train_step(cfg, mesh)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    sh = sh_of(state)
    state = jax.device_put(state, sh)
    rng = np.random.default_rng(0)
    wav = jax.device_put(rng.uniform(-0.9, 0.9, (8, 1025))
                         .astype(np.float32), batch_sharding(mesh))
    spk = jax.device_put(np.zeros(8, np.int32), batch_sharding(mesh))
    state, metrics = jit_for(sh)(state, wav, spk)
    assert np.isfinite(float(metrics["loss"]))


def test_frame_batch_shapes_and_alignment():
    B, L = 3, 64
    wav = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, L + 1)),
                      dtype=jnp.float32)
    spk = jnp.arange(B)
    batch = frame_batch(wav, spk, mu=256)
    assert batch.wav.shape == (B, L)
    assert batch.ids_in.shape == (B, L)
    assert batch.targets.shape == (B, L)
    # next-sample prediction: targets[t] is the id of sample t+1
    ids_full = mu_law_encode(wav, 256)
    assert jnp.array_equal(batch.ids_in, ids_full[:, :-1])
    assert jnp.array_equal(batch.targets, ids_full[:, 1:])
    # encoder input is the mu-law-quantised waveform
    assert jnp.allclose(batch.wav, mu_law_decode(ids_full, 256)[:, :-1])


def test_trim_silence():
    sr = 16000
    sig = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    padded = np.concatenate(
        [np.zeros(8000, np.float32), sig, np.zeros(8000, np.float32)])
    trimmed = trim_silence(padded, top_db=20.0)
    assert len(trimmed) < len(padded)
    assert len(trimmed) >= len(sig) - 4096  # keeps the tone


def test_wav_io_round_trip(tmp_path):
    sr = 16000
    wav = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
           ).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, wav, sr)
    back = load_wav(p, sr)
    assert back.shape == wav.shape
    assert np.max(np.abs(back - wav)) < 2e-4  # 16-bit quantisation


def test_wav_io_resample(tmp_path):
    wav = np.sin(2 * np.pi * 220 * np.arange(48000) / 48000
                 ).astype(np.float32)
    p = str(tmp_path / "t48.wav")
    save_wav(p, wav, 48000)
    back = load_wav(p, 16000)
    assert abs(len(back) - 16000) <= 1


def test_batch_loader():
    cfg = DataConfig(length=256, n_speakers=4)
    loader = BatchLoader(SineDataset(cfg), batch_size=4, seed=1)
    wav, spk = next(loader)
    assert wav.shape == (4, 257) and wav.dtype == np.float32
    assert spk.shape == (4,) and spk.dtype == np.int32
    assert np.all(spk >= 0) and np.all(spk < 4)
    loader.close()


def test_batch_loader_deterministic_and_resumable():
    cfg = DataConfig(length=128, n_speakers=4)
    ds = SineDataset(cfg)

    def take(loader, n):
        out = [next(loader) for _ in range(n)]
        loader.close()
        return out

    a = take(BatchLoader(ds, 4, seed=7, num_threads=3), 6)
    b = take(BatchLoader(ds, 4, seed=7, num_threads=1), 6)
    for (wa, sa), (wb, sb) in zip(a, b):
        np.testing.assert_array_equal(wa, wb)
        np.testing.assert_array_equal(sa, sb)
    # resume from batch 3 == tail of the straight stream
    c = take(BatchLoader(ds, 4, seed=7, start_batch=3), 3)
    for (wa, sa), (wc, sc) in zip(a[3:], c):
        np.testing.assert_array_equal(wa, wc)
        np.testing.assert_array_equal(sa, sc)
    # different seed -> different stream
    d = take(BatchLoader(ds, 4, seed=8), 1)
    assert not np.array_equal(a[0][0], d[0][0])
