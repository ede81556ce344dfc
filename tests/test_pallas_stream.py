"""PallasStreamDecoder == one-shot pallas engine, bit-exact.

The serving fast path (fixed-width resumable kernel pushes over the
chunked upsampler's cond) must reproduce
``decode_from_codes(impl='pallas')`` exactly for ANY request length:
chunk-multiple, ragged, and shorter-than-one-chunk code counts all
route through different push patterns but the same compiled programs.

CPU pins the greedy chain (in-kernel PRNG is TPU-only); sampled parity
is TPU-gated below and witnessed in bench.py's serving block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.configs import get_config
from vqvae_tpu.infer.fastgen import decode_from_codes
from vqvae_tpu.infer.pallas_stream import PallasStreamDecoder
from vqvae_tpu.models import init_model


def _setup(B=1, seed=0):
    cfg = get_config("tiny").model
    params = init_model(jax.random.PRNGKey(seed), cfg)
    spk = jnp.arange(B) % cfg.n_speakers
    return cfg, params, spk


@pytest.mark.parametrize("n_codes", [32, 23, 4])
def test_greedy_matches_oneshot_pallas(n_codes):
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(5)
    codes = np.asarray(
        jax.random.randint(key, (1, n_codes), 0, cfg.K), np.int32)
    ref = decode_from_codes(params, cfg, jnp.asarray(codes), spk, key,
                            greedy=True, impl="pallas")
    dec = PallasStreamDecoder(params, cfg, greedy=True)
    got = dec.decode(codes, spk, key)
    assert got.shape == (1, n_codes * cfg.hop)
    assert np.array_equal(np.asarray(ref), got)


def test_batched_and_speaker():
    cfg, params, spk = _setup(B=2)
    key = jax.random.PRNGKey(6)
    codes = np.asarray(
        jax.random.randint(key, (2, 17), 0, cfg.K), np.int32)
    ref = decode_from_codes(params, cfg, jnp.asarray(codes), spk, key,
                            greedy=True, impl="pallas")
    got = PallasStreamDecoder(params, cfg, greedy=True).decode(
        codes, spk, key)
    assert np.array_equal(np.asarray(ref), got)


def test_decoder_is_reusable():
    """One decoder instance serves several requests (fresh kernel
    state per decode) — request isolation for the daemon."""
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(7)
    codes = np.asarray(
        jax.random.randint(key, (1, 16), 0, cfg.K), np.int32)
    dec = PallasStreamDecoder(params, cfg, greedy=True)
    a = dec.decode(codes, spk, key)
    b = dec.decode(codes, spk, key)
    assert np.array_equal(a, b)


def test_rejects_bad_chunk_and_shape():
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(8)
    # kernel_frames forced so the invalid geometry is requested on
    # every backend (TPU's auto width rounds chunk=1 up to a legal 64)
    with pytest.raises(ValueError, match="multiple of"):
        PallasStreamDecoder(params, cfg, chunk=1, kernel_frames=1)
    dec = PallasStreamDecoder(params, cfg, greedy=True)
    with pytest.raises(ValueError, match=r"codes must be"):
        dec.decode(np.zeros(16, np.int32), spk, key)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pltpu.prng_* unsupported in CPU interpret mode; sampled "
           "parity runs on real TPU (VQVAE_TESTS_TPU=1)")
def test_sampled_matches_oneshot_pallas_tpu():
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(9)
    codes = np.asarray(
        jax.random.randint(key, (1, 40), 0, cfg.K), np.int32)
    ref = decode_from_codes(params, cfg, jnp.asarray(codes), spk, key,
                            impl="pallas")
    got = PallasStreamDecoder(params, cfg).decode(codes, spk, key)
    assert np.array_equal(np.asarray(ref), got)


@pytest.mark.parametrize("slices", [(5, 1, 14, 17), (16, 16, 5),
                                    (1,) * 9, (37,)])
def test_session_matches_oneshot_greedy(slices):
    """An incremental session fed ANY push pattern produces the same
    bits as one decode() of the concatenated codes (the live-streaming
    contract the daemon's stream_open op rides on)."""
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(11)
    n = sum(slices)
    codes = np.asarray(
        jax.random.randint(key, (1, n), 0, cfg.K), np.int32)
    dec = PallasStreamDecoder(params, cfg, greedy=True, chunk=4,
                              kernel_frames=4)
    ref = dec.decode(codes, spk, key)
    sess = dec.session(spk, key)
    pieces, i = [], 0
    for w in slices:
        pieces.append(sess.push(codes[:, i:i + w]))
        i += w
    pieces.append(sess.close())
    got = np.concatenate(pieces, axis=1)
    assert got.shape == ref.shape
    assert np.array_equal(ref, got)


def test_session_misuse():
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(12)
    dec = PallasStreamDecoder(params, cfg, greedy=True,
                              kernel_frames=4)
    sess = dec.session(spk, key)
    with pytest.raises(ValueError, match="codes must be"):
        sess.push(np.zeros(8, np.int32))
    sess.push(np.zeros((1, 3), np.int32))
    sess.close()
    with pytest.raises(ValueError, match="closed"):
        sess.push(np.zeros((1, 1), np.int32))
    with pytest.raises(ValueError, match="closed"):
        sess.close()
    # an empty-stream close is legal and empty
    empty = dec.session(spk, key).close()
    assert empty.shape == (1, 0)


def test_concurrent_sessions_are_isolated():
    """Two sessions on ONE decoder interleave without sharing state
    (each owns its upsampler carry + ring buffers)."""
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(13)
    codes = np.asarray(
        jax.random.randint(key, (1, 24), 0, cfg.K), np.int32)
    dec = PallasStreamDecoder(params, cfg, greedy=True, chunk=4,
                              kernel_frames=4)
    ref = dec.decode(codes, spk, key)
    a, b = dec.session(spk, key), dec.session(spk, key)
    pa, pb = [], []
    for i in range(0, 24, 8):         # interleaved pushes
        pa.append(a.push(codes[:, i:i + 8]))
        pb.append(b.push(codes[:, i:i + 8]))
    pa.append(a.close())
    pb.append(b.close())
    assert np.array_equal(np.concatenate(pa, axis=1), ref)
    assert np.array_equal(np.concatenate(pb, axis=1), ref)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pltpu.prng_* unsupported in CPU interpret mode; sampled "
           "parity runs on real TPU (VQVAE_TESTS_TPU=1)")
def test_session_sampled_matches_oneshot_tpu():
    """Sampled sessions too: the kernel PRNG is indexed by absolute
    chunk number, so the incremental stream draws the identical
    noise."""
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(14)
    codes = np.asarray(
        jax.random.randint(key, (1, 40), 0, cfg.K), np.int32)
    dec = PallasStreamDecoder(params, cfg, chunk=4, kernel_frames=4)
    ref = dec.decode(codes, spk, key, temperature=0.9)
    sess = dec.session(spk, key, temperature=0.9)
    pieces = [sess.push(codes[:, :7]), sess.push(codes[:, 7:30]),
              sess.push(codes[:, 30:]), sess.close()]
    assert np.array_equal(np.concatenate(pieces, axis=1), ref)


def test_kernel_frames_decoupled_from_chunk():
    """kernel_frames (kernel push width) is independent of chunk (the
    upsampler push width) and cannot change the audio."""
    cfg, params, spk = _setup()
    key = jax.random.PRNGKey(10)
    codes = np.asarray(
        jax.random.randint(key, (1, 23), 0, cfg.K), np.int32)
    a = PallasStreamDecoder(params, cfg, greedy=True, chunk=16,
                            kernel_frames=4).decode(codes, spk, key)
    b = PallasStreamDecoder(params, cfg, greedy=True, chunk=16,
                            kernel_frames=8).decode(codes, spk, key)
    assert np.array_equal(a, b)
