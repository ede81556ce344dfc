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
    with pytest.raises(ValueError, match="multiple of"):
        PallasStreamDecoder(params, cfg, chunk=1)
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
