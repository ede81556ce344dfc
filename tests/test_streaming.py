"""Streaming synthesis == one-shot synthesis, bit-exact under greedy
decoding (SURVEY.md §5.7: arbitrary length with constant memory)."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.configs import get_config
from vqvae_tpu.infer.fastgen import decode_from_codes
from vqvae_tpu.infer.streaming import StreamingSynthesizer
from vqvae_tpu.models import init_model

CFG = get_config("tiny").model


def _setup(T_lat=12, B=2):
    params = init_model(jax.random.PRNGKey(0), CFG)
    codes = jax.random.randint(jax.random.PRNGKey(1), (B, T_lat),
                               0, CFG.K)
    spk = jnp.arange(B) % CFG.n_speakers
    return params, codes, spk


def test_streaming_matches_one_shot_greedy():
    params, codes, spk = _setup()
    key = jax.random.PRNGKey(2)
    full = decode_from_codes(params, CFG, codes, spk, key, greedy=True)

    s = StreamingSynthesizer(params, CFG, spk, key, greedy=True)
    pieces = [s.push(codes[:, :5]), s.push(codes[:, 5:9]),
              s.push(codes[:, 9:]), s.flush()]
    streamed = jnp.concatenate(pieces, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_array_equal(np.asarray(streamed), np.asarray(full))


def test_streaming_single_frame_chunks():
    params, codes, spk = _setup(T_lat=6)
    key = jax.random.PRNGKey(3)
    full = decode_from_codes(params, CFG, codes, spk, key, greedy=True)
    s = StreamingSynthesizer(params, CFG, spk, key, greedy=True)
    pieces = [s.push(codes[:, i:i + 1]) for i in range(6)] + [s.flush()]
    streamed = jnp.concatenate(pieces, axis=1)
    np.testing.assert_array_equal(np.asarray(streamed), np.asarray(full))


def test_streaming_push_after_flush():
    """push() after flush() starts a fresh carry-less upsample chunk
    (regression: the jitted upsample once tied the carry-add to the
    non-first flag and added a dummy array after flush)."""
    params, codes, spk = _setup(T_lat=8)
    s = StreamingSynthesizer(params, CFG, spk, jax.random.PRNGKey(5),
                             greedy=True)
    s.push(codes[:, :4])
    s.flush()
    out = s.push(codes[:, 4:])   # non-first AND carry-less
    assert out.shape == (2, 4 * CFG.hop)
    assert np.all(np.isfinite(np.asarray(out)))


def test_streaming_constant_state_size():
    params, codes, spk = _setup(T_lat=8)
    s = StreamingSynthesizer(params, CFG, spk, jax.random.PRNGKey(4))
    sizes = []
    for i in range(8):
        s.push(codes[:, i:i + 1])
        sizes.append(sum(b.size for b in s.state.bufs)
                     + s._ups._carry.size)
    assert len(set(sizes)) == 1  # state never grows with output length


def test_streaming_sampling_matches_one_shot():
    """Sampling mode is bit-identical to one-shot: per-step keys are
    fold_in(key, t) with the global step t carried across chunks, so
    chunking cannot change the draws."""
    params, codes, spk = _setup(T_lat=8)
    key = jax.random.PRNGKey(9)
    full = decode_from_codes(params, CFG, codes, spk, key,
                             temperature=0.9)
    s = StreamingSynthesizer(params, CFG, spk, key, temperature=0.9)
    pieces = [s.push(codes[:, :4]), s.push(codes[:, 4:]), s.flush()]
    wav = jnp.concatenate(pieces, axis=1)
    assert wav.shape == full.shape
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(full))
    # different seeds produce different samples (not degenerate)
    s2 = StreamingSynthesizer(params, CFG, spk, jax.random.PRNGKey(10),
                              temperature=0.9)
    wav2 = jnp.concatenate([s2.push(codes), s2.flush()], axis=1)
    assert not np.array_equal(np.asarray(wav2), np.asarray(wav))


def test_lowmem_matches_one_shot_greedy():
    """Chunked-cond nested-scan generation == one-shot path exactly
    (greedy), including a T not divisible by the chunk."""
    from vqvae_tpu.infer.lowmem import decode_from_codes_lowmem
    params, codes, spk = _setup(T_lat=12)  # T=768, chunk=256 -> 3 chunks
    key = jax.random.PRNGKey(5)
    full = decode_from_codes(params, CFG, codes, spk, key, greedy=True)
    low = decode_from_codes_lowmem(params, CFG, codes, spk, key,
                                   greedy=True, chunk_samples=256)
    np.testing.assert_array_equal(np.asarray(low), np.asarray(full))
    # non-divisible: T=768 with chunk 512 -> padded final chunk
    low2 = decode_from_codes_lowmem(params, CFG, codes, spk, key,
                                    greedy=True, chunk_samples=512)
    np.testing.assert_array_equal(np.asarray(low2), np.asarray(full))


def test_lowmem_matches_one_shot_sampling():
    """Stochastic sampling is chunking-invariant too (fold_in keys)."""
    from vqvae_tpu.infer.lowmem import decode_from_codes_lowmem
    params, codes, spk = _setup(T_lat=12)
    key = jax.random.PRNGKey(6)
    full = decode_from_codes(params, CFG, codes, spk, key,
                             temperature=0.9)
    low = decode_from_codes_lowmem(params, CFG, codes, spk, key,
                                   temperature=0.9, chunk_samples=256)
    np.testing.assert_array_equal(np.asarray(low), np.asarray(full))
