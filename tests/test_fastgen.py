"""Fast-generation parity oracle (SURVEY.md §4.2a): the ring-buffer scan
must reproduce teacher-forced decoder logits exactly — any mismatch is an
off-by-one in causal padding, queue slots, or condition alignment."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.configs import get_config
from vqvae_tpu.infer.fastgen import (
    decode_from_codes,
    encode_to_codes,
    generate_ids,
    synthesize,
    teacher_forced_scan_logits,
)
from vqvae_tpu.models import init_model
from vqvae_tpu.models.wavenet import apply_decoder, upsample_cond

CFG = get_config("tiny").model


def _setup(T=256, B=2, seed=0):
    params = init_model(jax.random.PRNGKey(seed), CFG)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    ids = jax.random.randint(k1, (B, T), 0, CFG.mu)
    e = jax.random.normal(k2, (B, T // CFG.hop, CFG.d))
    cond = upsample_cond(params["decoder"], CFG, e)
    spk = jnp.arange(B) % CFG.n_speakers
    return params, ids, cond, spk, k3


def test_scan_matches_teacher_forcing():
    params, ids, cond, spk, _ = _setup()
    ref = apply_decoder(params["decoder"], CFG, ids, cond, spk)
    fast = teacher_forced_scan_logits(params, CFG, ids, cond, spk)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_scan_matches_teacher_forcing_long_dilation():
    # T spanning several multiples of the max dilation wraps every ring
    # buffer several times
    params, ids, cond, spk, _ = _setup(T=4 * 512)
    ref = apply_decoder(params["decoder"], CFG, ids, cond, spk)
    fast = teacher_forced_scan_logits(params, CFG, ids, cond, spk)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_generate_ids_shape_and_range():
    params, _, cond, spk, key = _setup(T=128)
    ids = generate_ids(params, CFG, cond, spk, key)
    assert ids.shape == (2, 128)
    assert int(ids.min()) >= 0 and int(ids.max()) < CFG.mu


def test_generate_greedy_deterministic():
    params, _, cond, spk, key = _setup(T=64)
    a = generate_ids(params, CFG, cond, spk, key, greedy=True)
    b = generate_ids(params, CFG, cond, spk,
                     jax.random.PRNGKey(999), greedy=True)
    assert jnp.array_equal(a, b)  # greedy ignores the key


def test_encode_decode_round_trip_shapes():
    params, _, _, spk, key = _setup()
    B, T = 2, 512
    wav = jax.random.uniform(jax.random.PRNGKey(5), (B, T),
                             minval=-1, maxval=1)
    codes = encode_to_codes(params, CFG, wav)
    assert codes.shape == (B, T // CFG.hop)
    assert int(codes.max()) < CFG.K and int(codes.min()) >= 0
    out = decode_from_codes(params, CFG, codes, spk, key)
    assert out.shape == (B, T)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_synthesize_full_pipeline():
    params, _, _, spk, key = _setup()
    # odd length: synthesize must crop to a hop multiple
    wav = jax.random.uniform(jax.random.PRNGKey(6), (2, 300),
                             minval=-1, maxval=1)
    out, codes = synthesize(params, CFG, wav, spk, key)
    T = 300 - (300 % CFG.hop)
    assert out.shape == (2, T)
    assert codes.shape == (2, T // CFG.hop)
    assert bool(jnp.all(jnp.isfinite(out)))
