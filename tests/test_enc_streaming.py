"""StreamingEncoder exactness: chunked encode == one-shot encode of the
whole stream, for every chunking, batch shape, stream length, and
mu-law mode (infer/enc_streaming.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.audio.mu_law import mu_law_decode, mu_law_encode
from vqvae_tpu.configs import get_config
from vqvae_tpu.infer.enc_streaming import StreamingEncoder, _support
from vqvae_tpu.infer.fastgen import encode_to_codes
from vqvae_tpu.models.vqvae import init_model


@pytest.fixture(scope="module")
def setup():
    """Model params with NONZERO encoder biases: zero-bias init is the
    one regime where zero input samples and per-layer SAME padding
    coincide (relu(conv(0) + 0) == 0), which would mask any
    stream-boundary padding bug — a trained model always has b != 0,
    and with it the flush window must end exactly at the stream end
    (infer/enc_streaming.py::_encode final=True)."""
    cfg = get_config("tiny").model
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(42)
    enc = params["encoder"]
    for layer in enc["layers"] + [enc["proj"]]:
        layer["b"] = jnp.asarray(rng.normal(0.0, 0.5, layer["b"].shape),
                                 layer["b"].dtype)
    return params, cfg


def one_shot(params, cfg, wav):
    """The encode-CLI / synthesize front half: hop-trim, mu-law
    round-trip (the shared jitted helper, as the product paths use),
    encode."""
    from vqvae_tpu.audio.mu_law import mu_law_round_trip_jit
    T = wav.shape[1] - wav.shape[1] % cfg.hop
    x = mu_law_round_trip_jit(jnp.asarray(wav[:, :T]), cfg.mu,
                              cfg.mulaw_mode)
    return np.asarray(encode_to_codes(params, cfg, x))


def stream(params, cfg, wav, sizes):
    enc = StreamingEncoder(params, cfg)
    pieces, i = [], 0
    while i < wav.shape[1]:
        n = sizes[len(pieces) % len(sizes)]
        pieces.append(enc.push(wav[:, i:i + n]))
        i += n
    pieces.append(enc.flush())
    return np.concatenate(pieces, axis=1)


def test_support_matches_brute_force(setup):
    """(A, B) from the layer recurrence == the measured receptive
    field: perturbing any sample inside [n*hop-A, n*hop+B] can move
    z_e[n]; no sample outside it ever does."""
    params, cfg = setup
    from vqvae_tpu.models.encoder import apply_encoder
    A, B = _support(cfg)
    H = cfg.hop
    T, n = 6 * H, 3
    rng = np.random.default_rng(0)
    base = rng.standard_normal((1, T)).astype(np.float32) * 0.3
    z0 = np.asarray(apply_encoder(params["encoder"], cfg,
                                  jnp.asarray(base)))[0, n]
    lo, hi = n * H - A, n * H + B
    for t in (lo - 1, hi + 1):
        x = base.copy()
        x[0, t] += 1.0
        z = np.asarray(apply_encoder(params["encoder"], cfg,
                                     jnp.asarray(x)))[0, n]
        np.testing.assert_array_equal(z, z0)
    hit = 0
    for t in (lo, n * H, hi):
        x = base.copy()
        x[0, t] += 1.0
        z = np.asarray(apply_encoder(params["encoder"], cfg,
                                     jnp.asarray(x)))[0, n]
        hit += int(not np.array_equal(z, z0))
    assert hit == 3  # the bound is tight on both edges


@pytest.mark.parametrize("sizes", [[37], [1000], [64], [13, 200, 1],
                                   [4096]])
def test_chunked_equals_one_shot(setup, sizes):
    params, cfg = setup
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((2, 9 * cfg.hop + 17)) * 0.3
           ).astype(np.float32).clip(-1, 1)
    np.testing.assert_array_equal(stream(params, cfg, wav, sizes),
                                  one_shot(params, cfg, wav))


def test_short_stream_all_in_flush(setup):
    """A stream shorter than the lookahead emits everything at flush."""
    params, cfg = setup
    rng = np.random.default_rng(2)
    _, B = _support(cfg)
    wav = (rng.standard_normal((1, min(B, 2 * cfg.hop))) * 0.3
           ).astype(np.float32).clip(-1, 1)
    enc = StreamingEncoder(params, cfg)
    mid = enc.push(wav)
    assert mid.shape[1] == 0  # stream <= lookahead: push holds all
    out = np.concatenate([mid, enc.flush()], axis=1)
    np.testing.assert_array_equal(out, one_shot(params, cfg, wav))


def test_reuse_after_flush_and_chainer_mode(setup):
    import dataclasses
    params, cfg = setup
    cfg_ch = dataclasses.replace(cfg, mulaw_mode="chainer")
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((1, 5 * cfg.hop)) * 0.3
           ).astype(np.float32).clip(-1, 1)
    enc = StreamingEncoder(params, cfg_ch)
    a = np.concatenate([enc.push(wav), enc.flush()], axis=1)
    b = np.concatenate([enc.push(wav), enc.flush()], axis=1)  # reused
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, one_shot(params, cfg_ch, wav))


def test_whole_request_single_push(setup):
    """The serving daemon's pattern: the WHOLE request as one push +
    flush.  Streams long enough to cross the power-of-two window
    bucketing (width > 1024: _encode pads the window right with zeros
    no emitted frame's support reaches) must still be bit-exact."""
    params, cfg = setup
    rng = np.random.default_rng(7)
    for T in (40 * cfg.hop, 77 * cfg.hop + 31, 130 * cfg.hop + 1):
        wav = (rng.standard_normal((1, T)) * 0.3
               ).astype(np.float32).clip(-1, 1)
        np.testing.assert_array_equal(
            stream(params, cfg, wav, [T]), one_shot(params, cfg, wav))
