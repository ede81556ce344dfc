"""Fast autoregressive synthesis, TPU-resident
(reference: ``net.py :: Decoder.initialize/generate`` + the per-sample
Python loop in ``generate.py`` — SURVEY.md §3.2).

The reference pops/pushes per-layer queues from Python, paying a
host<->device round trip per sample.  Here the whole loop is ONE
``lax.scan`` compiled into the same XLA program as the sampling: the
carry is the constant-size ring-buffer state (models/wavenet.GenState)
plus the PRNG key; the scanned inputs are the time-major local-condition
frames.  Generation therefore never leaves the device (BASELINE north
star), and batched streams amortise the MXU work.

Exactness: ``decoder_step`` shares weights and op order with the
teacher-forced decoder, so scan generation == teacher forcing when fed
the same history (the §4.2a parity oracle; tested in
tests/test_fastgen.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vqvae_tpu.audio.mu_law import (
    mu_law_decode_jit,
    mu_law_round_trip_jit,
)
from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.models.encoder import apply_encoder
from vqvae_tpu.models.vq import nearest_code
from vqvae_tpu.models.wavenet import (
    decoder_step,
    global_cond,
    init_gen_state,
    make_gen_params,
    upsample_cond,
)


def generate_ids(params: Dict, cfg: ModelConfig, cond: jax.Array,
                 speaker: jax.Array, key: jax.Array,
                 temperature: float = 1.0, greedy: bool = False,
                 impl: str = "lax") -> jax.Array:
    """Sample ``[B, T]`` mu-law ids given local condition ``[B, T, d]``.

    impl='lax': one fused scan over T steps (O(1) state per step,
    Fast-WaveNet).  impl='pallas': the whole loop in a single fused
    kernel (kernels/decode_pallas) with weights and ring buffers pinned
    in VMEM; sampling uses the in-kernel TPU PRNG (Gumbel-max), so the
    JAX `key` is reduced to a seed.
    """
    if impl == "pallas":
        from vqvae_tpu.kernels.decode_pallas import generate_ids_pallas
        dec = params["decoder"]
        gp = make_gen_params(dec, cfg)
        gcond = global_cond(dec, cfg, speaker)
        seed = jax.random.randint(key, (), 0, 2 ** 31 - 1)
        return generate_ids_pallas(gp, cfg, cond, gcond, seed,
                                   jnp.float32(temperature), greedy)
    return _generate_ids_scan(params, cfg, cond, speaker, key,
                              temperature, greedy)


@partial(jax.jit, static_argnames=("cfg", "greedy"))
def _generate_ids_scan(params: Dict, cfg: ModelConfig, cond: jax.Array,
                       speaker: jax.Array, key: jax.Array,
                       temperature: float = 1.0, greedy: bool = False
                       ) -> jax.Array:
    B, T, _ = cond.shape
    dec = params["decoder"]
    gp = make_gen_params(dec, cfg)
    gcond = global_cond(dec, cfg, speaker)              # [L, B, 2R]
    state = init_gen_state(cfg, B)
    # seed with digital silence (the id that decodes closest to 0)
    x0 = jnp.full((B,), int(cfg.mu // 2), jnp.int32)

    def step(carry, c_t):
        state, x_t = carry
        t = state.t  # global step BEFORE this sample is emitted
        state, logits = decoder_step(gp, cfg, state, x_t, c_t, gcond)
        if greedy:
            x_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            # per-step key is a pure function of (key, t) so sampling is
            # chunking-invariant: one-shot, lowmem, and streaming all
            # draw identical samples (SURVEY.md §5.7)
            x_next = jax.random.categorical(
                jax.random.fold_in(key, t),
                logits / temperature).astype(jnp.int32)
        return (state, x_next), x_next

    cond_tm = jnp.swapaxes(cond, 0, 1)                  # [T, B, d]
    (_, _), ids = jax.lax.scan(step, (state, x0), cond_tm)
    return jnp.swapaxes(ids, 0, 1)                      # [B, T]


@partial(jax.jit, static_argnames=("cfg",))
def teacher_forced_scan_logits(params: Dict, cfg: ModelConfig,
                               ids_in: jax.Array, cond: jax.Array,
                               speaker: jax.Array) -> jax.Array:
    """Run the generation step with *given* inputs, returning logits
    ``[B, T, mu]`` — must equal ``apply_decoder`` exactly (parity
    oracle, SURVEY.md §4.2a)."""
    B, T = ids_in.shape
    dec = params["decoder"]
    gp = make_gen_params(dec, cfg)
    gcond = global_cond(dec, cfg, speaker)
    state = init_gen_state(cfg, B)

    def step(state, xs):
        x_t, c_t = xs
        state, logits = decoder_step(gp, cfg, state, x_t, c_t, gcond)
        return state, logits

    xs = (jnp.swapaxes(ids_in, 0, 1), jnp.swapaxes(cond, 0, 1))
    _, logits = jax.lax.scan(step, state, xs)
    return jnp.swapaxes(logits, 0, 1)


def _encode_to_codes(params: Dict, cfg: ModelConfig, wav: jax.Array
                     ) -> jax.Array:
    z = apply_encoder(params["encoder"], cfg, wav)
    return nearest_code(z, params["vq"]["codebook"].astype(z.dtype))


# Waveform ``[B, T]`` -> code ids ``[B, T/hop]`` ('encode' CLI).
# Jitted at definition so EVERY encode path (one-shot CLIs,
# synthesize, the streaming encoder's windows) runs the SAME compiled
# program: jit can fuse the conv/argmin chain differently from eager
# per-op dispatch, and a 1-ulp z drift near a codebook distance tie
# would flip an emitted id, breaking the streaming-encode exactness
# contract. One program also means one dispatch per call instead of a
# host round trip per op on a tunneled device.
encode_to_codes = jax.jit(_encode_to_codes, static_argnames="cfg")


def decode_from_codes(params: Dict, cfg: ModelConfig, codes: jax.Array,
                      speaker: jax.Array, key: jax.Array,
                      temperature: float = 1.0, greedy: bool = False,
                      impl: str = "lax") -> jax.Array:
    """Code ids ``[B, T_lat]`` -> float waveform ``[B, T_lat*hop]``
    ('decode' CLI; also the back half of 'generate')."""
    if impl == "lowmem":
        from vqvae_tpu.infer.lowmem import generate_ids_lowmem
        ids = generate_ids_lowmem(params, cfg, codes, speaker, key,
                                  temperature, greedy)
    else:
        e = params["vq"]["codebook"][codes]              # [B, T_lat, d]
        cond = upsample_cond(params["decoder"], cfg, e)
        ids = generate_ids(params, cfg, cond, speaker, key,
                           temperature, greedy, impl)
    # the SHARED jitted decode: bit-identical across one-shot and
    # streaming engines (audio/mu_law.py::mu_law_decode_jit)
    return mu_law_decode_jit(ids, cfg.mu, mode=cfg.mulaw_mode)


def synthesize(params: Dict, cfg: ModelConfig, wav: jax.Array,
               speaker: jax.Array, key: jax.Array,
               temperature: float = 1.0, greedy: bool = False,
               impl: str = "lax") -> Tuple[jax.Array, jax.Array]:
    """Full reference 'generate' pipeline: waveform -> codes -> waveform.

    Returns (reconstructed wav ``[B, T']``, codes ``[B, T'/hop]``) where
    T' = T rounded down to a multiple of the encoder hop.
    """
    T = wav.shape[1] - (wav.shape[1] % cfg.hop)
    wav = mu_law_round_trip_jit(wav[:, :T], cfg.mu, cfg.mulaw_mode)
    codes = encode_to_codes(params, cfg, wav)
    out = decode_from_codes(params, cfg, codes, speaker, key,
                            temperature, greedy, impl)
    return out, codes
