"""Low-memory batched generation: never materialise the ``[B, T, d]``
upsampled condition.

At very large stream counts the AR scan's per-step cost is nearly flat
(docs/PERF.md), so throughput scales with B until HBM dies — and the
first thing to die is the audio-rate condition tensor (B=4096 ->
~17 GB). This path computes the condition chunk-by-chunk *inside* a
nested scan, using the exact-chunking identity from
infer/streaming.py:

  SAME-padded conv_transpose == VALID conv_transpose cropped hop/2
  per side, and the samples of chunk c (covering [cS, cS+S), h | S)
  depend only on latent frames [cS/h - 1, cS/h + S/h] — so with one
  zero frame of left pad and one of right pad, every chunk reads a
  static-size frame window and takes a static sample window
  [3h/2, 3h/2 + S) of its local VALID output.

Bit-identical to the one-shot path under greedy decoding (tested).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from vqvae_tpu.audio.mu_law import mu_law_decode_jit
from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.models.wavenet import (
    decoder_step,
    global_cond,
    init_gen_state,
    make_gen_params,
)


@partial(jax.jit, static_argnames=("cfg", "greedy", "chunk_samples"))
def generate_ids_lowmem(params: Dict, cfg: ModelConfig,
                        codes: jax.Array, speaker: jax.Array,
                        key: jax.Array, temperature: float = 1.0,
                        greedy: bool = False,
                        chunk_samples: int = 1024) -> jax.Array:
    """codes ``[B, T_lat]`` -> sampled ids ``[B, T_lat*hop]`` without
    ever holding the full audio-rate condition in memory."""
    h = cfg.hop
    S = chunk_samples
    assert S % h == 0, (S, h)
    # The static chunk window [3h/2, 3h/2+S) below is derived for a
    # transposed-conv kernel of exactly 2*hop (SAME crop = hop/2 per
    # side, one frame of halo each way); other kernel sizes would read
    # the wrong window and silently corrupt audio.
    assert cfg.upsample_kernel_mult == 2, cfg.upsample_kernel_mult
    B, T_lat = codes.shape
    T = T_lat * h
    n_chunks = -(-T // S)
    # pad latent frames so every chunk's window is static-size
    Fw = S // h + 2
    e = params["vq"]["codebook"][codes].astype(cfg.cdtype)  # [B,Tl,d]
    pad_right = 1 + (n_chunks * S - T) // h
    e_pad = jnp.pad(e, ((0, 0), (1, pad_right), (0, 0)))

    dec = params["decoder"]
    up_w = dec["upsample"]["w"].astype(cfg.cdtype)
    up_b = dec["upsample"]["b"].astype(cfg.cdtype)
    gp = make_gen_params(dec, cfg)
    gcond = global_cond(dec, cfg, speaker)
    state = init_gen_state(cfg, B)
    x0 = jnp.full((B,), cfg.mu // 2, jnp.int32)

    def cond_chunk(c):
        frames = lax.dynamic_slice_in_dim(e_pad, c * (S // h), Fw, 1)
        v = lax.conv_transpose(frames, up_w, strides=(h,),
                               padding="VALID",
                               dimension_numbers=("NHC", "HIO", "NHC"))
        return v[:, 3 * h // 2: 3 * h // 2 + S] + up_b   # [B, S, d]

    def outer(carry, c):
        state, x_t = carry
        cond = cond_chunk(c)

        def inner(ic, c_t):
            state, x_t = ic
            t = state.t
            state, logits = decoder_step(gp, cfg, state, x_t, c_t,
                                         gcond)
            if greedy:
                x = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                # fold_in(key, t): identical draws to the one-shot and
                # streaming paths at every global step t
                x = jax.random.categorical(
                    jax.random.fold_in(key, t),
                    logits / temperature).astype(jnp.int32)
            return (state, x), x

        (state, x_t), ids = lax.scan(
            inner, (state, x_t), jnp.swapaxes(cond, 0, 1))
        return (state, x_t), jnp.swapaxes(ids, 0, 1)

    (_, _), ids = lax.scan(outer, (state, x0), jnp.arange(n_chunks))
    # ids: [n_chunks, B, S] -> [B, T]
    ids = jnp.swapaxes(ids, 0, 1).reshape(B, n_chunks * S)
    return ids[:, :T]


def decode_from_codes_lowmem(params: Dict, cfg: ModelConfig,
                             codes: jax.Array, speaker: jax.Array,
                             key: jax.Array, temperature: float = 1.0,
                             greedy: bool = False,
                             chunk_samples: int = 1024) -> jax.Array:
    ids = generate_ids_lowmem(params, cfg, codes, speaker, key,
                              temperature, greedy, chunk_samples)
    return mu_law_decode_jit(ids, cfg.mu, mode=cfg.mulaw_mode)
