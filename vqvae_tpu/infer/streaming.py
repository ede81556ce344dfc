"""Constant-memory streaming synthesis (SURVEY.md §5.7: the reference
streams with O(1) queue state and arbitrary output length).

``StreamingSynthesizer`` decodes VQ codes chunk-by-chunk: device state
is the fixed-size ring-buffer GenState plus an ``hop``-sample
overlap-add carry for the transposed-conv upsampler — memory is
constant in total output length.

Exactness: the full-sequence upsampler is a stride-``hop`` transposed
conv with 'SAME' padding, which equals the 'VALID' transposed conv
cropped by ``hop//2`` on each side.  'VALID' conv_transpose is linear
and shift-invariant, so chunks compose by overlap-adding the trailing
``hop`` samples; the conv bias is added once at emit time.  Per-step
PRNG keys are ``fold_in(key, t)`` with the global step ``t`` carried in
GenState, so streaming output — greedy AND sampled — is bit-identical
to the one-shot path (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from vqvae_tpu.audio.mu_law import mu_law_decode_jit
from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.models.wavenet import (
    GenState,
    decoder_step,
    global_cond,
    init_gen_state,
    make_gen_params,
)


@partial(jax.jit, static_argnames=("cfg", "greedy"))
def _stream_chunk(gp, cfg: ModelConfig, state: GenState, x_t, key,
                  cond_chunk, gcond, temperature=1.0,
                  greedy: bool = False):
    """Advance the decoder over one cond chunk, carrying state.
    Returns the sampled ids; callers decode them through the SHARED
    ``mu_law_decode_jit`` so streaming output is bit-identical to the
    one-shot engines (fusing the decode into this scan measured a
    1-ulp drift vs the one-shot path)."""

    def step(carry, c_t):
        state, x_t = carry
        t = state.t  # global step, carried across push() boundaries
        state, logits = decoder_step(gp, cfg, state, x_t, c_t, gcond)
        if greedy:
            x = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            # fold_in(key, t) makes sampling chunking-invariant:
            # streaming draws are bit-identical to the one-shot path
            x = jax.random.categorical(
                jax.random.fold_in(key, t),
                logits / temperature).astype(jnp.int32)
        return (state, x), x

    (state, x_t), ids = lax.scan(
        step, (state, x_t), jnp.swapaxes(cond_chunk, 0, 1))
    return state, x_t, jnp.swapaxes(ids, 0, 1)


@partial(jax.jit, static_argnames=("cfg",))
def _prepare(dec, cfg: ModelConfig, speaker):
    """Gen-param/global-cond construction as ONE dispatch (eagerly it
    is dozens of tiny ops — each a host round trip on a tunneled
    device, which dominates per-request latency in serving)."""
    return (make_gen_params(dec, cfg),
            global_cond(dec, cfg, speaker))


@partial(jax.jit, static_argnames=("cfg", "first", "has_carry"))
def _upsample_chunk_jit(up_w, up_b, codebook, codes, carry,
                        cfg: ModelConfig, first: bool,
                        has_carry: bool):
    """VALID transposed conv + overlap-add, one dispatch per push.
    ``has_carry`` is separate from ``first``: a push after ``flush``
    is non-first yet carry-less."""
    hop = cfg.hop
    e = codebook[codes].astype(cfg.cdtype)               # [B, C, d]
    v = lax.conv_transpose(
        e, up_w, strides=(hop,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))         # [B,(C+1)h,d]
    C = codes.shape[1]
    if has_carry:
        v = v.at[:, :hop].add(carry)
    new_carry = v[:, C * hop:]
    out = v[:, :C * hop]
    if first:
        out = out[:, hop // 2:]
    return out + up_b, new_carry


class CondUpsampler:
    """Chunked exact local-condition upsampling: push code frames,
    get the cond samples each chunk finalizes — bit-identical to the
    one-shot ``upsample_cond`` (the overlap-add exactness contract in
    the module docstring).  Shared by the XLA-scan synthesizer below
    and the resumable-Pallas serving decoder (infer/pallas_stream)."""

    def __init__(self, params: Dict, cfg: ModelConfig):
        # the overlap-add carry is one hop and the SAME crop is hop/2
        # per side only for a kernel of exactly 2*hop
        assert cfg.upsample_kernel_mult == 2, cfg.upsample_kernel_mult
        self.cfg = cfg
        self.codebook = params["vq"]["codebook"]
        self.up_w = params["decoder"]["upsample"]["w"].astype(cfg.cdtype)
        self.up_b = params["decoder"]["upsample"]["b"].astype(cfg.cdtype)
        self._carry: Optional[jax.Array] = None   # [B, hop, d]
        self._first = True

    def reset(self) -> None:
        """Back to stream start (a new request on a reused instance)."""
        self._carry, self._first = None, True

    def push(self, codes: jax.Array) -> jax.Array:
        """VALID transposed conv + overlap-add; returns the cond samples
        finalized by this chunk (C*hop, minus hop//2 on the first)."""
        has_carry = self._carry is not None
        carry = (self._carry if has_carry
                 else self.up_w[:1])  # unread dummy (traced-out)
        out, self._carry = _upsample_chunk_jit(
            self.up_w, self.up_b, self.codebook, codes, carry,
            self.cfg, self._first, has_carry)
        self._first = False
        return out

    def flush(self) -> jax.Array:
        """The final ``hop - hop//2`` cond samples (the SAME-crop tail)."""
        hop = self.cfg.hop
        assert self._carry is not None, "flush before any push"
        cond = self._carry[:, :hop - hop // 2] + self.up_b
        self._carry = None
        return cond


class StreamingSynthesizer:
    """Push VQ code frames, pull waveform — constant device memory.

    >>> s = StreamingSynthesizer(params, cfg, speaker, key)
    >>> wav_pieces = [s.push(codes_chunk) for codes_chunk in chunks]
    >>> wav_pieces.append(s.flush())
    """

    def __init__(self, params: Dict, cfg: ModelConfig,
                 speaker: jax.Array, key: jax.Array,
                 temperature: float = 1.0, greedy: bool = False):
        self.cfg = cfg
        self.gp, self.gcond = _prepare(params["decoder"], cfg, speaker)
        self._ups = CondUpsampler(params, cfg)
        self.temperature = temperature
        self.greedy = greedy
        self.key = key
        B = speaker.shape[0]
        self.state = init_gen_state(cfg, B)
        self.x_t = jnp.full((B,), cfg.mu // 2, jnp.int32)

    def push(self, codes: jax.Array) -> jax.Array:
        """codes ``[B, C]`` -> waveform ``[B, ~C*hop]`` float32."""
        cond = self._ups.push(codes)
        self.state, self.x_t, ids = _stream_chunk(
            self.gp, self.cfg, self.state, self.x_t, self.key, cond,
            self.gcond, self.temperature, self.greedy)
        return mu_law_decode_jit(ids, self.cfg.mu,
                                 mode=self.cfg.mulaw_mode)

    def flush(self) -> jax.Array:
        """Emit the final ``hop - hop//2`` samples (the SAME-crop tail)."""
        cond = self._ups.flush()
        self.state, self.x_t, ids = _stream_chunk(
            self.gp, self.cfg, self.state, self.x_t, self.key, cond,
            self.gcond, self.temperature, self.greedy)
        return mu_law_decode_jit(ids, self.cfg.mu,
                                 mode=self.cfg.mulaw_mode)
