"""Serving decode at fused-kernel speed (the daemon's fast engine).

The XLA-scan streaming path (infer/streaming) dispatches one compiled
program per cond chunk whose per-step cost is the scan body (~4x the
fused kernel's step at B=1); the one-shot Pallas kernel
(kernels/decode_pallas) runs at kernel speed but compiles per cond
LENGTH — useless for a warm daemon that must answer any request
length.  ``PallasStreamDecoder`` closes the gap with the RESUMABLE
kernel: one compiled program of a fixed ``kernel_frames*hop``-sample
width is pushed repeatedly, ring-buffer state carried between calls,
final ragged slice zero-padded and trimmed exactly as the one-shot
kernel pads internally.

The decoder is built ONCE and reused across requests: weight
repacking (``make_gen_params``) and the upsampler's dtype casts run
at construction, while per-request quantities — speaker, PRNG key,
temperature — are runtime arguments of ``decode`` (traced inputs of
already-compiled programs, so a request costs pushes + two small
dispatches, never a recompile or a weight copy).

Exactness: output is BIT-IDENTICAL to the one-shot pallas engine
(``infer.fastgen.decode_from_codes(impl='pallas')``) at equal seed —
the cond stream comes from the shared chunked ``CondUpsampler``
(== one-shot ``upsample_cond``), the kernel's PRNG stream is indexed
by absolute chunk number, and the mu-law decode is elementwise so
per-push decode composes.  Pinned in tests/test_pallas_stream.py.

Note the one-shot SAMPLED stream differs from the XLA engines' (the
kernel draws in-kernel Gumbel-max noise, not ``fold_in(key, t)``
categoricals) — both are valid samplers.  Greedy agrees across
engines in exact arithmetic only; on hardware the kernel's bf16
logits can flip argmax at near-ties (BENCH engine_agreement), so
the guarantee users should rely on is SAME-engine determinism.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.mu_law import mu_law_decode_jit
from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.infer.streaming import CondUpsampler
from vqvae_tpu.kernels.decode_pallas import (
    CHUNK,
    generate_ids_pallas_resume,
    init_decode_state,
)
from vqvae_tpu.models.wavenet import global_cond, make_gen_params

_init_state = jax.jit(init_decode_state,
                      static_argnums=(0, 1, 2))  # one dispatch, cached
_make_gp = jax.jit(make_gen_params, static_argnames=("cfg",))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _request_prep(dec, cfg: ModelConfig, speaker, key):
    """Per-request conditioning + seed in ONE dispatch.  The seed
    derivation matches the one-shot pallas engine
    (infer/fastgen.generate_ids), so equal keys -> equal audio."""
    return (global_cond(dec, cfg, speaker),
            jax.random.randint(key, (), 0, 2 ** 31 - 1))


class PallasStreamDecoder:
    """Decode full code-id requests through fixed-width resumable
    kernel pushes — any request length runs warm through ONE compiled
    decode program (plus the shared upsampler's fixed set).  Build
    once, ``decode`` per request."""

    def __init__(self, params: Dict, cfg: ModelConfig,
                 greedy: bool = False, chunk: int = 16,
                 kernel_frames: int | None = None):
        # chunk sizes the UPSAMPLER pushes (small keeps the ragged
        # 1-frame tail cheap); kernel_frames sizes the KERNEL pushes.
        # None = auto: 64 frames on TPU — the measured-best width
        # (docs/SERVING.md sweep: 16/32/64/128/250 frames -> 548/525/
        # 404/559/576 ms for a 1 s request; mid-size pushes pipeline
        # host slicing against device compute, one huge push cannot) —
        # rounded up so spc lands on the kernel grid; elsewhere =
        # chunk, keeping interpret-mode pushes short.
        if kernel_frames is None:
            if jax.default_backend() == "tpu":
                import math
                m = CHUNK // math.gcd(cfg.hop, CHUNK)
                kernel_frames = -(-max(chunk, 64) // m) * m
            else:
                kernel_frames = chunk
        spc = kernel_frames * cfg.hop   # samples per kernel call
        if spc % CHUNK != 0:
            raise ValueError(
                f"kernel_frames*hop={spc} must be a multiple of the "
                f"kernel grid step {CHUNK}")
        self.cfg, self.chunk, self.spc = cfg, chunk, spc
        self.greedy = greedy
        self._dec = params["decoder"]
        self.gp = _make_gp(self._dec, cfg)        # repack weights ONCE
        self._ups = CondUpsampler(params, cfg)    # dtype casts ONCE

    def _cond(self, codes: np.ndarray) -> np.ndarray:
        """Full-request cond ``[B, n*hop, d]`` from fixed-shape
        upsampler pushes (host-side slicing: eager device slices would
        compile one program per offset — see cli/serve.Codec)."""
        C, n = self.chunk, codes.shape[1]
        self._ups.reset()               # fresh stream per request
        steady = n - n % C
        pieces = []
        for i in range(0, steady, C):
            pieces.append(self._ups.push(jnp.asarray(codes[:, i:i + C])))
        for i in range(steady, n):      # ragged tail: 1-frame pushes
            pieces.append(self._ups.push(jnp.asarray(codes[:, i:i + 1])))
        pieces.append(self._ups.flush())
        return np.concatenate(jax.device_get(pieces), axis=1)

    def decode(self, codes: np.ndarray, speaker: jax.Array,
               key: jax.Array, temperature: float = 1.0) -> np.ndarray:
        """codes ``[B, n]`` int32, speaker ``[B]`` -> ``[B, n*hop]``
        float32 waveform."""
        codes = np.asarray(codes, np.int32)
        if codes.ndim != 2 or codes.shape[0] != speaker.shape[0]:
            raise ValueError("codes must be [B, n] with B matching "
                             f"speaker's {speaker.shape[0]}")
        gcond, seed = _request_prep(self._dec, self.cfg, speaker, key)
        temp = jnp.float32(temperature)
        cond = self._cond(codes)        # [B, T, d] compute dtype
        B, T, d = cond.shape
        pad = (-T) % self.spc
        if pad:
            cond = np.concatenate(
                [cond, np.zeros((B, pad, d), cond.dtype)], axis=1)
        state = _init_state(self.cfg, B, self.gp.wff.dtype)
        wav_pieces = []
        for i in range(0, T + pad, self.spc):
            ids, state = generate_ids_pallas_resume(
                self.gp, self.cfg, jnp.asarray(cond[:, i:i + self.spc]),
                gcond, seed, temp, state, greedy=self.greedy)
            # elementwise, so per-push decode == one-shot decode
            wav_pieces.append(mu_law_decode_jit(
                ids, self.cfg.mu, mode=self.cfg.mulaw_mode))
        return np.concatenate(jax.device_get(wav_pieces), axis=1)[:, :T]

    def session(self, speaker: jax.Array, key: jax.Array,
                temperature: float = 1.0) -> "PallasStreamSession":
        """An incremental decode session sharing this decoder's packed
        weights — the daemon's live full-duplex path."""
        return PallasStreamSession(self, speaker, key, temperature)


class PallasStreamSession:
    """Incremental decode over the resumable kernel: ``push`` code
    frames of ANY size as they arrive, pull the waveform each push
    finalizes; ``close`` flushes the tail.  The concatenated session
    output is BIT-IDENTICAL to ``PallasStreamDecoder.decode`` of the
    concatenated codes at equal (speaker, key, temperature) and equal
    ``kernel_frames`` — greedy AND sampled — because the cond stream
    composes exactly under any slicing (CondUpsampler's overlap-add
    contract: each output sample overlaps exactly two code frames, so
    the add order is slicing-invariant), the kernel only ever consumes
    full ``spc``-sample slices of REAL cond mid-stream, the close pads
    with zeros and trims exactly as the one-shot path pads internally,
    and the kernel PRNG is indexed by absolute chunk number.  Pinned in
    tests/test_pallas_stream.py.

    Weights live in the parent decoder (built once per daemon); a
    session holds only its ring-buffer state, the upsampler carry, and
    a < ``spc``-sample cond remainder — O(1) memory in stream length.
    Audio becomes available once ``spc = kernel_frames*hop`` cond
    samples accumulate, so SMALL ``kernel_frames`` minimizes
    time-to-first-audio while large maximizes per-push throughput
    (docs/SERVING.md sweep)."""

    def __init__(self, dec: PallasStreamDecoder, speaker: jax.Array,
                 key: jax.Array, temperature: float = 1.0):
        self.dec = dec
        cfg = dec.cfg
        self.gcond, self.seed = _request_prep(dec._dec, cfg, speaker,
                                              key)
        self.temp = jnp.float32(temperature)
        B = int(speaker.shape[0])
        self.state = _init_state(cfg, B, dec.gp.wff.dtype)
        # a PRIVATE upsampler: the parent's is reset per decode request
        # and must not be shared by concurrent sessions
        self._ups = CondUpsampler({"vq": {"codebook": dec._ups.codebook},
                                   "decoder": {"upsample": {
                                       "w": dec._ups.up_w,
                                       "b": dec._ups.up_b}}}, cfg)
        self._buf = np.zeros((B, 0, cfg.d),
                             jax.device_get(self._ups.up_b).dtype)
        self._closed = False

    def _push_cond(self, codes: np.ndarray) -> None:
        """Feed codes through the upsampler in C/1-frame slices (the
        request path's fixed compiled-shape set) into the cond buffer."""
        C, n = self.dec.chunk, codes.shape[1]
        pieces = []
        steady = n - n % C
        for i in range(0, steady, C):
            pieces.append(self._ups.push(jnp.asarray(codes[:, i:i + C])))
        for i in range(steady, n):
            pieces.append(self._ups.push(jnp.asarray(codes[:, i:i + 1])))
        if pieces:
            self._buf = np.concatenate(
                [self._buf] + list(jax.device_get(pieces)), axis=1)

    def _drain(self, final: bool) -> np.ndarray:
        """Run the kernel over every complete ``spc`` cond slice (all
        of them, zero-padded and trimmed, when ``final``)."""
        spc, cfg = self.dec.spc, self.dec.cfg
        B, T, d = self._buf.shape
        take = T if final else T - T % spc
        if take == 0:   # nothing to run (mid-stream slice still
            return np.zeros((B, 0), np.float32)  # filling, or an
            # empty-stream close)
        cond, self._buf = self._buf[:, :take], self._buf[:, take:]
        pad = (-take) % spc
        if pad:
            cond = np.concatenate(
                [cond, np.zeros((B, pad, d), cond.dtype)], axis=1)
        wav_pieces = []
        for i in range(0, take + pad, spc):
            ids, self.state = generate_ids_pallas_resume(
                self.dec.gp, cfg, jnp.asarray(cond[:, i:i + spc]),
                self.gcond, self.seed, self.temp, self.state,
                greedy=self.dec.greedy)
            wav_pieces.append(mu_law_decode_jit(
                ids, cfg.mu, mode=cfg.mulaw_mode))
        return np.concatenate(jax.device_get(wav_pieces),
                              axis=1)[:, :take]

    def push(self, codes: np.ndarray) -> np.ndarray:
        """codes ``[B, n]`` -> the newly finalized ``[B, m]`` waveform
        (m may be 0 while a kernel slice fills)."""
        if self._closed:
            raise ValueError("session is closed")
        codes = np.asarray(codes, np.int32)
        if codes.ndim != 2:
            raise ValueError("codes must be [B, n]")
        self._push_cond(codes)
        return self._drain(final=False)

    def close(self) -> np.ndarray:
        """Flush the upsampler tail + cond remainder; the session is
        then unusable."""
        if self._closed:
            raise ValueError("session is closed")
        self._closed = True
        if not self._ups._first:      # flush needs at least one push
            self._buf = np.concatenate(
                [self._buf, np.asarray(jax.device_get(
                    self._ups.flush()))], axis=1)
        return self._drain(final=True)
