"""Streaming (chunked) encoding — the live half of a full-duplex codec.

The reference encodes whole utterances only (``generate.py`` preprocesses
the complete file — SURVEY.md §3.2); its streaming story covers decode
alone (the fast-gen queues).  On TPU the encoder is a handful of strided
matmuls, so the interesting problem isn't throughput but *exactness
under chunking*: a live encoder must emit the same code ids the one-shot
encoder would, no matter how the audio is sliced.

The SAME-padded stride-``s`` kernel-``k`` stack gives latent frame ``n``
a finite support ``[n*hop - A, n*hop + B]`` computed exactly from the
layer geometry (``_support``): per layer an output range ``[lo, hi]``
reads inputs ``[lo*s - pad, hi*s + (k-1) - pad]`` with
``pad = (k - s)//2``.  ``StreamingEncoder`` buffers just enough context
(A on the left, carried; B lookahead on the right, awaited) and
re-encodes a frame-aligned window per push — window-edge padding cannot
reach an emitted frame's support, so emission is bit-exact vs the
one-shot path (tests/test_enc_streaming.py, including nonzero conv
biases — the regime where padding semantics actually matter, because
``relu(conv(0) + b) != 0`` makes zero INPUT samples and per-layer SAME
padding inequivalent).  Frames are additionally held back until their
support lies inside *completed* hop-multiples, so a stream ending
mid-frame drops exactly the samples the one-shot encoder's hop-trim
drops.  At ``flush`` the window ends EXACTLY at the stream end: the
held-back tail frames' supports are truncated by the stream boundary,
where the one-shot computation is defined by each conv layer's SAME
padding — ending the window at the same absolute sample reproduces
that padding bit-for-bit (zero-extending the raw input would not).

Device memory is O(window); host buffer is O(A + push + B) samples —
both constant in stream length.  The latency floor is ``lookahead``
samples (B ≈ 2*hop for the k=4 s=2 stack): a frame cannot finalize
before its future support arrives.  This mirrors the mu-law round-trip
the training/generation input path applies (elementwise, so it chunks
exactly).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.mu_law import mu_law_round_trip_jit
from vqvae_tpu.configs import ModelConfig
# encode_to_codes is jitted at definition: the windows here run the
# IDENTICAL compiled program as the one-shot encode paths, which is
# what makes the chunked emission bit-exact on real hardware
from vqvae_tpu.infer.fastgen import encode_to_codes


def _support(cfg: ModelConfig) -> Tuple[int, int]:
    """(A, B): latent frame n depends on samples [n*hop - A, n*hop + B]."""
    s, k = cfg.enc_stride, cfg.enc_kernel
    pad = (k - s) // 2
    lo = hi = 0
    for _ in range(cfg.enc_layers):
        lo = lo * s - pad
        hi = hi * s + (k - 1) - pad
    return -lo, hi


class StreamingEncoder:
    """Push waveform chunks ``[B, n]``, pull code ids ``[B, m]`` that
    are bit-identical to the one-shot encode of the whole stream.

    >>> enc = StreamingEncoder(params, cfg)
    >>> pieces = [enc.push(chunk) for chunk in chunks]
    >>> pieces.append(enc.flush())
    >>> np.concatenate(pieces, axis=1)  # == one-shot codes
    """

    def __init__(self, params: Dict, cfg: ModelConfig):
        self.params, self.cfg = params, cfg
        self.A, self.B = _support(cfg)
        H = cfg.hop
        # left context carried between pushes, in whole frames
        self.ctx_frames = -(-self.A // H)
        self.buf: np.ndarray | None = None   # [B, T_buf] float32
        self.buf_start = 0                   # abs index of buf[:, 0]
        self.total = 0                       # abs samples pushed
        self.emitted = 0                     # latent frames emitted

    @property
    def lookahead(self) -> int:
        """Samples of future audio a frame waits for before emission."""
        return self.B

    def push(self, samples) -> np.ndarray:
        """Append ``[B, n]`` samples; return newly final ``[B, m]`` ids
        (m may be 0 while the lookahead fills)."""
        chunk = np.atleast_2d(np.asarray(samples, np.float32))
        # the training/generation input distribution: mu-law round-trip
        # (elementwise — chunking-exact).  Pad to buckets (128-sample
        # steps up to 1024, then powers of two) and slice back:
        # elementwise means the pad never leaks, and the jit program
        # count stays LOG-bounded in push size instead of one program
        # per distinct push length (each a compile on a tunneled TPU) —
        # so a daemon may push a whole request at once
        n = chunk.shape[1]
        nb = max(128, -(-n // 128) * 128)
        if nb > 1024:
            nb = 1 << (nb - 1).bit_length()
        padded = np.zeros((chunk.shape[0], nb), np.float32)
        padded[:, :n] = chunk
        chunk = np.asarray(
            mu_law_round_trip_jit(jnp.asarray(padded), self.cfg.mu,
                                  self.cfg.mulaw_mode),
            np.float32)[:, :n]
        self.buf = (chunk if self.buf is None
                    else np.concatenate([self.buf, chunk], axis=1))
        self.total += chunk.shape[1]
        H = self.cfg.hop
        # only completed hop-multiples count: a trailing partial frame
        # must never influence emitted codes (one-shot trims it)
        usable = (self.total // H) * H
        n_avail = (usable - 1 - self.B) // H + 1 if usable > self.B else 0
        if n_avail <= self.emitted:
            return np.zeros((self.buf.shape[0], 0), np.int32)
        return self._encode(self.emitted, n_avail, usable)

    def flush(self) -> np.ndarray:
        """Emit the held-back tail frames; the encoder then resets.

        The final window ends exactly at the (hop-trimmed) stream end,
        so the tail frames see the conv stack's own SAME padding at
        the same absolute positions the one-shot encode applies it."""
        H = self.cfg.hop
        usable = self.total // H * H
        n_total = usable // H
        if self.buf is None or n_total <= self.emitted:
            out = np.zeros((1 if self.buf is None
                            else self.buf.shape[0], 0), np.int32)
        else:
            out = self._encode(self.emitted, n_total, usable,
                               final=True)
        self.buf, self.buf_start, self.total, self.emitted = \
            None, 0, 0, 0
        return out

    def _encode(self, n0: int, n1: int, usable: int,
                final: bool = False) -> np.ndarray:
        """Encode a frame-aligned window covering frames [n0, n1).

        ``final``: the stream ends at ``usable`` — the window must end
        THERE so the per-layer SAME padding matches the one-shot
        encode of the whole stream (zero input samples are NOT
        equivalent once conv biases are nonzero: relu(conv(0)+b) != 0
        in the padding region would pollute every frame whose support
        crosses the stream end)."""
        H = self.cfg.hop
        if final:
            w_end = usable
        else:
            # mid-stream: every emitted frame's support [nH-A, nH+B]
            # holds real samples (n_avail guarantees it), so the
            # window may extend past `usable` with zeros — unread by
            # construction — to keep push window widths steady
            w_end = -(-((n1 - 1) * H + self.B + 1) // H) * H
        w_start = max(0, n0 - self.ctx_frames) * H
        width = w_end - w_start
        if not final and width > 1024:
            # bucket wide windows to powers of two (hop-aligned): the
            # extension is zeros to the RIGHT of w_end, which no
            # emitted frame's support reaches (same argument as the
            # w_end rounding above, proven by the exactness tests) —
            # this keeps the compiled-program set log-bounded, so a
            # serving daemon can encode a whole request as one push
            width = -(-(1 << (width - 1).bit_length()) // H) * H
        window = np.zeros((self.buf.shape[0], width), np.float32)
        seg = self.buf[:, w_start - self.buf_start:
                       min(usable, w_end) - self.buf_start]
        window[:, :seg.shape[1]] = seg
        codes = np.asarray(encode_to_codes(
            self.params, self.cfg, jnp.asarray(window)), np.int32)
        f0 = w_start // H
        out = codes[:, n0 - f0:n1 - f0]
        self.emitted = n1
        keep = max(0, n1 - self.ctx_frames) * H
        if keep > self.buf_start:
            self.buf = self.buf[:, keep - self.buf_start:]
            self.buf_start = keep
        return out
