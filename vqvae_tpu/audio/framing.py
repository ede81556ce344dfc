"""Input framing (reference: ``utils.py :: Preprocess.__call__`` tail,
SURVEY.md §3.4).

The reference emits, per utterance slice of ``length + 1`` samples:
  * the *scalar* float waveform for the encoder,
  * a *one-hot* (mu classes) framing of samples [0, length) for the
    decoder's teacher-forced input,
  * the next-sample class ids [1, length] as the 256-way targets.

TPU-first difference: we never materialise the one-hot on the host or in
HBM.  The decoder input stays as int32 class ids; the decoder's input
"causal conv over one-hot" is algebraically an embedding-table gather
(one_hot(x) @ W == W[x]), which is how models/wavenet.py consumes it.
This removes a mu* blow-up (256x) in input bandwidth versus the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vqvae_tpu.audio.mu_law import mu_law_decode, mu_law_encode


class Batch(NamedTuple):
    """One training batch (all device-resident, batch-sharded)."""

    wav: jax.Array        # [B, T]  float32 scalar waveform (encoder input)
    ids_in: jax.Array     # [B, T]  int32 mu-law ids (decoder input, x[0:T])
    targets: jax.Array    # [B, T]  int32 next-sample ids  (x[1:T+1])
    speaker: jax.Array    # [B]     int32 global-condition ids


def frame_batch(wav_slices: jax.Array, speaker: jax.Array,
                mu: int = 256, mulaw_mode: str = "round") -> Batch:
    """Frame raw float slices ``[B, length+1]`` into a training Batch.

    Jittable: runs fused on device right after the host hands over raw
    float audio. The quantise->dequantise of the encoder input mirrors the
    reference, whose encoder sees the mu-law-rounded scalar waveform.
    """
    ids = mu_law_encode(wav_slices, mu, mulaw_mode)   # [B, length+1]
    wav_q = mu_law_decode(ids, mu, mode=mulaw_mode)   # mu-law-256 wave
    return Batch(
        wav=wav_q[:, :-1],
        ids_in=ids[:, :-1],
        targets=ids[:, 1:],
        speaker=speaker.astype(jnp.int32),
    )
