"""Mu-law companding, jitted (reference: ``utils.py :: class mu_law``,
SURVEY.md §2.1).

The reference implements ``transform`` (float waveform in [-1, 1] ->
integer class ids in [0, mu)) and ``itransform`` (its inverse).  Here both
are pure jittable functions so the companding runs fused on device as part
of the input pipeline / generation epilogue (BASELINE north star: "fused
XLA preprocessing pipeline").

Two binning modes (``mode=``), selectable via ``ModelConfig.mulaw_mode``:

* ``"round"`` (default, TPU-native): symmetric rounding with a (mu-1)
  companding constant; decode is an exact fixed point of encode
  (PARITY.md "Known deltas").
* ``"chainer"``: the reference's digitize-style binning [P — derived
  from the Chainer idiom, SURVEY.md §0: mount empty, unverifiable this
  session]: y = sign(x)·log(1+mu·|x|)/log(1+mu), ids = the bin index
  over edges 2·i/mu - 1 (== floor((y+1)·mu/2) in closed form), inverse
  x = sign(y)/mu·((1+mu)^|y| - 1) with y = 2·ids/mu - 1.  This is the
  turn-key switch for bit-comparison the day the reference mount
  appears; ±1-id edge deltas vs "round" are expected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mu_law_encode(x: jax.Array, mu: int = 256,
                  mode: str = "round") -> jax.Array:
    """Float waveform in [-1, 1] -> integer mu-law class ids in [0, mu)."""
    x = jnp.clip(x, -1.0, 1.0)
    if mode == "chainer":
        m = jnp.asarray(mu, dtype=x.dtype)
        y = jnp.sign(x) * jnp.log1p(m * jnp.abs(x)) / jnp.log1p(m)
        ids = jnp.floor((y + 1.0) * (mu / 2.0))
        return jnp.clip(ids.astype(jnp.int32), 0, mu - 1)
    assert mode == "round", mode
    m = jnp.asarray(mu - 1, dtype=x.dtype)
    y = jnp.sign(x) * jnp.log1p(m * jnp.abs(x)) / jnp.log1p(m)
    ids = jnp.round((y + 1.0) * 0.5 * m)
    return ids.astype(jnp.int32)


def mu_law_decode(ids: jax.Array, mu: int = 256,
                  dtype=jnp.float32, mode: str = "round") -> jax.Array:
    """Integer class ids in [0, mu) -> float waveform in [-1, 1]."""
    if mode == "chainer":
        m = jnp.asarray(mu, dtype=dtype)
        y = ids.astype(dtype) * (2.0 / m) - 1.0
        x = jnp.sign(y) / m * jnp.expm1(jnp.abs(y) * jnp.log1p(m))
    else:
        assert mode == "round", mode
        m = jnp.asarray(mu - 1, dtype=dtype)
        y = ids.astype(dtype) * (2.0 / m) - 1.0
        x = jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(m))) / m
    # the ideal-math range is exactly [-1, 1]; under jit, fused
    # expm1/log1p rounding can land the extreme ids 1 ulp outside it
    return jnp.clip(x, -1.0, 1.0)


# The SHARED jitted decode every inference path funnels ids through.
# One compiled dispatch instead of ~6 eager ops per call (each eager
# op is a host round trip on a tunneled TPU), and — because streaming
# and one-shot use the SAME program — the outputs stay bit-identical
# across engines (jit can fuse elementwise chains differently from
# eager per-op dispatch: a 1-ulp drift was measured when streaming
# fused the decode into its scan while one-shot decoded eagerly).
mu_law_decode_jit = jax.jit(mu_law_decode,
                            static_argnames=("mu", "dtype", "mode"))


def mu_law_round_trip(x: jax.Array, mu: int = 256,
                      mode: str = "round") -> jax.Array:
    """Quantize-dequantize: the input distribution every model path
    (training framing, one-shot encode, streaming encode) sees."""
    return mu_law_decode(mu_law_encode(x, mu, mode), mu, mode=mode)


# shared jitted form, same reasoning as mu_law_decode_jit: one
# dispatch, and every encode front end computes the identical bits
mu_law_round_trip_jit = jax.jit(mu_law_round_trip,
                                static_argnames=("mu", "mode"))
