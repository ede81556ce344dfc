"""Mu-law companding, jitted (reference: ``utils.py :: class mu_law``,
SURVEY.md §2.1).

The reference implements ``transform`` (float waveform in [-1, 1] ->
integer class ids in [0, mu)) and ``itransform`` (its inverse).  Here both
are pure jittable functions so the companding runs fused on device as part
of the input pipeline / generation epilogue (BASELINE north star: "fused
XLA preprocessing pipeline").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mu_law_encode(x: jax.Array, mu: int = 256) -> jax.Array:
    """Float waveform in [-1, 1] -> integer mu-law class ids in [0, mu).

    y = sign(x) * log(1 + (mu-1)*|x|) / log(mu)   in [-1, 1]
    id = round((y + 1) / 2 * (mu - 1))
    """
    m = jnp.asarray(mu - 1, dtype=x.dtype)
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(m * jnp.abs(x)) / jnp.log1p(m)
    ids = jnp.round((y + 1.0) * 0.5 * m)
    return ids.astype(jnp.int32)


def mu_law_decode(ids: jax.Array, mu: int = 256,
                  dtype=jnp.float32) -> jax.Array:
    """Integer class ids in [0, mu) -> float waveform in [-1, 1]."""
    m = jnp.asarray(mu - 1, dtype=dtype)
    y = ids.astype(dtype) * (2.0 / m) - 1.0
    x = jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(m))) / m
    return x
