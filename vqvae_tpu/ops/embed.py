"""Embedding gather with a matmul backward.

The forward is a plain row gather (fast on TPU).  XLA's *backward* for
a gather is a scatter-add, which at WaveNet shapes (122k+ updates into
a [mu, R] table) lowers to a serialized sort/segment pass measured at
1.7-3.3 ms/step on the flagship (docs/PERF.md profile).  The same
contraction as ``one_hot(ids)^T @ g`` is one [mu, N] x [N, R] MXU
matmul — bandwidth-bound at ~0.1 ms.

Used by the decoder input embedding (models/wavenet.embed_inputs); the
codebook/speaker gathers stay plain (their update counts are tiny).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def take_rows(w: jax.Array, ids: jax.Array) -> jax.Array:
    """``w[ids]`` — w ``[V, C]``, ids int ``[...]`` -> ``[..., C]``."""
    return w[ids]


def _fwd(w, ids):
    # w rides along as a shape/dtype reference only (it is alive in the
    # caller anyway, so this keeps no extra memory)
    return w[ids], (ids, w)


def _bwd(res, g):
    ids, w = res
    flat_ids = ids.reshape(-1)
    gf = g.reshape(-1, g.shape[-1])
    onehot = jax.nn.one_hot(flat_ids, w.shape[0], dtype=gf.dtype)
    dw = jnp.einsum("nv,nc->vc", onehot, gf,
                    preferred_element_type=jnp.float32)
    return dw.astype(w.dtype), None


take_rows.defvjp(_fwd, _bwd)
