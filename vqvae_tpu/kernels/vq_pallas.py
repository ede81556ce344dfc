"""Fused VQ nearest-neighbour kernel (Pallas/TPU).

Reference equivalent: the CuPy L2-distance + argmin kernels behind
``net.py :: VQ.forward`` (SURVEY.md §2.2 N2).  One kernel computes the
scores matrix on the MXU and reduces to per-row argmin indices on the
VPU, with the codebook resident in VMEM across all grid steps — no
[N, K] distance matrix ever reaches HBM (the lax path materialises it).

The straight-through gradient structure lives OUTSIDE this kernel
(models/vq.quantize): argmin has no gradient, so the kernel is wrapped
in stop_gradient context by construction.

Argmin identity used (row-wise over codes k):
  argmin_k ||z - w_k||^2 == argmax_k (2 z.w_k - ||w_k||^2)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512


def _vq_kernel(z_ref, cbt_ref, cbn_ref, idx_ref):
    # scores: [TILE_N, K] on the MXU; f32 accumulation
    scores = 2.0 * jnp.dot(z_ref[:], cbt_ref[:],
                           preferred_element_type=jnp.float32)
    scores = scores - cbn_ref[:]          # [1, K] broadcast
    idx_ref[:] = jnp.argmax(scores, axis=-1, keepdims=True
                            ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vq_argmin_pallas(z: jax.Array, codebook: jax.Array,
                     interpret: bool | None = None) -> jax.Array:
    """z ``[N, d]``, codebook ``[K, d]`` -> argmin indices ``[N]``.

    Grid over N tiles; the transposed codebook and its squared norms
    stay pinned in VMEM (constant index_map) for every tile.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N, d = z.shape
    K = codebook.shape[0]
    n_pad = (-N) % TILE_N
    zp = jnp.pad(z, ((0, n_pad), (0, 0))) if n_pad else z

    cbt = codebook.T.astype(z.dtype)                      # [d, K]
    cbn = jnp.sum(jnp.square(codebook.astype(jnp.float32)),
                  axis=-1)[None, :]                       # [1, K]

    grid = (zp.shape[0] // TILE_N,)
    idx = pl.pallas_call(
        _vq_kernel,
        out_shape=jax.ShapeDtypeStruct((zp.shape[0], 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zp, cbt, cbn)
    return idx[:N, 0]
