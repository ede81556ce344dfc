"""Sequence-parallel causal convolution with halo exchange
(SURVEY.md §2.3 SP row / §5.7 stretch: time-axis sharding the reference
never had — audio is long, so the natural extra mesh axis on TPU is
time, with each chip holding a contiguous slice and exchanging a
``(k-1)*dilation``-frame halo with its left neighbour over ICI).

Built on ``jax.shard_map`` + ``lax.ppermute``: the halo travels one
hop rightward; shard 0 receives zeros, which reproduces the causal
left-padding exactly, so the sharded op is numerically identical to
``ops.conv.causal_conv_apply`` on the gathered sequence.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_causal_conv(params: Dict, x: jax.Array, dilation: int,
                        mesh: Mesh, axis: str = "data",
                        dtype=None) -> jax.Array:
    """Causal 2-tap dilated conv over a time-sharded ``[B, T, C]``.

    ``x``'s T axis is sharded over ``axis``; the result has the same
    sharding. Requires ``dilation <= T / axis_size`` (halo from the
    immediate neighbour only).
    """
    w = params["w"]
    assert w.shape[0] == 2, "sharded path specialised to 2-tap filters"
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    n = mesh.shape[axis]
    T = x.shape[1]
    assert T % n == 0 and dilation <= T // n, (T, n, dilation)

    def body(xs, w0, w1, b):
        # send the last `dilation` frames one shard rightward; shard 0
        # receives zeros == the causal zero pad
        halo = xs[:, -dilation:, :]
        left = lax.ppermute(halo, axis,
                            [(i, i + 1) for i in range(n - 1)])
        ctx = jnp.concatenate([left, xs], axis=1)
        y = xs @ w1 + ctx[:, :xs.shape[1], :] @ w0
        if b is not None:
            y = y + b.astype(y.dtype)
        return y

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(), P()),
        out_specs=P(None, axis, None),
    )(x, w[0], w[1], params.get("b"))


def time_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NamedSharding for ``[B, T, C]`` with T over ``axis``."""
    return NamedSharding(mesh, P(None, axis, None))
