"""Sequence-parallel WaveNet decoder (SURVEY.md §2.3 SP row, §5.7
stretch): the ENTIRE teacher-forced gated-residual stack over a
time-sharded activation.

Each chip holds a contiguous time slice of the batch; every dilated
causal conv exchanges a ``dilation``-frame halo with its left
neighbour over ICI (`lax.ppermute`), and everything else in the stack
(gates, 1x1 residual/skip matmuls, conditioning adds, head) is
pointwise in time and needs no communication at all. Shard 0's halo
arrives as zeros, reproducing the causal left-padding exactly, so the
sharded stack is numerically identical to
``models.wavenet.apply_decoder`` on the gathered sequence
(tests/test_sharded_conv.py).

Constraint: every dilation must fit in one shard
(``max(dilations) <= T / n_shards``) so halos come from the immediate
neighbour only — satisfied whenever the per-shard slice covers the
receptive field's largest tap, e.g. the flagship (max dil 512) down to
T/512 shards.

Use case: audio far longer than one chip's activation memory — the
reference handles long audio only by slicing (SURVEY.md §5.7); this
gives the TPU build a second, orthogonal axis.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from vqvae_tpu.configs import ModelConfig


def _halo_shift_right(x: jax.Array, n: int, axis_name: str,
                      n_shards: int) -> jax.Array:
    """shift_right along a time-sharded axis: the last ``n`` frames of
    each shard travel one hop rightward; shard 0 gets zeros."""
    halo = x[:, -n:, :]
    left = lax.ppermute(halo, axis_name,
                        [(i, i + 1) for i in range(n_shards - 1)])
    return jnp.concatenate([left, x[:, :-n, :]], axis=1) \
        if n < x.shape[1] else left


def apply_decoder_sp(params: Dict, cfg: ModelConfig, ids_in: jax.Array,
                     cond: jax.Array, speaker: jax.Array, mesh: Mesh,
                     axis: str = "data",
                     batch_axes=None) -> jax.Array:
    """Teacher-forced decode with T sharded over ``mesh[axis]``.

    ids_in ``[B, T]``, cond ``[B, T, d]`` (both T-sharded or
    replicated — shard_map partitions them), speaker ``[B]``.
    Returns logits ``[B, T, mu]`` T-sharded. Matches ``apply_decoder``
    exactly (same op order per shard).

    ``batch_axes`` (e.g. ``('data',)``) additionally shards the BATCH
    dim over those mesh axes, composing DP x SP: each (data, seq) tile
    holds a (batch-slice, time-slice) block and the halo ppermutes run
    along 'seq' only. None replicates the batch across the other axes
    (the single-purpose time-sharding mode the tests pin).
    """
    from vqvae_tpu.models.wavenet import _gate, _head, global_cond

    n = mesh.shape[axis]
    T = ids_in.shape[1]
    R = cfg.residual_channels
    cdt = cfg.cdtype
    assert T % n == 0, (T, n)
    assert max(cfg.dilations) <= T // n, (
        "every dilation must fit in one time shard: "
        f"max dil {max(cfg.dilations)} > {T // n}")

    gcond = global_cond(params["decoder"], cfg, speaker)  # [L, B, 2R]
    lay = params["decoder"]["layers"]
    emb = params["decoder"]["emb"]

    def body(ids, cond, gcond, emb_w, emb_b, wf, bf_unused, vc, wr, br,
             ws, bs, head_h1w, head_h1b, head_h2w, head_h2b):
        w = emb_w.astype(cdt)
        # input causal conv over the implicit one-hot: the w0-gather of
        # the previous sample crosses the shard boundary (1-frame halo)
        h = (w[1][ids]
             + _halo_shift_right(w[0][ids], 1, axis, n)
             + emb_b.astype(cdt))
        c = cond.astype(cdt)
        skips = jnp.zeros(h.shape[:2] + (cfg.skip_channels,), cdt)
        for li, dil in enumerate(cfg.dilations):
            past = _halo_shift_right(h, dil, axis, n)
            u = (past @ wf[li, 0].astype(cdt)
                 + h @ wf[li, 1].astype(cdt)
                 + c @ vc[li].astype(cdt)
                 + gcond[li][:, None, :].astype(cdt))
            z = _gate(u, R)
            h = h + z @ wr[li].astype(cdt) + br[li].astype(cdt)
            skips = skips + z @ ws[li].astype(cdt) + bs[li].astype(cdt)
        hp = {"head": {"h1": {"w": head_h1w, "b": head_h1b},
                       "h2": {"w": head_h2w, "b": head_h2b}}}
        return _head(hp, cfg, skips)

    bax = tuple(batch_axes) if batch_axes else None
    tsh = P(bax, axis)
    tshc = P(bax, axis, None)
    gsh = P(None, bax, None)        # gcond [L, B, 2R]
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(tsh, tshc, gsh, P(), P(), P(), P(), P(), P(), P(),
                  P(), P(), P(), P(), P(), P()),
        out_specs=tshc,
    )(ids_in, cond, gcond, emb["w"], emb["b"], lay["wf"], lay["bf"],
      lay["vc"], lay["wr"], lay["br"], lay["ws"], lay["bs"],
      params["decoder"]["head"]["h1"]["w"],
      params["decoder"]["head"]["h1"]["b"],
      params["decoder"]["head"]["h2"]["w"],
      params["decoder"]["head"]["h2"]["b"])
