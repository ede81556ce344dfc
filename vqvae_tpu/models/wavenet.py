"""WaveNet decoder (reference: ``net.py :: Decoder`` + ``ResidualBlock`` /
``ResidualNet``, SURVEY.md §2.1) — dilated causal gated-residual stacks
with local (upsampled VQ latents) and global (speaker embedding)
conditioning, plus the per-sample step function used by the fast
generator (reference: ``Decoder.initialize`` / ``Decoder.generate``).

TPU-first redesign decisions:

* The input "causal conv over a one-hot waveform" is algebraically two
  embedding gathers (one_hot(x) @ W == W[x]); the one-hot is never
  materialised.
* Each dilated causal conv (filter size 2) is two time-shifted dense
  matmuls (see ops/conv.py) — large MXU contractions instead of tiny
  window convs.
* All per-layer weights are stacked along a leading layer axis ``[L, ...]``
  so they form a handful of large arrays (shardable along channel axes on
  a 'model' mesh axis, and DMA-able as one block into VMEM by the Pallas
  decode kernel).
* ``decoder_step`` advances ONE sample given per-layer ring buffers.
  Teacher-forced ``apply_decoder`` and ``decoder_step`` share the same
  weights and the same operation order, so fast generation is exactly
  teacher forcing (the §4.2a parity oracle).

Shapes: R = residual_channels, S = skip_channels, d = latent dim,
g = speaker_embed_dim, L = n_loop * n_layer, mu = classes.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.ops.conv import (
    dense_init,
    shift_right,
    upsample_apply,
    upsample_init,
)


def _normal(key, shape, fan_in, dtype):
    return jax.random.normal(key, shape, dtype) / math.sqrt(fan_in)


def init_decoder(key, cfg: ModelConfig) -> Dict:
    R, S, d, mu = (cfg.residual_channels, cfg.skip_channels, cfg.d, cfg.mu)
    g = cfg.speaker_embed_dim
    L = cfg.n_layers_total
    k = cfg.filter_size
    # The ring-buffer fast path and the shifted-matmul conv are
    # specialised to the reference's 2-tap causal filters.
    assert k == 2, "filter_size must be 2 (reference WaveNet uses 2 taps)"
    keys = jax.random.split(key, 12)
    pdt = cfg.pdtype

    layers = {
        # dilated causal conv producing gate preactivations (2R = filter+gate)
        "wf": _normal(keys[0], (L, k, R, 2 * R), k * R, pdt),
        "bf": jnp.zeros((L, 2 * R), pdt),
        # local-condition 1x1 per layer
        "vc": _normal(keys[1], (L, d, 2 * R), d, pdt),
        # global-condition 1x1 per layer
        "vg": _normal(keys[2], (L, g, 2 * R), g, pdt),
        # residual / skip 1x1s
        "wr": _normal(keys[3], (L, R, R), R, pdt),
        "br": jnp.zeros((L, R), pdt),
        "ws": _normal(keys[4], (L, R, S), R, pdt),
        "bs": jnp.zeros((L, S), pdt),
    }
    return {
        # input causal conv (kernel 2) over implicit one-hot: [2, mu, R]
        "emb": {"w": _normal(keys[5], (2, mu, R), 2, pdt),
                "b": jnp.zeros((R,), pdt)},
        "layers": layers,
        "head": {
            "h1": dense_init(keys[6], S, S, pdt),
            "h2": dense_init(keys[7], S, mu, pdt),
        },
        "upsample": upsample_init(keys[8], d, d, cfg.hop,
                                  cfg.upsample_kernel_mult, pdt),
        "speaker": {"w": jax.random.normal(keys[9],
                                           (max(cfg.n_speakers, 1), g),
                                           pdt)},
    }


def upsample_cond(params: Dict, cfg: ModelConfig, e: jax.Array
                  ) -> jax.Array:
    """Quantised latents ``[B, T/hop, d]`` -> audio-rate ``[B, T, d]``."""
    return upsample_apply(params["upsample"], e, cfg.hop, cfg.cdtype)


def global_cond(params: Dict, cfg: ModelConfig, speaker: jax.Array
                ) -> jax.Array:
    """Per-layer global contribution (speaker embed through each vg),
    with the conv bias folded in: ``[L, B, 2R]``."""
    gemb = params["speaker"]["w"].astype(cfg.cdtype)[speaker]  # [B, g]
    vg = params["layers"]["vg"].astype(cfg.cdtype)             # [L, g, 2R]
    bf = params["layers"]["bf"].astype(cfg.cdtype)             # [L, 2R]
    return jnp.einsum("bg,lgr->lbr", gemb, vg) + bf[:, None, :]


def embed_inputs(params: Dict, cfg: ModelConfig, ids: jax.Array
                 ) -> jax.Array:
    """Teacher-forced input layer: causal kernel-2 'conv' over the
    implicit one-hot, as two gathers (matmul backward — ops/embed.py).
    ``[B, T] -> [B, T, R]``."""
    from vqvae_tpu.ops.embed import take_rows
    w = params["emb"]["w"].astype(cfg.cdtype)
    h = take_rows(w[1], ids) + shift_right(take_rows(w[0], ids), 1)
    return h + params["emb"]["b"].astype(cfg.cdtype)


def _gate(u: jax.Array, R: int) -> jax.Array:
    return jnp.tanh(u[..., :R]) * jax.nn.sigmoid(u[..., R:])


def apply_decoder(params: Dict, cfg: ModelConfig, ids_in: jax.Array,
                  cond: jax.Array, speaker: jax.Array) -> jax.Array:
    """Teacher-forced decode: ids ``[B, T]``, cond ``[B, T, d]``,
    speaker ``[B]`` -> logits ``[B, T, mu]`` (float32)."""
    return _head(params, cfg,
                 decoder_skips(params, cfg, ids_in, cond, speaker))


def decoder_skips(params: Dict, cfg: ModelConfig, ids_in: jax.Array,
                  cond: jax.Array, speaker: jax.Array) -> jax.Array:
    """The gated-residual stack up to (but not including) the head:
    returns the summed skips ``[B, T, S]`` — the boundary the fused
    head+CE training kernel consumes (kernels/head_ce_pallas.py)."""
    R = cfg.residual_channels
    cdt = cfg.cdtype
    lay = params["layers"]
    cond = cond.astype(cdt)
    gcond = global_cond(params, cfg, speaker)        # [L, B, 2R]

    if cfg.decoder_kernel in ("pallas", "pallas_sg"):
        from vqvae_tpu.kernels.wavenet_train_pallas import (
            decoder_stack_pallas,
        )
        if cfg.embed_in_kernel:
            # the first chunk kernel embeds ids itself: h/dh never
            # exist as HBM tensors (kernels/wavenet_train_pallas.py)
            return decoder_stack_pallas(params, cfg, None, cond,
                                        gcond, ids=ids_in)
        h = embed_inputs(params, cfg, ids_in)
        return decoder_stack_pallas(params, cfg, h, cond, gcond)

    h = embed_inputs(params, cfg, ids_in)

    def layer(h, skips, wf, vc, gc, wr, br, ws, bs, dil):
        u = shift_right(h, dil) @ wf[0].astype(cdt) + h @ wf[1].astype(cdt)
        u = u + cond @ vc.astype(cdt) + gc[:, None, :]
        z = _gate(u, R)
        h = h + z @ wr.astype(cdt) + br.astype(cdt)
        return h, skips + z @ ws.astype(cdt) + bs.astype(cdt)

    if cfg.remat:
        # recompute the gate activations in the backward pass instead of
        # keeping L x [B,T,2R] live in HBM (SURVEY.md §7: remat to trade
        # FLOPs for HBM)
        layer = jax.checkpoint(layer, static_argnums=(9,))

    skips = jnp.zeros((h.shape[0], h.shape[1], cfg.skip_channels), cdt)
    for li, dil in enumerate(cfg.dilations):
        h, skips = layer(h, skips, lay["wf"][li], lay["vc"][li],
                         gcond[li], lay["wr"][li], lay["br"][li],
                         lay["ws"][li], lay["bs"][li], dil)
    return skips


def _head(params: Dict, cfg: ModelConfig, skips: jax.Array) -> jax.Array:
    cdt = cfg.cdtype
    h1, h2 = params["head"]["h1"], params["head"]["h2"]
    x = jax.nn.relu(skips)
    x = jax.nn.relu(x @ h1["w"].astype(cdt) + h1["b"].astype(cdt))
    logits = x @ h2["w"].astype(jnp.float32) + h2["b"].astype(jnp.float32)
    return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Fast generation: per-sample step over ring buffers
# (reference: net.py Decoder.initialize/generate — SURVEY.md §3.2)
#
# The step is latency-bound: its cost is the count of *sequential* MXU
# ops, not FLOPs.  So the weights are repacked once per generation call
# into fused forms that halve the critical path per layer:
#   * [past | h] @ [wf0; wf1]  — one [B,2R]x[2R,2R] matmul per layer
#     instead of two R-contractions,
#   * z @ [wr | ws]            — residual+skip in one matmul,
#   * c_t @ vc_all             — ALL layers' local-cond projections in
#     one [B,d]x[d,L*2R] matmul per step, off the layer-sequential path.
# XLA hoists the repack out of the scan loop (loop-invariant).
# ---------------------------------------------------------------------------


class GenParams(NamedTuple):
    """Generation-time weight repack (see note above)."""

    emb_w: jax.Array     # [2, mu, R]
    emb_b: jax.Array     # [R]
    wff: jax.Array       # [L, 2R, 2R]   vstack(wf0, wf1)
    vc_all: jax.Array    # [d, L*2R]
    wrs: jax.Array       # [L, R, R+S]   hstack(wr, ws)
    brs: jax.Array       # [L, R+S]
    head_h1: jax.Array   # [S, S]
    head_b1: jax.Array   # [S]
    head_h2: jax.Array   # [S, mu]
    head_b2: jax.Array   # [mu]


def make_gen_params(dec: Dict, cfg: ModelConfig) -> GenParams:
    cdt = cfg.cdtype
    lay = dec["layers"]
    L = cfg.n_layers_total
    wf = lay["wf"].astype(cdt)                       # [L, 2, R, 2R]
    wff = jnp.concatenate([wf[:, 0], wf[:, 1]], axis=1)  # [L, 2R, 2R]
    vc = lay["vc"].astype(cdt)                       # [L, d, 2R]
    vc_all = jnp.transpose(vc, (1, 0, 2)).reshape(cfg.d, -1)
    wrs = jnp.concatenate([lay["wr"].astype(cdt),
                           lay["ws"].astype(cdt)], axis=2)
    brs = jnp.concatenate([lay["br"].astype(cdt),
                           lay["bs"].astype(cdt)], axis=1)
    return GenParams(
        emb_w=dec["emb"]["w"].astype(cdt),
        emb_b=dec["emb"]["b"].astype(cdt),
        wff=wff, vc_all=vc_all, wrs=wrs, brs=brs,
        head_h1=dec["head"]["h1"]["w"].astype(cdt),
        head_b1=dec["head"]["h1"]["b"].astype(cdt),
        head_h2=dec["head"]["h2"]["w"].astype(jnp.float32),
        head_b2=dec["head"]["h2"]["b"].astype(jnp.float32),
    )


class GenState(NamedTuple):
    """Constant-size carry for the sampling scan (lives on device).

    ``bufs[l]`` is a ring buffer ``[B, dilations[l], R]`` of layer l's
    *inputs*; slot ``t % dil`` holds h_l[t - dil] at the moment step t
    reads it, and is overwritten with h_l[t] right after (t - dil == t
    mod dil). ``prev_emb0`` carries W0[x[t-1]] for the input conv.
    """

    t: jax.Array                 # [] int32 global step
    prev_emb0: jax.Array         # [B, R]
    bufs: Tuple[jax.Array, ...]  # per layer [B, dil_l, R]


def init_gen_state(cfg: ModelConfig, batch: int) -> GenState:
    R = cfg.residual_channels
    cdt = cfg.cdtype
    return GenState(
        t=jnp.zeros((), jnp.int32),
        prev_emb0=jnp.zeros((batch, R), cdt),
        bufs=tuple(jnp.zeros((batch, d, R), cdt) for d in cfg.dilations),
    )


def decoder_step(gp: GenParams, cfg: ModelConfig, state: GenState,
                 x_t: jax.Array, c_t: jax.Array, gcond: jax.Array
                 ) -> Tuple[GenState, jax.Array]:
    """One autoregressive step.

    x_t ``[B]`` int32 current sample ids, c_t ``[B, d]`` local condition
    at t, gcond ``[L, B, 2R]`` precomputed global contribution (with the
    conv bias folded in).  Returns (new state, logits ``[B, mu]``).
    """
    R = cfg.residual_channels
    cdt = cfg.cdtype
    t = state.t

    h = gp.emb_w[1][x_t] + state.prev_emb0 + gp.emb_b
    new_prev_emb0 = gp.emb_w[0][x_t]

    # all layers' local-cond projections in one matmul, off the
    # layer-sequential critical path
    cproj = (c_t.astype(cdt) @ gp.vc_all).reshape(
        x_t.shape[0], len(cfg.dilations), 2 * R)     # [B, L, 2R]

    new_bufs: List[jax.Array] = []
    skips = None
    for li, dil in enumerate(cfg.dilations):
        buf = state.bufs[li]
        slot = t & (dil - 1) if (dil & (dil - 1)) == 0 else t % dil
        past = jax.lax.dynamic_slice_in_dim(buf, slot, 1, axis=1)[:, 0, :]
        # t < dil -> slot still holds its initial zeros, matching
        # shift_right's causal zero padding
        u = (jnp.concatenate([past, h], axis=-1) @ gp.wff[li]
             + cproj[:, li] + gcond[li])
        new_bufs.append(jax.lax.dynamic_update_slice_in_dim(
            buf, h[:, None, :], slot, axis=1))
        z = _gate(u, R)
        rs = z @ gp.wrs[li] + gp.brs[li]             # [B, R+S]
        h = h + rs[:, :R]
        skips = rs[:, R:] if skips is None else skips + rs[:, R:]

    x = jax.nn.relu(skips)
    x = jax.nn.relu(x @ gp.head_h1 + gp.head_b1)
    logits = (x.astype(jnp.float32) @ gp.head_h2 + gp.head_b2)
    return GenState(t=t + 1, prev_emb0=new_prev_emb0,
                    bufs=tuple(new_bufs)), logits
