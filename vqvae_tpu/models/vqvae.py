"""Top-level VQ-VAE: loss assembly (reference:
``net.py :: class VQVAE(chainer.Chain).__call__``, SURVEY.md §2.1, §3.3).

loss1 = softmax cross-entropy of decoder logits vs next-sample targets
loss2 = ||sg(z_e) - e||^2                      (codebook, off when EMA)
loss3 = beta * ||z_e - sg(e)||^2               (commitment)

Gradient topology matches the reference exactly: the encoder learns
through the decoder via the straight-through estimator plus the
commitment term; the codebook learns only from loss2 (or EMA updates).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vqvae_tpu.audio.framing import Batch
from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.models.encoder import apply_encoder, init_encoder
from vqvae_tpu.models import vq as vq_mod
from vqvae_tpu.models.vq import VQState, init_vq, quantize, vq_losses
from vqvae_tpu.models.wavenet import (
    apply_decoder,
    init_decoder,
    upsample_cond,
)


def init_model(key, cfg: ModelConfig) -> Dict:
    k_enc, k_vq, k_dec = jax.random.split(key, 3)
    return {
        "encoder": init_encoder(k_enc, cfg),
        "vq": init_vq(k_vq, cfg),
        "decoder": init_decoder(k_dec, cfg),
    }


def init_vq_state(params: Dict) -> VQState:
    return vq_mod.init_vq_state(params["vq"])


def encode(params: Dict, cfg: ModelConfig, wav: jax.Array,
           impl: str = "lax") -> jax.Array:
    """Waveform ``[B, T]`` -> discrete code ids ``[B, T/hop]``
    (reference 'encode' entry point)."""
    z = apply_encoder(params["encoder"], cfg, wav)
    return vq_mod.nearest_code(z, params["vq"]["codebook"], impl)


def forward(params: Dict, cfg: ModelConfig, batch: Batch,
            impl: str = "lax", mesh=None
            ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Training forward: returns (total loss, metrics dict).

    Metric names loss1/loss2/loss3 mirror ``chainer.report`` so loss
    curves are directly comparable (SURVEY.md §5.5).

    ``mesh`` (static): when it carries a 'seq' axis of size > 1, the
    teacher-forced decoder stack runs sequence-parallel — activations
    time-sharded over 'seq' with per-layer halo exchange
    (parallel/sp_decoder.py), composing with DP over the batch axes.
    """
    z = apply_encoder(params["encoder"], cfg, batch.wav)   # [B,Tl,d] f32
    e_st, e, idx = quantize(params["vq"], z, impl)
    loss2, loss3 = vq_losses(z, e)

    cond = upsample_cond(params["decoder"], cfg, e_st)     # [B,T,d]
    if (mesh is not None and "seq" in mesh.axis_names
            and mesh.shape["seq"] > 1):
        from vqvae_tpu.parallel.sp_decoder import apply_decoder_sp
        bax = tuple(a for a in ("slice", "data")
                    if a in mesh.axis_names)
        if mesh.shape.get("model", 1) > 1:
            # the SP body declares decoder weights replicated: with an
            # active 'model' axis the channel-sharded weights are
            # gathered and the decoder compute runs redundantly per
            # model shard (numerically correct — pinned in CI — but
            # the TP benefit covers only encoder/VQ/head). seq is the
            # long-audio memory axis; prefer it WITHOUT large TP.
            print("vqvae_tpu: note: mesh_seq>1 with mesh_model>1 — "
                  "decoder weights are replicated across 'model' "
                  "inside the sequence-parallel stack")
        logits = apply_decoder_sp(params, cfg, batch.ids_in,
                                  cond, batch.speaker, mesh,
                                  axis="seq", batch_axes=bax)
    elif cfg.head_kernel == "pallas":
        # one fused kernel runs head + CE straight off the skips — the
        # f32 [B,T,mu] logits never touch HBM (round-4 profile: the
        # XLA chain is 9.9% of the step, all HBM round trips;
        # kernels/head_ce_pallas.py)
        from vqvae_tpu.kernels.head_ce_pallas import head_ce_loss
        from vqvae_tpu.models.wavenet import decoder_skips
        skips = decoder_skips(params["decoder"], cfg, batch.ids_in,
                              cond, batch.speaker)
        loss1 = head_ce_loss(params["decoder"], cfg, skips,
                             batch.targets)
        logits = None
    else:
        logits = apply_decoder(params["decoder"], cfg, batch.ids_in,
                               cond, batch.speaker)        # [B,T,mu] f32
    if logits is not None:
        # Softmax cross-entropy via one-hot contraction instead of
        # take_along_axis: the integer-label gather (and its scatter in
        # the backward) costs ~2-4 ms/step at flagship shapes on TPU
        # (profiled, docs/PERF.md); the one-hot multiply fuses into one
        # pass over the logits. Same value as optax's integer-label CE
        # to f32 rounding.
        logz = jax.scipy.special.logsumexp(logits, axis=-1)    # [B,T]
        picked = jnp.sum(
            logits * jax.nn.one_hot(batch.targets, cfg.mu,
                                    dtype=logits.dtype), axis=-1)
        loss1 = jnp.mean(logz - picked)

    if cfg.ema:
        loss = loss1 + cfg.beta * loss3
    else:
        loss = loss1 + loss2 + cfg.beta * loss3

    # codebook health: hit fraction + usage perplexity (not in the
    # reference's reports, but standard VQ metrics)
    used = jnp.zeros((cfg.K,), jnp.float32).at[idx.reshape(-1)].set(1.0)
    metrics = {
        "loss": loss,
        "loss1": loss1,
        "loss2": loss2,
        "loss3": loss3,
        "codebook_usage": jnp.mean(used),
        "code_perplexity": vq_mod.code_perplexity(idx, cfg.K),
    }
    aux = {"indices": idx, "z": z}
    return loss, (metrics, aux)
