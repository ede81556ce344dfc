"""Strided-conv encoder (reference: ``net.py :: class Encoder``,
SURVEY.md §2.1): a stack of stride-2 kernel-4 1-D convs with ReLU,
downsampling the scalar waveform 2**enc_layers times, then a 1x1
projection to the latent dim ``d`` producing z_e.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.ops.conv import conv1d_init, dense_init, strided_conv_apply


def init_encoder(key, cfg: ModelConfig) -> Dict:
    keys = jax.random.split(key, cfg.enc_layers + 1)
    layers = []
    in_ch = 1
    for i in range(cfg.enc_layers):
        layers.append(conv1d_init(keys[i], in_ch, cfg.enc_channels,
                                  cfg.enc_kernel, cfg.pdtype))
        in_ch = cfg.enc_channels
    proj = dense_init(keys[-1], cfg.enc_channels, cfg.d, cfg.pdtype)
    return {"layers": layers, "proj": proj}


def apply_encoder(params: Dict, cfg: ModelConfig, wav: jax.Array
                  ) -> jax.Array:
    """``[B, T] float`` waveform -> z_e ``[B, T/hop, d]`` (float32).

    ``cfg.encoder_kernel == "pallas"`` runs the whole stack (strided
    convs + ReLUs + latent projection) as ONE fused Pallas kernel per
    batch group (kernels/encoder_pallas.py — the north star's encoder
    kernel target); this XLA layer loop remains the shadow reference
    (tests/test_kernels.py).
    """
    if cfg.encoder_kernel == "pallas":
        from vqvae_tpu.kernels.encoder_pallas import encoder_pallas
        return encoder_pallas(params, cfg, wav)
    x = wav[..., None].astype(cfg.cdtype)
    for layer in params["layers"]:
        x = strided_conv_apply(layer, x, cfg.enc_stride, cfg.cdtype)
        x = jax.nn.relu(x)
    w = params["proj"]["w"].astype(cfg.cdtype)
    z = x @ w + params["proj"]["b"].astype(cfg.cdtype)
    # z_e in float32: VQ distances / losses are accumulated in full
    # precision regardless of the conv compute dtype
    return z.astype(jnp.float32)
