"""Measure the strided-conv encoder's share of the training step.

BASELINE.json's north star names "the strided-conv encoder" as a
Pallas-kernel target. This script produces the evidence for keeping it
on XLA instead: the encoder is ~2% of the step's FLOPs
(utils/flops.py breakdown) and this measures its *time* share on the
real chip — a kernel can at best win its time share.

Times, at flagship shapes (vctk-multi, T=7680):
  1. the full jitted train step (fwd/bwd/Adam),
  2. a jitted encoder-only fwd+bwd (same input shapes),
and prints both plus the ratio as one JSON line.

Usage: PYTHONPATH=. python scripts/encoder_share.py [--batch 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_step(step, state, wav, spk, iters: int = 20) -> float:
    # the jitted step donates `state` — rebind it every call
    for _ in range(3):
        state, metrics = step(state, wav, spk)
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, wav, spk)
    jax.device_get(metrics["loss"])
    return (time.perf_counter() - t0) / iters


def _time(fn, *args, iters: int = 20) -> float:
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--decoder-kernel", default="pallas")
    ap.add_argument("--encoder-kernel", default="xla",
                    choices=["xla", "pallas"])
    args = ap.parse_args()

    from vqvae_tpu.configs import get_config
    from vqvae_tpu.models.encoder import apply_encoder
    from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
    from vqvae_tpu.train import create_train_state, make_train_step

    cfg = get_config("vctk-multi")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model,
                                  decoder_kernel=args.decoder_kernel,
                                  encoder_kernel=args.encoder_kernel),
        train=dataclasses.replace(cfg.train, batch_size=args.batch))
    B, T = args.batch, cfg.data.length

    mesh = make_mesh(devices=jax.devices()[:1])
    jit_for, shardings_of = make_train_step(cfg, mesh)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    sh = shardings_of(state)
    state = jax.device_put(state, sh)
    step = jit_for(sh)

    rng = np.random.default_rng(0)
    bsh = batch_sharding(mesh)
    wav = jax.device_put(
        rng.uniform(-0.9, 0.9, (B, T + 1)).astype(np.float32), bsh)
    spk = jax.device_put(
        (np.arange(B) % cfg.model.n_speakers).astype(np.int32), bsh)

    # encoder-only timing FIRST: the jitted step donates `state`, so
    # state.params is unusable after the step runs
    params = state.params
    wav_only = wav[:, :T]

    @jax.jit
    def enc_fwd_bwd(p, w):
        def f(p):
            z = apply_encoder(p["encoder"], cfg.model, w)
            return jnp.sum(z * jnp.cos(z))  # touch every output
        return jax.value_and_grad(f)(p)

    dt_enc = _time(lambda: enc_fwd_bwd(params, wav_only)[0])

    dt_step = _time_step(step, state, wav, spk)

    print(json.dumps({
        "batch": B,
        "decoder_kernel": args.decoder_kernel,
        "encoder_kernel": args.encoder_kernel,
        "step_ms": round(dt_step * 1e3, 3),
        "encoder_fwd_bwd_ms": round(dt_enc * 1e3, 3),
        "encoder_share": round(dt_enc / dt_step, 4),
    }))


if __name__ == "__main__":
    main()
