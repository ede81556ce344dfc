"""Measure embed_in_kernel (in-kernel input embedding,
fused_stack_chunk_embed) on the real chip at the flagship B=64
training config — the round-4 profile's 5.0%/3.7 ms "decoder input
embedding" line (docs/PERF.md).  Prints on-chip loss/grad-norm parity
vs the same config without the fusion, then best-of-reps step times
for both.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.configs import get_config
from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
from vqvae_tpu.train import create_train_state, make_train_step

B = 64


def step_time(embed: bool, runs=10, reps=3):
    cfg = get_config("vctk-multi")
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, batch_size=B),
        model=dataclasses.replace(cfg.model,
                                  decoder_kernel="pallas_sg",
                                  head_kernel="pallas",
                                  embed_in_kernel=embed))
    mesh = make_mesh(devices=jax.devices()[:1])
    jit_for, sh_of = make_train_step(cfg, mesh)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    sh = sh_of(state)
    state = jax.device_put(state, sh)
    step = jit_for(sh)
    rng = np.random.default_rng(0)
    bsh = batch_sharding(mesh)
    wav = jax.device_put(rng.uniform(
        -0.9, 0.9, (B, cfg.data.length + 1)).astype(np.float32), bsh)
    spk = jax.device_put(
        (np.arange(B) % cfg.model.n_speakers).astype(np.int32), bsh)
    for _ in range(3):
        state, metrics = step(state, wav, spk)
    loss0 = float(jax.device_get(metrics["loss"]))
    gn = jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(state.params)))
    pn = float(jax.device_get(gn))
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(runs):
            state, metrics = step(state, wav, spk)
        jax.device_get(metrics["loss"])
        dt = min(dt, (time.perf_counter() - t0) / runs)
    return dt, loss0, pn


if __name__ == "__main__":
    dt_x, l_x, p_x = step_time(False)
    print(f"embed=False: {dt_x*1e3:.1f} ms/step, {B/dt_x:.1f} utt/s, "
          f"loss3={l_x:.6f}, |params|3={p_x:.4f}", flush=True)
    dt_e, l_e, p_e = step_time(True)
    print(f"embed=True : {dt_e*1e3:.1f} ms/step, {B/dt_e:.1f} utt/s, "
          f"loss3={l_e:.6f}, |params|3={p_e:.4f}", flush=True)
    print(f"delta: {(dt_x-dt_e)*1e3:+.2f} ms "
          f"({(B/dt_e - B/dt_x):+.1f} utt/s), "
          f"loss rel delta {abs(l_e-l_x)/(abs(l_x)+1e-9):.2e}, "
          f"param-norm rel delta {abs(p_e-p_x)/(p_x+1e-9):.2e}",
          flush=True)
