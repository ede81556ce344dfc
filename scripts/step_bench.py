"""Measure the shipped flagship training step (stretch preset shapes:
pallas_sg + head+CE + embed_in_kernel) at B=64 on the real chip —
10-step best-of-reps wall time.  The single-config twin of
embed_kernel_bench.py, for quick A/B of step-level changes.

Usage: python scripts/step_bench.py [batch] [runs] [reps]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import numpy as np

from vqvae_tpu.configs import get_config
from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
from vqvae_tpu.train import create_train_state, make_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cfg = get_config("stretch")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=B))
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
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(runs):
            state, metrics = step(state, wav, spk)
        jax.device_get(metrics["loss"])
        dt = min(dt, (time.perf_counter() - t0) / runs)
    print(f"B={B}: {dt*1e3:.2f} ms/step, {B/dt:.1f} utt/s, "
          f"loss={loss0:.6f}", flush=True)


if __name__ == "__main__":
    main()
