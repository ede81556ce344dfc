"""Training-path roofline measurement (VERDICT r1 next-round #1;
BASELINE north star: "training utterances/sec/chip at XLA roofline").

For each batch size: times the flagship (vctk-multi, T=7680) train
step on the real chip, reads XLA's own FLOP count for the compiled
program, and reports MFU against the v5e bf16 peak (197 TFLOP/s) plus
an *achievable* roofline that accounts for MXU tile quantisation (the
model's contractions have K=64 reduction depth vs the 128-wide MXU, so
the attainable peak on those ops is ~50% of nominal).

Usage:
  python scripts/train_roofline.py [--batches 8,16,24,32,48,64]
      [--remat] [--profile-batch N] [--steps 10]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import numpy as np

V5E_BF16_PEAK = 197e12  # FLOP/s per chip
V5E_HBM_BW = 819e9      # bytes/s


def analytical_flops(cfg, batch: int) -> dict:
    """Hand-derived FLOP count of one train step (fwd + ~2x bwd)."""
    from vqvae_tpu.utils.flops import train_step_flops
    step = train_step_flops(cfg, batch)
    return {"fwd_gflops": step / 3 / 1e9, "step_gflops": step / 1e9}


def bench_batch(cfg_base, B: int, steps: int, profile: bool,
                out_dir: str) -> dict:
    from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
    from vqvae_tpu.train import create_train_state, make_train_step

    cfg = cfg_base.replace(train=dataclasses.replace(
        cfg_base.train, batch_size=B))
    mesh = make_mesh(devices=jax.devices()[:1])
    jit_for, shardings_of = make_train_step(cfg, mesh)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    sh = shardings_of(state)
    state = jax.device_put(state, sh)
    step = jit_for(sh)

    rng = np.random.default_rng(0)
    bsh = batch_sharding(mesh)
    wav = jax.device_put(rng.uniform(
        -0.9, 0.9, (B, cfg.data.length + 1)).astype(np.float32), bsh)
    spk = jax.device_put(
        (np.arange(B) % cfg.model.n_speakers).astype(np.int32), bsh)

    compiled = step.lower(state, wav, spk).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    xla_flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    try:
        mem = compiled.memory_analysis()
        temp_mb = getattr(mem, "temp_size_in_bytes", 0) / 1e6
    except Exception:
        temp_mb = float("nan")

    for _ in range(3):
        state, metrics = step(state, wav, spk)
    jax.device_get(metrics["loss"])
    if profile:
        jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, wav, spk)
    jax.device_get(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    if profile:
        jax.profiler.stop_trace()

    ana = analytical_flops(cfg, B)
    # MFU from the analytic count: XLA's cost_analysis cannot see
    # inside Pallas custom calls (decoder_kernel="pallas")
    mfu = ana["step_gflops"] * 1e9 / dt / V5E_BF16_PEAK
    return {
        "batch": B,
        "remat": cfg.model.remat,
        "decoder_kernel": cfg.model.decoder_kernel,
        "head_kernel": cfg.model.head_kernel,
        "ms_per_step": round(dt * 1e3, 2),
        "utt_per_s": round(B / dt, 1),
        "xla_step_tflops": round(xla_flops / 1e12, 3),
        "analytic_step_tflops": round(ana["step_gflops"] / 1e3, 3),
        "xla_bytes_gb": round(bytes_acc / 1e9, 2),
        "hbm_bound_ms": round(bytes_acc / V5E_HBM_BW * 1e3, 2),
        "mxu_bound_ms": round(xla_flops / V5E_BF16_PEAK * 1e3, 2),
        "temp_mb": round(temp_mb, 1),
        "mfu": round(mfu, 4),
        "mfu_vs_k64_achievable": round(2 * mfu, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,24,32,48,64")
    ap.add_argument("--decoder-kernel", default=None,
                    choices=["xla", "pallas", "pallas_sg"])
    ap.add_argument("--head-kernel", default=None,
                    choices=["xla", "pallas"])
    ap.add_argument("--embed-in-kernel", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--profile-batch", type=int, default=0)
    ap.add_argument("--out", default="/tmp/roofline_profile")
    args = ap.parse_args()

    from vqvae_tpu.configs import get_config
    cfg = get_config("vctk-multi")
    if args.remat:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    remat=True))
    if args.decoder_kernel:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, decoder_kernel=args.decoder_kernel))
    if args.head_kernel:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, head_kernel=args.head_kernel))
    if args.embed_in_kernel:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, embed_in_kernel=True))
    print(f"device: {jax.devices()[0].device_kind}, "
          f"flagship T={cfg.data.length}, remat={cfg.model.remat}")
    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        r = bench_batch(cfg, B, args.steps,
                        profile=(B == args.profile_batch), out_dir=args.out)
        rows.append(r)
        print(json.dumps(r), flush=True)
    keys = list(rows[0].keys())
    print("\n| " + " | ".join(keys) + " |")
    print("|" + "---|" * len(keys))
    for r in rows:
        print("| " + " | ".join(str(r[k]) for k in keys) + " |")


if __name__ == "__main__":
    main()
