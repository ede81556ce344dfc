"""int8 at the LARGE-batch synthesis regime (follow-up to
scripts/decode_int8_micro.py, which measured int8 NEGATIVE at B=64).

The B=64 fused-kernel chain is issue/latency-bound, so int8 lost there.
The headline throughput path is different: the lax scan step at B=2048
is MXU/VPU *streaming*-bound (docs/PERF.md "HBM-ring-buffer kernel"),
and v5e's int8 MXU peak is 2x bf16 — docs/PERF.md explicitly defers
int8 to "if it changes the streaming roofline itself".  This script
answers that with an A/B at the real step's dominant shape: a chain of
L=30 dependent [B,R]x[R,2R] matmuls each followed by the tanh*sigmoid
gate (the per-layer core of models/wavenet.py::decoder_step), bf16 vs
int8 weights+activations (i32 accumulation, f32 rescale, re-quantize
between layers), plus a no-gate bf16 chain to expose the VPU share.

Run: python scripts/decode_int8_bigbatch.py [--batch 2048]
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

R, L, STEPS = 64, 30, 64  # residual width, layers, chained scan steps


def run_chain(step_fn, x0, n=10):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, STEPS, step_fn, x)

    out = chain(x0)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = chain(out)
    jax.device_get(out)
    return (time.perf_counter() - t0) / n / STEPS  # s per scan step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.default_rng(0)
    w16 = jnp.asarray(rng.normal(size=(L, 2 * R, 4 * R)) / 16,
                      jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 128, (L, 2 * R, 4 * R)),
                     jnp.int8)
    sc = jnp.full((L, 1, 1), 1 / 127.0 / 16, jnp.float32)
    x16 = jnp.asarray(rng.normal(size=(B, 2 * R)), jnp.bfloat16)

    def gate(u):
        return (jnp.tanh(u[:, : 2 * R]) *
                jax.nn.sigmoid(u[:, 2 * R:])).astype(jnp.bfloat16)

    def step_bf16(s, x):
        for l in range(L):
            u = jnp.dot(x, w16[l], preferred_element_type=jnp.float32)
            x = gate(u)
        return x

    def step_bf16_nogate(s, x):
        for l in range(L):
            u = jnp.dot(x, w16[l], preferred_element_type=jnp.float32)
            x = (u[:, : 2 * R] * 0.125).astype(jnp.bfloat16)
        return x

    def step_int8(s, x):
        for l in range(L):
            xi = jnp.clip(x.astype(jnp.float32) * 127.0,
                          -127, 127).astype(jnp.int8)
            acc = jnp.dot(xi, w8[l], preferred_element_type=jnp.int32)
            u = acc.astype(jnp.float32) * sc[l]
            x = gate(u)
        return x

    t_bf = run_chain(step_bf16, x16)
    t_ng = run_chain(step_bf16_nogate, x16)
    t_i8 = run_chain(step_int8, x16)
    flops = 2 * B * (2 * R) * (4 * R) * L  # per scan step (matmuls only)
    print(json.dumps({
        "batch": B,
        "bf16_us_per_step": round(t_bf * 1e6, 2),
        "bf16_nogate_us_per_step": round(t_ng * 1e6, 2),
        "int8_us_per_step": round(t_i8 * 1e6, 2),
        "int8_vs_bf16": round(t_i8 / t_bf, 3),
        "gate_share_of_bf16": round((t_bf - t_ng) / t_bf, 3),
        "bf16_matmul_tflops": round(flops / t_ng / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
