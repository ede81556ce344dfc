"""Microbenchmark behind docs/PERF.md "int8 decode kernel (measured
NEGATIVE result)": per-op cost of a sequential dependent matmul chain
at the fused decode kernel's exact shapes ([64,128]x[128,128], weights
VMEM-pinned, x -> x dependency like the 30-layer chain), bf16 vs int8
with i32 accumulation and f32 rescale.

Measured on one v5e core: bf16 483 ns/matmul, int8 612 ns (+27%) —
the chain is issue/latency-bound and int8's quantize/rescale sits ON
the dependency chain. Run: python scripts/decode_int8_micro.py (TPU).
"""
import time, json, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, R, L, STEPS = 64, 64, 30, 128

def body_bf16(x_ref, w_ref, o_ref):
    def step(s, x):
        for l in range(L):
            x = jnp.dot(x, w_ref[l], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        return x * 0.125  # keep magnitudes bounded
    x = jax.lax.fori_loop(0, STEPS, step, x_ref[...])
    o_ref[...] = x

def body_int8(x_ref, w_ref, scale_ref, o_ref):
    def step(s, x):
        for l in range(L):
            xi = jnp.clip(x * 127.0, -127, 127).astype(jnp.int8)
            acc = jnp.dot(xi, w_ref[l], preferred_element_type=jnp.int32)
            x = (acc.astype(jnp.float32) * scale_ref[l]).astype(jnp.float32)
            x = x * 0.0078125
        return x
    x = jax.lax.fori_loop(0, STEPS, step, x_ref[...].astype(jnp.float32))
    o_ref[...] = x.astype(jnp.bfloat16)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, 2*R)), jnp.bfloat16)
w16 = jnp.asarray(rng.normal(size=(L, 2*R, 2*R)) / 16, jnp.bfloat16)
w8 = jnp.asarray(rng.integers(-127, 127, (L, 2*R, 2*R)), jnp.int8)
sc = jnp.full((L, 1, 1), 1/127.0/16, jnp.float32)

f16 = pl.pallas_call(body_bf16,
    out_shape=jax.ShapeDtypeStruct((B, 2*R), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
f8 = pl.pallas_call(body_int8,
    out_shape=jax.ShapeDtypeStruct((B, 2*R), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*3,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

def timeit(f, *a, n=20):
    out = f(*a); jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    jax.device_get(out)
    return (time.perf_counter()-t0)/n

t16 = timeit(f16, x, w16)
t8 = timeit(f8, x, w8, sc)
print(json.dumps({
  "bf16_us_per_chainstep": round(t16/STEPS*1e6, 3),
  "int8_us_per_chainstep": round(t8/STEPS*1e6, 3),
  "per_matmul_ns_bf16": round(t16/STEPS/L*1e9, 1),
  "per_matmul_ns_int8": round(t8/STEPS/L*1e9, 1)}))
