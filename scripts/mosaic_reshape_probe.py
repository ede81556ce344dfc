"""Which reshapes does Mosaic accept on this jaxlib?  The cond-in-
kernel design needs SOME latent-rate -> audio-rate untile inside the
kernel ([N, hop*d] -> [N*hop, d] or equivalent).  Each candidate runs
in its own tiny pallas_call; prints ok/FAIL per case.

Measured on the real chip (round 5, docs/PERF.md "Packed-matmul
upsampler"): minor-dim untile/split FAIL; 3D leading collapse,
sublane split/collapse, and the matmul->untile->matmul composition's
reshape all blocked -> cond-in-kernel is Mosaic-blocked; the upsample
moved to two packed XLA matmuls instead.  Re-run when jaxlib moves."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, hop, d = 32, 64, 64


def _case(name, body, in_shape, out_shape):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(in_shape), jnp.float32)
    try:
        out = pl.pallas_call(
            body,
            in_specs=[pl.BlockSpec(in_shape,
                                   lambda: (0,) * len(in_shape),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shape,
                                   lambda: (0,) * len(out_shape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(x)
        ref = np.asarray(x).reshape(out_shape)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"{name}: compiled, values {'MATCH' if ok else 'WRONG'}",
              flush=True)
    except Exception as exc:  # noqa: BLE001
        msg = str(exc).splitlines()[0][:110]
        print(f"{name}: FAIL ({msg})", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)

    def r1(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(N * hop, d)
    _case("2D minor untile  [N, hop*d] -> [N*hop, d]", r1,
          (N, hop * d), (N * hop, d))

    def r2(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(N * hop, d)
    _case("3D collapse      [N, hop, d] -> [N*hop, d]", r2,
          (N, hop, d), (N * hop, d))

    def r3(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(N, hop, d)
    _case("2D minor split   [N, hop*d] -> [N, hop, d]", r3,
          (N, hop * d), (N, hop, d))

    def r4(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(hop, d, N)
    _case("sublane split    [hop*d, N] -> [hop, d, N]", r4,
          (hop * d, N), (hop, d, N))

    def r5(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(hop * d, N)
    _case("sublane collapse [hop, d, N] -> [hop*d, N]", r5,
          (hop, d, N), (hop * d, N))

    # the composition the kernel actually needs: matmul -> untile ->
    # row-matmul, checked against the XLA equivalent
    K2 = hop * d

    def comp(x_ref, w_ref, v_ref, o_ref):
        a = jnp.dot(x_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32)  # [N, hop*d]
        rows = a.reshape(N * hop, d)
        o_ref[...] = jnp.dot(rows, v_ref[...],
                             preferred_element_type=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, K2)) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal((d, 128)) * 0.1, jnp.float32)
    try:
        out = pl.pallas_call(
            comp,
            in_specs=[pl.BlockSpec((N, d), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((d, K2), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((d, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N * hop, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N * hop, 128), jnp.float32),
        )(x, w, v)
        ref = ((x @ w).reshape(N * hop, d)) @ v
        err = float(jnp.max(jnp.abs(out - ref))
                    / (float(jnp.max(jnp.abs(ref))) + 1e-9))
        print(f"composition matmul->untile->matmul: compiled, "
              f"rel err {err:.2e}", flush=True)
    except Exception as exc:  # noqa: BLE001
        print("composition: FAIL "
              f"({str(exc).splitlines()[0][:110]})", flush=True)


if __name__ == "__main__":
    main()
