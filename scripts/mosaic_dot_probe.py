"""Probe 2: which dot_general/einsum patterns Mosaic accepts — the
cond-in-kernel formulation that avoids minor-dim reshapes needs
[N, hop, d]-shaped intermediates produced/consumed by batched or
multi-contracting dots, plus the leading-dim split/collapse reshapes.

Measured on the real chip (round 5): ALL 3-D dots FAIL Mosaic
compilation (nd,rde->nre / nrd,rde->ne / nd,nre->dre); only the
leading-dim split reshape and time-axis pad/add/slice pass — not
enough to build cond in-kernel.  See docs/PERF.md "Packed-matmul
upsampler" for the negative study + the XLA-level fix that landed."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, hop, d, e = 32, 64, 64, 128
rng = np.random.default_rng(0)


def _try(name, body, ins, out_shape):
    try:
        out = pl.pallas_call(
            body,
            in_specs=[pl.BlockSpec(x.shape, lambda *a, s=x.shape:
                                   (0,) * len(s),
                                   memory_space=pltpu.VMEM)
                      for x in ins],
            out_specs=pl.BlockSpec(out_shape,
                                   lambda *a: (0,) * len(out_shape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*ins)
        return np.asarray(out)
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: FAIL ({str(exc).splitlines()[0][:100]})",
              flush=True)
        return None


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    ef = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((hop, d, d)) * 0.1, jnp.float32)
    dp = jnp.asarray(rng.standard_normal((N, hop, d)), jnp.float32)

    def b1(e_ref, w_ref, o_ref):
        o_ref[...] = jnp.einsum("nd,rde->nre", e_ref[...], w_ref[...],
                                preferred_element_type=jnp.float32)
    out = _try("einsum nd,rde->nre", b1, [ef, W], (N, hop, d))
    if out is not None:
        ref = np.einsum("nd,rde->nre", ef, W)
        print(f"einsum nd,rde->nre: ok, rel err "
              f"{np.max(np.abs(out-ref))/np.max(np.abs(ref)):.2e}",
              flush=True)

    def b2(dp_ref, w_ref, o_ref):
        o_ref[...] = jnp.einsum("nrd,rde->ne", dp_ref[...], w_ref[...],
                                preferred_element_type=jnp.float32)
    out = _try("einsum nrd,rde->ne (multi-contract)", b2, [dp, W],
               (N, d))
    if out is not None:
        ref = np.einsum("nrd,rde->ne", dp, W)
        print(f"einsum nrd,rde->ne: ok, rel err "
              f"{np.max(np.abs(out-ref))/np.max(np.abs(ref)):.2e}",
              flush=True)

    def b3(e_ref, dp_ref, o_ref):
        o_ref[...] = jnp.einsum("nd,nre->dre", e_ref[...], dp_ref[...],
                                preferred_element_type=jnp.float32)
    out = _try("einsum nd,nre->dre", b3, [ef, dp], (d, hop, d))
    if out is not None:
        ref = np.einsum("nd,nre->dre", ef, dp)
        print(f"einsum nd,nre->dre: ok, rel err "
              f"{np.max(np.abs(out-ref))/np.max(np.abs(ref)):.2e}",
              flush=True)

    # leading-dim SPLIT (reverse of the collapse that passed)
    big = jnp.asarray(rng.standard_normal((N * hop, d)), jnp.float32)

    def b4(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(N, hop, d)
    out = _try("reshape [N*hop, d] -> [N, hop, d]", b4, [big],
               (N, hop, d))
    if out is not None:
        ok = np.array_equal(out, np.asarray(big).reshape(N, hop, d))
        print(f"leading split: values {'MATCH' if ok else 'WRONG'}",
              flush=True)

    # pad + add + slice on the SUBLANE (time) axis of a 2-D [T, d]
    T = N * hop

    def b5(x_ref, o_ref):
        x = x_ref[...]
        y = (jnp.pad(x, ((0, hop), (0, 0)))
             + jnp.pad(x, ((hop, 0), (0, 0))))
        o_ref[...] = y[hop // 2: hop // 2 + T]
    out = _try("pad/add/slice on time axis", b5, [big], (T, d))
    if out is not None:
        x = np.asarray(big)
        ref = (np.pad(x, ((0, hop), (0, 0)))
               + np.pad(x, ((hop, 0), (0, 0))))[hop // 2: hop // 2 + T]
        print(f"pad/add/slice: values "
              f"{'MATCH' if np.allclose(out, ref) else 'WRONG'}",
              flush=True)


if __name__ == "__main__":
    main()
