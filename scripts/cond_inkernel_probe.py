"""Mosaic feasibility probe for computing the audio-rate condition
INSIDE the chunk kernels (VERDICT r5 #3: the training kernels read a
materialized [B,T,d] cond from HBM while e is hop=64x smaller; the
upsampler einsum fwd+bwd is 5.4 ms of HBM-bound work at B=64).

The open question is not math (the overlap-add identity is
upsample_apply's, ops/conv.py) but whether Mosaic accepts the minor-
dimension split reshape [N, K*d] -> [., ., K, d] and the pad/slice
overlap-add at kernel shapes.  This probe runs the forward AND the
backward contraction patterns standalone on the real chip and checks
against the XLA upsample_apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae_tpu.ops.conv import upsample_apply


def _cond_fwd_body(hop, T, e_ref, uw_ref, ub_ref, out_ref):
    G, Tl, din = e_ref.shape
    K = 2 * hop
    dout = ub_ref.shape[-1]
    a = jnp.dot(e_ref[...].reshape(G * Tl, din), uw_ref[...],
                preferred_element_type=jnp.float32)   # [G*Tl, K*dout]
    a = a.reshape(G, Tl, K, dout)
    p0 = a[:, :, :hop].reshape(G, Tl * hop, dout)
    p1 = a[:, :, hop:].reshape(G, Tl * hop, dout)
    y = (jnp.pad(p0, ((0, 0), (0, hop), (0, 0)))
         + jnp.pad(p1, ((0, 0), (hop, 0), (0, 0))))
    cond = y[:, hop // 2: hop // 2 + T] + ub_ref[0].astype(jnp.float32)
    out_ref[...] = cond.astype(out_ref.dtype)


def _cond_bwd_body(hop, T, dcond_ref, e_ref, uw_ref,
                   de_ref, duw_ref, dub_ref):
    """de = da @ uw.T ; duw += e.T @ da ; dub += sum(dcond) where
    da is the adjoint of the overlap-add."""
    b = pl.program_id(0)
    G, Tl, din = e_ref.shape
    K = 2 * hop
    dout = dcond_ref.shape[-1]
    dcond = dcond_ref[...].astype(jnp.float32)         # [G, T, dout]
    dy = jnp.pad(dcond, ((0, 0), (hop // 2, hop - hop // 2), (0, 0)))
    dp0 = dy[:, : Tl * hop].reshape(G, Tl, hop, dout)
    dp1 = dy[:, hop:].reshape(G, Tl, hop, dout)
    da = jnp.concatenate([dp0, dp1], axis=2).reshape(G * Tl, K * dout)
    da_c = da.astype(e_ref.dtype)
    e_f = e_ref[...].reshape(G * Tl, din)

    @pl.when(b == 0)
    def _init():
        duw_ref[...] = jnp.zeros(duw_ref.shape, jnp.float32)
        dub_ref[...] = jnp.zeros(dub_ref.shape, jnp.float32)

    de_ref[...] = jnp.dot(
        da_c, uw_ref[...].T, preferred_element_type=jnp.float32
    ).astype(de_ref.dtype).reshape(G, Tl, din)
    duw_ref[...] += jnp.dot(e_f.T, da_c,
                            preferred_element_type=jnp.float32)
    dub_ref[...] += jnp.sum(dcond, axis=(0, 1)).reshape(1, dout)


def main():
    hop, d, Tl, B, G = 64, 64, 16, 4, 2
    K, T = 2 * hop, Tl * hop
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, d, d)) * 0.1, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    e = jnp.asarray(rng.standard_normal((B, Tl, d)), jnp.float32)
    params = {"w": w, "b": bb}

    ref = upsample_apply(params, e, hop)               # [B, T, d]

    wfl = w[::-1]
    uwk = jnp.transpose(wfl, (1, 0, 2)).reshape(d, K * d)
    ub = bb.reshape(1, d)

    grid = (B // G,)
    gspec = lambda *s: pl.BlockSpec((G,) + s, lambda b: (b,) + (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    cspec = lambda *s: pl.BlockSpec(s, lambda b: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_cond_fwd_body, hop, T),
        grid=grid,
        in_specs=[gspec(Tl, d), cspec(d, K * d), cspec(1, d)],
        out_specs=gspec(T, d),
        out_shape=jax.ShapeDtypeStruct((B, T, d), jnp.float32),
    )(e, uwk, ub)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"fwd max rel err vs upsample_apply: {err:.2e}", flush=True)

    # backward contraction pattern + parity vs jax.vjp of upsample_apply
    dcond = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
    de, duw, dub = pl.pallas_call(
        functools.partial(_cond_bwd_body, hop, T),
        grid=grid,
        in_specs=[gspec(T, d), gspec(Tl, d), cspec(d, K * d)],
        out_specs=[gspec(Tl, d), cspec(d, K * d), cspec(1, d)],
        out_shape=[jax.ShapeDtypeStruct((B, Tl, d), jnp.float32),
                   jax.ShapeDtypeStruct((d, K * d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
    )(dcond, e, uwk)

    def f(e_, uwk_, ub_):
        w_ = jnp.transpose(uwk_.reshape(d, K, d), (1, 0, 2))[::-1]
        return upsample_apply({"w": w_, "b": ub_[0]}, e_, hop)

    _, vjp = jax.vjp(f, e, uwk, ub)
    de_r, duw_r, dub_r = vjp(dcond)
    for name, a, r in (("de", de, de_r), ("duw", duw, duw_r),
                       ("dub", dub, dub_r)):
        err = float(jnp.max(jnp.abs(a - r))
                    / (float(jnp.max(jnp.abs(r))) + 1e-9))
        print(f"bwd {name} max rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
