"""Fused strided-conv encoder kernel (Pallas/TPU) — BASELINE north
star: "the strided-conv encoder ... become[s a] Pallas kernel".

Why a kernel (measured, docs/PERF.md "encoder"): XLA runs the 6-layer
stride-2 stack as 6 convs + 6 ReLUs + the 1x1 proj, each round-tripping
its [B,T_i,C] activations through HBM, and the C_in=1 first layer pads
to 128 lanes; the whole encoder is ~2% of the step's FLOPs but ~5% of
its time. Here the first (scalar-input) layer runs as a folded matmul
at the XLA level — bandwidth-bound, and its 1/2-lane shapes inside a
kernel made Mosaic's compile pathological (measured >40 min) — and the
remaining uniform-width layers + ReLUs + the latent projection are ONE
kernel per batch group: the layer-1 block loads once, every
intermediate lives in VMEM, and each layer is a handful of MXU
matmuls.

Math (same folding as ops/conv.py::strided_conv_apply, equality pinned
there against lax.conv_general_dilated): a SAME stride-s kernel-k conv
with T % s == 0 folds time into channels, f[m] = x[ms:(m+1)s] of width
s*C, and becomes y = sum_q shift(f, -q) @ W_q with the k taps grouped
by folded-block offset q into packed matrices W_q [s*C, C_out]
(packing/unpacking happens in the wrapper, so the public param tree
keeps the reference's [k, C_in, C_out] conv layout).

The backward kernel recomputes the forward into VMEM scratch (the
layer inputs), then walks the layers in reverse, accumulating all
weight/bias grads across the sequential batch grid — the same
flash-attention-style structure as kernels/wavenet_train_pallas.py.

Exactness vs models/encoder.apply_encoder (the XLA shadow reference)
is pinned in tests/test_kernels.py (forward AND gradients).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tap_groups(k: int, s: int) -> Tuple[Tuple[int, Tuple[Tuple[int, int], ...]], ...]:
    """Taps j grouped by folded-block offset q: ((q, ((r, j), ...)), ...)."""
    pad = (k - s) // 2
    groups: Dict[int, list] = {}
    for j in range(k):
        q, r = divmod(j - pad, s)
        groups.setdefault(q, []).append((r, j))
    return tuple(sorted((q, tuple(rj)) for q, rj in groups.items()))


def _pack_wq(w: jax.Array, s: int) -> jax.Array:
    """``[k, C, Co]`` conv weights -> packed ``[nq, s*C, Co]``."""
    k, C, Co = w.shape
    out = []
    for _, rj in _tap_groups(k, s):
        wq = jnp.zeros((s * C, Co), w.dtype)
        for r, j in rj:
            wq = wq.at[r * C:(r + 1) * C].set(w[j])
        out.append(wq)
    return jnp.stack(out)


def _shift(x: jax.Array, n: int) -> jax.Array:
    """Shift along axis -2 by n (n>0 -> right/causal), zero-filled."""
    if n == 0:
        return x
    T = x.shape[-2]
    pad = [(0, 0)] * x.ndim
    if n > 0:
        pad[-2] = (n, 0)
        return jnp.pad(x, pad)[..., :T, :]
    pad[-2] = (0, -n)
    return jnp.pad(x, pad)[..., -n:, :]


def _layer_fwd(qs, f, wq_of, bias):
    """f ``[G, M, sC]`` folded input -> post-ReLU ``[G, M, Co]``."""
    y = None
    for qi, (q, _) in enumerate(qs):
        t = jnp.dot(_shift(f, -q).reshape(f.shape[0] * f.shape[1], -1),
                    wq_of(qi), preferred_element_type=jnp.float32)
        y = t if y is None else y + t
    y = y.reshape(f.shape[0], f.shape[1], -1) + bias.astype(jnp.float32)
    return jax.nn.relu(y)


def _fwd_kernel(s: int, k: int, L: int, cdt,
                h_ref, wr_ref, br_ref, wp_ref, bp_ref,
                z_ref):
    qs = _tap_groups(k, s)
    G = h_ref.shape[0]
    h = h_ref[...].astype(cdt)                       # [G, M0, Ce]
    for i in range(L):
        C = h.shape[-1]
        f = h.reshape(G, h.shape[1] // s, s * C)
        wq_of = lambda qi: wr_ref[i, qi].astype(cdt)
        h = _layer_fwd(qs, f, wq_of, br_ref[i]).astype(cdt)
    M = h.shape[1]
    z = (jnp.dot(h.reshape(G * M, -1), wp_ref[...].astype(cdt),
                 preferred_element_type=jnp.float32)
         + bp_ref[...].astype(jnp.float32))
    z_ref[...] = z.reshape(G, M, -1)


def _bwd_kernel(s: int, k: int, L: int, cdt,
                h_ref, wr_ref, br_ref, wp_ref, bp_ref,
                dz_ref,
                dh0_ref, dwr_ref, dbr_ref, dwp_ref,
                dbp_ref, *hall):
    qs = _tap_groups(k, s)
    b = pl.program_id(0)
    G = h_ref.shape[0]

    # pass 1: recompute the forward, parking every layer's post-ReLU
    # output (the next layer's input AND its own ReLU mask) in VMEM
    h = h_ref[...].astype(cdt)
    for i in range(L):
        C = h.shape[-1]
        f = h.reshape(G, h.shape[1] // s, s * C)
        wq_of = lambda qi: wr_ref[i, qi].astype(cdt)
        h = _layer_fwd(qs, f, wq_of, br_ref[i]).astype(cdt)
        hall[i][...] = h

    @pl.when(b == 0)
    def _init():
        dwr_ref[...] = jnp.zeros(dwr_ref.shape, jnp.float32)
        dbr_ref[...] = jnp.zeros(dbr_ref.shape, jnp.float32)
        dwp_ref[...] = jnp.zeros(dwp_ref.shape, jnp.float32)
        dbp_ref[...] = jnp.zeros(dbp_ref.shape, jnp.float32)

    # pass 2: reverse sweep
    dz = dz_ref[...]                                 # [G, M, d] f32
    hL = hall[L - 1][...]
    M = hL.shape[1]
    dz_f = dz.reshape(G * M, -1).astype(cdt)
    hL_f = hL.reshape(G * M, -1)
    dwp_ref[...] += jnp.dot(hL_f.T, dz_f,
                            preferred_element_type=jnp.float32)
    dbp_ref[...] += jnp.sum(dz.reshape(G * M, -1), axis=0)
    dh = jnp.dot(dz_f, wp_ref[...].astype(cdt).T,
                 preferred_element_type=jnp.float32).reshape(G, M, -1)

    for i in reversed(range(L)):
        hout = hall[i][...].astype(jnp.float32)      # [G, M_i, Ce]
        # ReLU adjoint; compare in f32 (v5e Mosaic rejects bf16 cmpf)
        dy = jnp.where(hout > 0, dh, 0.0)
        dbr_ref[i] += jnp.sum(dy.reshape(-1, dy.shape[-1]), axis=0)
        hin = (h_ref[...].astype(cdt) if i == 0
               else hall[i - 1][...])
        C = hin.shape[-1]
        Mi = hin.shape[1] // s
        f = hin.reshape(G, Mi, s * C)
        dy_f = dy.reshape(G * Mi, -1).astype(cdt)
        df = None
        for qi, (q, _) in enumerate(qs):
            fq = _shift(f, -q).reshape(G * Mi, -1)
            dwq = jnp.dot(fq.T, dy_f,
                          preferred_element_type=jnp.float32)
            wq = wr_ref[i, qi]
            dwr_ref[i, qi] += dwq
            t = _shift(jnp.dot(dy_f, wq.astype(cdt).T,
                               preferred_element_type=jnp.float32
                               ).reshape(G, Mi, s * C), q)
            df = t if df is None else df + t
        dh = df.reshape(G, Mi * s, C)
    dh0_ref[...] = dh.astype(dh0_ref.dtype)


def _grp(G: int, *shape):
    return pl.BlockSpec((G,) + shape,
                        lambda b: (b,) + tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _cst(*shape):
    return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _group_of(B: int, want: int) -> int:
    while want > 1 and B % want:
        want //= 2
    return max(1, want)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _enc_stack(meta, interpret, h, wr, br, wp, bp):
    """meta = (s, k, L, cdt_name); h [B,M0,Ce] (the first layer's
    post-ReLU output) -> z [B, M0/s**L, d] f32."""
    return _enc_fwd_call(meta, interpret, h, wr, br, wp, bp)


def _enc_fwd_call(meta, interpret, h, wr, br, wp, bp):
    s, k, L, cdt_name = meta
    cdt = jnp.dtype(cdt_name)
    B, M0, Ce = h.shape
    d = wp.shape[-1]
    nq = wr.shape[1]
    Mz = M0 // s ** L
    G = _group_of(B, 8)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s, k, L, cdt),
        grid=(B // G,),
        in_specs=[
            _grp(G, M0, Ce),                 # h
            _cst(L, nq, s * Ce, Ce),         # wr
            _cst(L, Ce),                     # br
            _cst(Ce, d),                     # wp
            _cst(d,),                        # bp
        ],
        out_specs=[_grp(G, Mz, d)],
        out_shape=[jax.ShapeDtypeStruct((B, Mz, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(h, wr, br, wp, bp)[0]


def _enc_vjp_fwd(meta, interpret, h, wr, br, wp, bp):
    z = _enc_fwd_call(meta, interpret, h, wr, br, wp, bp)
    return z, (h, wr, br, wp, bp)


def _enc_vjp_bwd(meta, interpret, res, dz):
    s, k, L, cdt_name = meta
    cdt = jnp.dtype(cdt_name)
    h, wr, br, wp, bp = res
    B, M0, Ce = h.shape
    d = wp.shape[-1]
    nq = wr.shape[1]
    G = _group_of(B, 4)
    f32 = jnp.float32
    # per-layer post-ReLU outputs parked across the reverse sweep
    hall = [pltpu.VMEM((G, M0 // s ** (i + 1), Ce), cdt)
            for i in range(L)]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, s, k, L, cdt),
        grid=(B // G,),
        in_specs=[
            _grp(G, M0, Ce),
            _cst(L, nq, s * Ce, Ce),
            _cst(L, Ce),
            _cst(Ce, d),
            _cst(d,),
            _grp(G, M0 // s ** L, d),        # dz
        ],
        out_specs=[
            _grp(G, M0, Ce),                 # dh0
            _cst(L, nq, s * Ce, Ce),         # dwr (grid-accumulated)
            _cst(L, Ce),
            _cst(Ce, d),
            _cst(d,),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M0, Ce), h.dtype),
            jax.ShapeDtypeStruct((L, nq, s * Ce, Ce), f32),
            jax.ShapeDtypeStruct((L, Ce), f32),
            jax.ShapeDtypeStruct((Ce, d), f32),
            jax.ShapeDtypeStruct((d,), f32),
        ],
        scratch_shapes=hall,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(h, wr, br, wp, bp, dz)
    dh0, dwr, dbr, dwp, dbp = out
    return (dh0, dwr.astype(wr.dtype), dbr.astype(br.dtype),
            dwp.astype(wp.dtype), dbp.astype(bp.dtype))


_enc_stack.defvjp(_enc_vjp_fwd, _enc_vjp_bwd)


def encoder_pallas(params: Dict, cfg, wav: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """Drop-in for models/encoder.apply_encoder (``[B,T] -> z_e`` f32);
    same param tree.  The scalar->Ce first layer runs as a folded
    matmul at the XLA level (bandwidth-bound; its degenerate 1/2-lane
    shapes inside the kernel sent Mosaic's compile time pathological —
    measured >40 min vs seconds for this split), and the remaining
    uniform-width layers + the latent projection run in ONE fused
    kernel per batch group with every intermediate in VMEM.
    Requires a uniform layer width (cfg.enc_channels) and
    T % stride**enc_layers == 0 — true for every preset."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from vqvae_tpu.ops.conv import strided_conv_apply
    s, k, L = cfg.enc_stride, cfg.enc_kernel, cfg.enc_layers
    cdt = cfg.cdtype
    layers = params["layers"]
    h = jax.nn.relu(strided_conv_apply(layers[0], wav[..., None], s,
                                       cdt))
    if L == 1:
        w = params["proj"]["w"].astype(cdt)
        z = h @ w + params["proj"]["b"].astype(cdt)
        return z.astype(jnp.float32)
    wr = jnp.stack([_pack_wq(l["w"], s) for l in layers[1:]])
    br = jnp.stack([l["b"] for l in layers[1:]])
    meta = (s, k, L - 1, cfg.compute_dtype)
    return _enc_stack(meta, interpret, h, wr, br,
                      params["proj"]["w"], params["proj"]["b"])
