"""Fused gated-residual WaveNet *training* kernels (Pallas/TPU) —
BASELINE north star: "the WaveNet decoder's dilated causal
gated-residual stacks become Pallas kernels" (training path; the decode
loop kernel lives in kernels/decode_pallas.py).

Why a kernel: XLA lowers one training layer to a pile of HBM-bound
fusions — the [B,T,2R] gate preactivations, tanh/sigmoid products and
pad+slice copies all round-trip HBM, the step sits at <25% MFU, and
per-op time collapses superlinearly when B doubles (docs/PERF.md).

Design (v2 — the per-layer variant measured slower than XLA at B<=16
because every layer re-read cond and paid 128-lane padding on [T,64]
blocks):

* ONE kernel runs a *chunk* of up to 15 layers for one batch element
  (grid over B, layers statically unrolled so every dilated shift is a
  static slice).  h and cond are read once per chunk; the only fwd
  outputs are the chunk's skip sum [T,S] and the chunk-boundary h.
* The backward kernel RECOMPUTES the chunk forward, parking each
  layer's input in VMEM scratch (flash-attention-style), then walks the
  layers in reverse producing dh, dcond, and — accumulated across the
  sequential batch grid — all weight gradients.  No activation tensor
  between fwd and bwd ever touches HBM.
* The skip projection (z @ ws) runs in-kernel so dskips is consumed
  directly; per-layer biases are summed once at the XLA level.
* Chunking (<=15 layers) keeps the scratch + block VMEM budget under
  ~80 MB for the flagship T=7680; chunks chain at the XLA level and
  compose with jax.checkpoint.

Shapes per chunk (nl layers): h [B,T,R], cond [B,T,d], gc [B,nl,2R]
(global cond + conv bias, per layer), wff [nl,2R,2R] (two taps
vstacked), vc [nl,d,2R], wr [nl,R,R], br [nl,R], ws [nl,R,S].
Exactness vs the lax path in models/wavenet.apply_decoder is pinned in
tests/test_kernels.py (forward AND gradients).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 10 == the reference's dilation-cycle length (n_layer), so every chunk
# of the flagship's 3x10 stack has identical dilations -> ONE compiled
# kernel reused for all chunks (3x less Mosaic compile time), and the
# VMEM scratch stays ~20 MB at T=7680
MAX_CHUNK_LAYERS = 10


def _shift_right(x: jax.Array, n: int) -> jax.Array:
    if n == 0:
        return x
    return jnp.concatenate(
        [jnp.zeros((n,) + x.shape[1:], x.dtype), x[:-n]], axis=0)


def _shift_left(x: jax.Array, n: int) -> jax.Array:
    if n == 0:
        return x
    return jnp.concatenate(
        [x[n:], jnp.zeros((n,) + x.shape[1:], x.dtype)], axis=0)


def _u_of(h, cond, gc_ref, wff_ref, vc_ref, li, dil):
    ph = jnp.concatenate([_shift_right(h, dil), h], axis=-1)  # [T, 2R]
    u = (jnp.dot(ph, wff_ref[li], preferred_element_type=jnp.float32)
         + jnp.dot(cond, vc_ref[li],
                   preferred_element_type=jnp.float32)
         + gc_ref[0, li].astype(jnp.float32))
    return ph, u


def _fwd_kernel(dils: Tuple[int, ...], R: int,
                h_ref, cond_ref, gc_ref, wff_ref, vc_ref, wr_ref,
                br_ref, ws_ref,
                hout_ref, skips_ref):
    cdt = h_ref.dtype
    h = h_ref[0]                                     # [T, R]
    cond = cond_ref[0]
    skips = jnp.zeros((h.shape[0], ws_ref.shape[-1]), jnp.float32)
    for li, dil in enumerate(dils):
        _, u = _u_of(h, cond, gc_ref, wff_ref, vc_ref, li, dil)
        z = (jnp.tanh(u[:, :R]) * jax.nn.sigmoid(u[:, R:])).astype(cdt)
        h = (h + jnp.dot(z, wr_ref[li],
                         preferred_element_type=jnp.float32).astype(cdt)
             + br_ref[li].astype(cdt))
        skips = skips + jnp.dot(z, ws_ref[li],
                                preferred_element_type=jnp.float32)
    hout_ref[0] = h
    skips_ref[0] = skips.astype(cdt)


def _bwd_kernel(dils: Tuple[int, ...], R: int,
                h_ref, cond_ref, gc_ref, wff_ref, vc_ref, wr_ref,
                br_ref, ws_ref, dhout_ref, dskips_ref,
                dh_ref, dcond_ref, dgc_ref, dwff_ref, dvc_ref,
                dwr_ref, dbr_ref, dws_ref,
                hall_ref):
    cdt = h_ref.dtype
    b = pl.program_id(0)
    nl = len(dils)
    cond = cond_ref[0]
    dskips = dskips_ref[0].astype(cdt)               # [T, S]

    # pass 1: recompute the chunk forward, parking layer inputs in VMEM
    h = h_ref[0]
    for li, dil in enumerate(dils):
        hall_ref[li] = h
        _, u = _u_of(h, cond, gc_ref, wff_ref, vc_ref, li, dil)
        z = (jnp.tanh(u[:, :R]) * jax.nn.sigmoid(u[:, R:])).astype(cdt)
        h = (h + jnp.dot(z, wr_ref[li],
                         preferred_element_type=jnp.float32).astype(cdt)
             + br_ref[li].astype(cdt))

    # pass 2: reverse sweep
    dh = dhout_ref[0].astype(jnp.float32)            # [T, R]
    dcond = jnp.zeros(cond.shape, jnp.float32)

    @pl.when(b == 0)
    def _init():
        dwff_ref[:] = jnp.zeros(dwff_ref.shape, jnp.float32)
        dvc_ref[:] = jnp.zeros(dvc_ref.shape, jnp.float32)
        dwr_ref[:] = jnp.zeros(dwr_ref.shape, jnp.float32)
        dbr_ref[:] = jnp.zeros(dbr_ref.shape, jnp.float32)
        dws_ref[:] = jnp.zeros(dws_ref.shape, jnp.float32)

    for li in reversed(range(nl)):
        dil = dils[li]
        hin = hall_ref[li]
        ph, u = _u_of(hin, cond, gc_ref, wff_ref, vc_ref, li, dil)
        ta = jnp.tanh(u[:, :R])
        sb = jax.nn.sigmoid(u[:, R:])
        z = (ta * sb).astype(cdt)

        dh_c = dh.astype(cdt)
        # h_{li+1} = h_li + z @ wr + br ; skips += z @ ws
        dbr_ref[li] += jnp.sum(dh, axis=0)
        dwr_ref[li] += jnp.dot(z.T, dh_c,
                               preferred_element_type=jnp.float32)
        dws_ref[li] += jnp.dot(z.T, dskips,
                               preferred_element_type=jnp.float32)
        dz = (jnp.dot(dh_c, wr_ref[li].T,
                      preferred_element_type=jnp.float32)
              + jnp.dot(dskips, ws_ref[li].T,
                        preferred_element_type=jnp.float32))
        da = dz * sb * (1.0 - ta * ta)
        db = dz * ta * sb * (1.0 - sb)
        du = jnp.concatenate([da, db], axis=-1).astype(cdt)  # [T, 2R]

        dgc_ref[0, li] = jnp.sum(du.astype(jnp.float32), axis=0)
        dwff_ref[li] += jnp.dot(ph.T, du,
                                preferred_element_type=jnp.float32)
        dvc_ref[li] += jnp.dot(cond.T, du,
                               preferred_element_type=jnp.float32)
        dcond = dcond + jnp.dot(du, vc_ref[li].T,
                                preferred_element_type=jnp.float32)
        dph = jnp.dot(du, wff_ref[li].T,
                      preferred_element_type=jnp.float32)    # [T, 2R]
        dh = dh + dph[:, R:] + _shift_left(dph[:, :R], dil)

    dh_ref[0] = dh.astype(cdt)
    dcond_ref[0] = dcond.astype(cdt)


def _const_spec(*shape):
    return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _batch_spec(*shape):
    return pl.BlockSpec((1,) + shape,
                        lambda b: (b,) + tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_stack_chunk(dils: Tuple[int, ...], interpret: bool,
                      h, cond, gc, wff, vc, wr, br, ws
                      ) -> Tuple[jax.Array, jax.Array]:
    """nl-layer chunk: returns (h_out [B,T,R], skips [B,T,S])."""
    return _chunk_fwd_call(dils, interpret, h, cond, gc, wff, vc, wr,
                           br, ws)


def _chunk_fwd_call(dils, interpret, h, cond, gc, wff, vc, wr, br, ws):
    B, T, R = h.shape
    d = cond.shape[-1]
    nl = len(dils)
    S = ws.shape[-1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dils, R),
        grid=(B,),
        in_specs=[
            _batch_spec(T, R),              # h
            _batch_spec(T, d),              # cond
            _batch_spec(nl, 2 * R),         # gc  [B,nl,2R]
            _const_spec(nl, 2 * R, 2 * R),  # wff
            _const_spec(nl, d, 2 * R),      # vc
            _const_spec(nl, R, R),          # wr
            _const_spec(nl, R),             # br
            _const_spec(nl, R, S),          # ws
        ],
        out_specs=[_batch_spec(T, R), _batch_spec(T, S)],
        out_shape=[jax.ShapeDtypeStruct((B, T, R), h.dtype),
                   jax.ShapeDtypeStruct((B, T, S), h.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(h, cond, gc, wff, vc, wr, br, ws)
    return out[0], out[1]


def _chunk_vjp_fwd(dils, interpret, h, cond, gc, wff, vc, wr, br, ws):
    out = _chunk_fwd_call(dils, interpret, h, cond, gc, wff, vc, wr,
                          br, ws)
    return out, (h, cond, gc, wff, vc, wr, br, ws)


def _chunk_vjp_bwd(dils, interpret, res, cots):
    h, cond, gc, wff, vc, wr, br, ws = res
    dhout, dskips = cots
    B, T, R = h.shape
    d = cond.shape[-1]
    nl = len(dils)
    S = ws.shape[-1]
    f32 = jnp.float32
    dh, dcond, dgc, dwff, dvc, dwr, dbr, dws = pl.pallas_call(
        functools.partial(_bwd_kernel, dils, R),
        grid=(B,),
        in_specs=[
            _batch_spec(T, R),              # h
            _batch_spec(T, d),              # cond
            _batch_spec(nl, 2 * R),         # gc
            _const_spec(nl, 2 * R, 2 * R),  # wff
            _const_spec(nl, d, 2 * R),      # vc
            _const_spec(nl, R, R),          # wr
            _const_spec(nl, R),             # br
            _const_spec(nl, R, S),          # ws
            _batch_spec(T, R),              # dhout
            _batch_spec(T, S),              # dskips
        ],
        out_specs=[
            _batch_spec(T, R),              # dh
            _batch_spec(T, d),              # dcond
            _batch_spec(nl, 2 * R),         # dgc [B,nl,2R]
            _const_spec(nl, 2 * R, 2 * R),  # dwff (grid-accumulated)
            _const_spec(nl, d, 2 * R),      # dvc
            _const_spec(nl, R, R),          # dwr
            _const_spec(nl, R),             # dbr
            _const_spec(nl, R, S),          # dws
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, R), h.dtype),
            jax.ShapeDtypeStruct((B, T, d), cond.dtype),
            jax.ShapeDtypeStruct((B, nl, 2 * R), f32),
            jax.ShapeDtypeStruct((nl, 2 * R, 2 * R), f32),
            jax.ShapeDtypeStruct((nl, d, 2 * R), f32),
            jax.ShapeDtypeStruct((nl, R, R), f32),
            jax.ShapeDtypeStruct((nl, R), f32),
            jax.ShapeDtypeStruct((nl, R, S), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nl, T, R), h.dtype),  # recomputed layer inputs
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(h, cond, gc, wff, vc, wr, br, ws, dhout, dskips)
    return (dh, dcond, dgc.astype(gc.dtype), dwff.astype(wff.dtype),
            dvc.astype(vc.dtype), dwr.astype(wr.dtype),
            dbr.astype(br.dtype), dws.astype(ws.dtype))


fused_stack_chunk.defvjp(_chunk_vjp_fwd, _chunk_vjp_bwd)


def decoder_stack_pallas(params: dict, cfg, h: jax.Array,
                         cond: jax.Array, gcond: jax.Array,
                         interpret: bool | None = None) -> jax.Array:
    """The full L-layer gated-residual stack on fused chunk kernels.

    h ``[B,T,R]`` embedded inputs, cond ``[B,T,d]``, gcond ``[L,B,2R]``
    (conv bias folded).  Returns skips ``[B,T,S]`` — same contract as
    the layer loop inside models/wavenet.apply_decoder, which remains
    the shadow reference (tests/test_kernels.py).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cdt = cfg.cdtype
    lay = params["layers"]
    wf = lay["wf"].astype(cdt)                        # [L, 2, R, 2R]
    wff = jnp.concatenate([wf[:, 0], wf[:, 1]], axis=1)   # [L, 2R, 2R]
    vc = lay["vc"].astype(cdt)
    wr = lay["wr"].astype(cdt)
    br = lay["br"].astype(cdt)
    ws = lay["ws"].astype(cdt)                        # [L, R, S]
    bs = lay["bs"].astype(cdt)                        # [L, S]
    gct = jnp.swapaxes(gcond, 0, 1).astype(cdt)       # [B, L, 2R]

    dils = cfg.dilations
    L = len(dils)
    n_chunks = -(-L // MAX_CHUNK_LAYERS)
    per = -(-L // n_chunks)

    chunk = fused_stack_chunk
    if cfg.remat:
        chunk = jax.checkpoint(fused_stack_chunk, static_argnums=(0, 1))

    cond = cond.astype(cdt)
    skips = None
    for l0 in range(0, L, per):
        l1 = min(l0 + per, L)
        h, s = chunk(tuple(dils[l0:l1]), interpret, h, cond,
                     gct[:, l0:l1], wff[l0:l1], vc[l0:l1], wr[l0:l1],
                     br[l0:l1], ws[l0:l1])
        skips = s if skips is None else skips + s
    return skips + jnp.sum(bs, axis=0).astype(cdt)
