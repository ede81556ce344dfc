"""Fused head + softmax-CE training kernel (Pallas/TPU).

Round-4 profile (docs/PERF.md "Measured decomposition"): the skip-head
matmuls plus the cross-entropy are 9.9% of the B=64 flagship step —
the largest non-kernel term — and every op in the chain reports
600–710 GB/s measured HBM bandwidth, i.e. the cost is ~8 HBM round
trips over skip-/logits-sized tensors (relu(skips), x1, the f32
[B,T,mu] logits, CE reads, dlogits, dx1, drelu, weight grads), not
scheduling.  This kernel runs the whole chain

    x0 = relu(skips); x1 = relu(x0 @ w1 + b1)
    logits = x1 @ w2 + b2;  loss1 = mean(logsumexp - picked)

and its backward over row tiles of the flattened [B*T, S] skips with
everything between skips and the scalar loss resident in VMEM: the
forward reads skips once and emits per-tile loss partials; the
backward re-reads skips, recomputes the tile forward
(flash-attention-style, mirroring kernels/wavenet_train_pallas.py),
and writes dskips plus grid-accumulated weight grads.  The f32
[B,T,mu] logits tensor — ~503 MB at flagship shapes, written and
re-read by the XLA lowering — never exists.

Numerics: matmuls are bf16 with f32 accumulation (``w2`` is cast from
its f32 parameter to the compute dtype, unlike the XLA head which
multiplies in f32), so loss/grads match the XLA path to bf16
tolerance, NOT bit-exactly — the same contract as the decoder training
kernels (pinned in tests/test_kernels.py; on-chip witness in bench.py
``kernel_parity``).  Off by default: ``head_kernel="pallas"`` opts in
(configs/presets.py); golden trajectories use the XLA path.

Reference parity: the head is ``net.py``'s ReLU→1x1→ReLU→1x1 output
stack and loss1 its softmax cross-entropy (SURVEY.md §2.1 loss
assembly); this is a lowering, not a behavior change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4096   # rows per grid step: [TILE, S] blocks keep every
# intermediate (x0/x1 bf16, logits/softmax f32) under ~20 MB of VMEM
# while the matmuls run at full 256-deep MXU occupancy


def _tile_forward(skips, tgt, w1_ref, b1_ref, w2_ref, b2_ref, mu):
    """Shared fwd math: returns (x0, x1, logits, lz, onehot)."""
    cdt = skips.dtype
    x0 = jnp.maximum(skips, 0)
    x1 = jnp.maximum(
        jnp.dot(x0, w1_ref[...],
                preferred_element_type=jnp.float32).astype(cdt)
        + b1_ref[0], 0)
    logits = (jnp.dot(x1, w2_ref[...],
                      preferred_element_type=jnp.float32)
              + b2_ref[0].astype(jnp.float32))          # [M, mu] f32
    m = jnp.max(logits, axis=-1, keepdims=True)
    ez = jnp.exp(logits - m)
    lz = jnp.log(jnp.sum(ez, axis=-1, keepdims=True)) + m   # [M, 1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
              == tgt).astype(jnp.float32)
    return x0, x1, logits, ez, lz, onehot


def _valid(i, M, n_rows):
    """Rows beyond the (padded) flat length contribute nothing."""
    return ((jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) + i * M)
            < n_rows).astype(jnp.float32)


def _fwd_kernel(mu, n_rows, skips_ref, tgt_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, out_ref):
    i = pl.program_id(0)
    M = skips_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = 0.0

    _, _, logits, _, lz, onehot = _tile_forward(
        skips_ref[...], tgt_ref[...], w1_ref, b1_ref, w2_ref, b2_ref,
        mu)
    picked = jnp.sum(logits * onehot, axis=-1, keepdims=True)
    # grid steps run sequentially on TPU: accumulate the loss sum in
    # the SMEM scalar output (a (1,1) VMEM tile violates Mosaic's 8x128
    # block minimum)
    out_ref[0, 0] += jnp.sum((lz - picked) * _valid(i, M, n_rows))


def _bwd_kernel(mu, n_rows, skips_ref, tgt_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, g_ref, dskips_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref):
    i = pl.program_id(0)
    M = skips_ref.shape[0]
    cdt = skips_ref.dtype

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros(dw1_ref.shape, jnp.float32)
        db1_ref[...] = jnp.zeros(db1_ref.shape, jnp.float32)
        dw2_ref[...] = jnp.zeros(dw2_ref.shape, jnp.float32)
        db2_ref[...] = jnp.zeros(db2_ref.shape, jnp.float32)

    x0, x1, _, ez, lz, onehot = _tile_forward(
        skips_ref[...], tgt_ref[...], w1_ref, b1_ref, w2_ref, b2_ref,
        mu)
    p = ez / jnp.sum(ez, axis=-1, keepdims=True)         # softmax
    scale = g_ref[0, 0] / n_rows
    dlogits = (p - onehot) * scale * _valid(i, M, n_rows)  # [M,mu] f32
    db2_ref[0] += jnp.sum(dlogits, axis=0)
    dl_c = dlogits.astype(cdt)
    dw2_ref[...] += jnp.dot(x1.T, dl_c,
                            preferred_element_type=jnp.float32)
    # relu masks compare in f32: Mosaic rejects bf16 comparisons on
    # this target ("Target does not support this comparison")
    dx1 = (jnp.dot(dl_c, w2_ref[...].T,
                   preferred_element_type=jnp.float32)
           * (x1.astype(jnp.float32) > 0))                # [M, S] f32
    db1_ref[0] += jnp.sum(dx1, axis=0)
    dx1_c = dx1.astype(cdt)
    dw1_ref[...] += jnp.dot(x0.T, dx1_c,
                            preferred_element_type=jnp.float32)
    dskips_ref[...] = (jnp.dot(dx1_c, w1_ref[...].T,
                               preferred_element_type=jnp.float32)
                       * (x0.astype(jnp.float32) > 0)).astype(cdt)


def _const(*shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _row(M, *tail):
    return pl.BlockSpec((M,) + tail,
                        lambda i: (i,) + tuple(0 for _ in tail),
                        memory_space=pltpu.VMEM)


def _pad_rows(x, Np):
    n = x.shape[0]
    return x if n == Np else jnp.pad(x, ((0, Np - n),) + ((0, 0),)
                                     * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def head_ce_pallas(interpret: bool, skips: jax.Array,
                   targets: jax.Array, w1, b1, w2, b2) -> jax.Array:
    """loss1 = mean softmax-CE of the head over ``skips [B,T,S]`` vs
    ``targets [B,T]`` — value matches the XLA `_head`+CE chain to bf16
    tolerance (w2 multiplies in bf16 here, f32 there)."""
    loss, _ = _fwd_call(interpret, skips, targets, w1, b1, w2, b2)
    return loss


def _fwd_call(interpret, skips, targets, w1, b1, w2, b2):
    B, T, S = skips.shape
    mu = w2.shape[-1]
    N = B * T
    M = min(TILE, N)
    Np = -(-N // M) * M
    cdt = skips.dtype
    flat = _pad_rows(skips.reshape(N, S), Np)
    tgt = _pad_rows(targets.reshape(N, 1).astype(jnp.int32), Np)
    args = (flat, tgt, w1.astype(cdt), b1.astype(cdt).reshape(1, S),
            w2.astype(cdt), b2.astype(jnp.float32).reshape(1, mu))
    loss_sum = pl.pallas_call(
        functools.partial(_fwd_kernel, mu, N),
        grid=(Np // M,),
        in_specs=[_row(M, S), _row(M, 1), _const(S, S), _const(1, S),
                  _const(S, mu), _const(1, mu)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return loss_sum[0, 0] / N, args


def _vjp_fwd(interpret, skips, targets, w1, b1, w2, b2):
    loss, _ = _fwd_call(interpret, skips, targets, w1, b1, w2, b2)
    return loss, (skips, targets, w1, b1, w2, b2)


def _vjp_bwd(interpret, res, g):
    skips, targets, w1, b1, w2, b2 = res
    B, T, S = skips.shape
    mu = w2.shape[-1]
    N = B * T
    M = min(TILE, N)
    Np = -(-N // M) * M
    cdt = skips.dtype
    flat = _pad_rows(skips.reshape(N, S), Np)
    tgt = _pad_rows(targets.reshape(N, 1).astype(jnp.int32), Np)
    dskips, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, mu, N),
        grid=(Np // M,),
        in_specs=[_row(M, S), _row(M, 1), _const(S, S), _const(1, S),
                  _const(S, mu), _const(1, mu),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[_row(M, S), _const(S, S), _const(1, S),
                   _const(S, mu), _const(1, mu)],
        out_shape=[jax.ShapeDtypeStruct((Np, S), cdt),
                   jax.ShapeDtypeStruct((S, S), jnp.float32),
                   jax.ShapeDtypeStruct((1, S), jnp.float32),
                   jax.ShapeDtypeStruct((S, mu), jnp.float32),
                   jax.ShapeDtypeStruct((1, mu), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(flat, tgt, w1.astype(cdt), b1.astype(cdt).reshape(1, S),
      w2.astype(cdt), b2.astype(jnp.float32).reshape(1, mu),
      jnp.asarray(g, jnp.float32).reshape(1, 1))
    return (dskips[:N].reshape(B, T, S), None,
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


head_ce_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def head_ce_loss(params: dict, cfg, skips: jax.Array,
                 targets: jax.Array) -> jax.Array:
    """Entry point used by models/vqvae.forward when
    ``cfg.head_kernel == "pallas"``: unpacks the head params and picks
    interpret mode off-TPU (same convention as the other kernels)."""
    h1, h2 = params["head"]["h1"], params["head"]["h2"]
    interpret = jax.default_backend() == "cpu"
    return head_ce_pallas(interpret, skips.astype(cfg.cdtype), targets,
                          h1["w"], h1["b"], h2["w"], h2["b"])
