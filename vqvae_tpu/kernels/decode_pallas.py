"""Whole-loop fused AR decode kernel (Pallas/TPU) — the centrepiece.

Reference equivalent: the per-sample Python loop over per-layer queues
in ``net.py :: Decoder.generate`` / ``generate.py`` (SURVEY.md §3.2),
whose pathology is a host<->device round trip per sample.  The lax.scan
path (infer/fastgen.py) already removes the host; this kernel also
removes XLA's per-op overhead inside the loop body:

* ALL weights (repacked GenParams layout) are pinned in VMEM for the
  whole generation — constant-index_map blocks are DMA'd once,
* the per-layer ring buffers live in VMEM *scratch*, which persists
  across the sequential chunk grid (packed [sum_dilations, B, R],
  layer offsets static),
* the local condition streams in chunk-by-chunk through the automatic
  grid pipeline (HBM -> VMEM overlapped with compute),
* sampling is in-kernel Gumbel-max over the TPU PRNG
  (argmax(logits/temp + G), G = -log(-log U)) — ids never leave the
  chip until the caller reads them.

Two modes sharing one body:
  sample=True  -> returns sampled ids [B, T]
  sample=False -> teacher-forced: consumes ids [B, T], returns logits
                  [T, B, mu] (the §4.2a parity oracle against
                  apply_decoder / the lax scan).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.models.wavenet import GenParams

CHUNK = 128  # AR steps per grid iteration


class DecodeState(NamedTuple):
    """Carried kernel state for resumable generation: everything the
    one-shot kernel keeps in VMEM scratch across its chunk grid, plus
    the absolute sample offset (which indexes the in-kernel PRNG
    stream, so a resumed run draws the SAME Gumbel noise the one-shot
    kernel would at that point in the sequence)."""
    t0: jax.Array    # [] int32 — absolute step offset, CHUNK-aligned
    bufs: jax.Array  # [sum(dilations), B, R] — per-layer ring buffers
    pe0: jax.Array   # [B, R] — emb0[x_{t-1}] pre-projection
    xoh: jax.Array   # [B, mu] — one-hot of the last sampled id


def init_decode_state(cfg: ModelConfig, B: int,
                      dtype=jnp.bfloat16) -> DecodeState:
    """State at t=0: zero buffers, digital-silence (mu//2) last id —
    exactly the one-shot kernel's in-kernel init (_body's _init)."""
    _, total = _offsets(cfg)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, cfg.mu), 1)
    return DecodeState(
        t0=jnp.zeros((), jnp.int32),
        bufs=jnp.zeros((total, B, cfg.residual_channels), dtype),
        pe0=jnp.zeros((B, cfg.residual_channels), dtype),
        xoh=(iota == (cfg.mu // 2)).astype(dtype),
    )


def _offsets(cfg: ModelConfig) -> Tuple[Tuple[int, ...], int]:
    offs, acc = [], 0
    for d in cfg.dilations:
        offs.append(acc)
        acc += d
    return tuple(offs), acc


def _body(cfg: ModelConfig, sample: bool, greedy: bool, resume: bool,
          *refs):
    # Unpack: resume mode adds a t0 scalar, the carried-in state
    # (bufs/pe0/xoh), and state outputs alongside the ids.
    if resume:
        (seed_ref, temp_ref, t0_ref, cond_ref, ids_in_ref,
         bufs0_ref, pe00_ref, xoh0_ref,
         wff_ref, wrs_ref, vc_ref, brs_ref,
         emb0_ref, emb1_ref, embb_ref, gcond_ref,
         h1_ref, b1_ref, h2_ref, b2_ref,
         out_ref, bufs1_ref, pe01_ref, xoh1_ref,
         bufs_ref, xoh_ref, pe0_ref, gum_ref) = refs
    else:
        (seed_ref, temp_ref, cond_ref, ids_in_ref,
         wff_ref, wrs_ref, vc_ref, brs_ref,
         emb0_ref, emb1_ref, embb_ref, gcond_ref,
         h1_ref, b1_ref, h2_ref, b2_ref,
         out_ref,
         bufs_ref, xoh_ref, pe0_ref, gum_ref) = refs
    R = cfg.residual_channels
    S = cfg.skip_channels
    mu = cfg.mu
    L = cfg.n_layers_total
    cdt = wff_ref.dtype
    offs, _ = _offsets(cfg)
    dils = cfg.dilations
    i = pl.program_id(0)
    B = xoh_ref.shape[0]
    # absolute step offset of this call (resume: CHUNK-aligned, so the
    # per-chunk PRNG stream below matches the one-shot kernel exactly)
    t0 = t0_ref[0, 0] if resume else 0

    @pl.when(i == 0)
    def _init():
        if resume:
            bufs_ref[:] = bufs0_ref[:]
            pe0_ref[:] = pe00_ref[:]
            xoh_ref[:] = xoh0_ref[:]
        else:
            bufs_ref[:] = jnp.zeros(bufs_ref.shape, bufs_ref.dtype)
            pe0_ref[:] = jnp.zeros(pe0_ref.shape, pe0_ref.dtype)
            # seed stream starts from digital silence (id mu//2)
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, mu), 1)
            xoh_ref[:] = (iota == (mu // 2)).astype(cdt)

    if sample and not greedy:
        # Batch the whole chunk's Gumbel noise up front: the two VPU
        # log()s run once over [CHUNK, B, mu] instead of sitting on the
        # per-step critical path.  (>>8 keeps 24 bits, which fit exactly
        # in both int32 and f32 mantissa; Mosaic lacks uint32->f32.)
        # The seed is indexed by the ABSOLUTE chunk number, so a
        # resumed call at t0 = k*CHUNK draws the same noise the
        # one-shot kernel would at that point in the stream.
        pltpu.prng_seed(seed_ref[0, 0] + t0 // CHUNK + i)
        bits = pltpu.prng_random_bits((CHUNK, B, mu))
        u01 = (pltpu.bitcast(
            jax.lax.shift_right_logical(
                pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)),
            jnp.int32).astype(jnp.float32) + 0.5) * (2.0 ** -24)
        gum_ref[:] = -jnp.log(-jnp.log(u01))

    def step(s, _):
        t = t0 + i * CHUNK + s
        if sample:
            # one-hot of the id sampled at step t-1 (init: mu//2)
            xoh = xoh_ref[:]                               # [B, mu]
        else:
            # teacher forcing: the current input id comes from the
            # given sequence, not the previous step's output
            x_cur = ids_in_ref[pl.ds(s, 1)][0]             # [B, 1]
            iota0 = jax.lax.broadcasted_iota(jnp.int32, (B, mu), 1)
            xoh = (iota0 == x_cur).astype(cdt)
        h = (jnp.dot(xoh, emb1_ref[:],
                     preferred_element_type=jnp.float32).astype(cdt)
             + pe0_ref[:] + embb_ref[:])                   # [B, R]
        pe0_ref[:] = jnp.dot(xoh, emb0_ref[:],
                             preferred_element_type=jnp.float32
                             ).astype(cdt)

        c_t = cond_ref[pl.ds(s, 1)][0]                     # [B, d]
        cproj = jnp.dot(c_t, vc_ref[:],
                        preferred_element_type=jnp.float32)  # [B, L*2R]

        # Phase 1 — everything that does NOT depend on the layer chain:
        # buffer reads and the past-tap matmuls (wff rows 0:R are the
        # wf0 taps). These 30 dots are mutually independent, so the MXU
        # pipelines them back-to-back instead of stalling per layer.
        rows = []
        base = []
        for li in range(L):
            dil = dils[li]
            slot = jax.lax.bitwise_and(t, dil - 1) \
                if dil & (dil - 1) == 0 else jax.lax.rem(t, dil)
            row = offs[li] + slot
            rows.append(row)
            past = bufs_ref[pl.ds(row, 1)][0]              # [B, R]
            pcon = jnp.dot(past, wff_ref[li, :R],
                           preferred_element_type=jnp.float32)
            base.append(pcon + cproj[:, li * 2 * R:(li + 1) * 2 * R]
                        + gcond_ref[li].astype(jnp.float32))

        # Phase 2 — the sequential chain: one matmul + gate + one
        # matmul per layer (gate math in f32: Mosaic transcendentals
        # are f32-only).
        skips = jnp.zeros((B, S), cdt)
        for li in range(L):
            bufs_ref[pl.ds(rows[li], 1)] = h[None]
            u = jnp.dot(h, wff_ref[li, R:],
                        preferred_element_type=jnp.float32) + base[li]
            z = (jnp.tanh(u[:, :R]) * jax.nn.sigmoid(u[:, R:])
                 ).astype(cdt)
            rs = jnp.dot(z, wrs_ref[li],
                         preferred_element_type=jnp.float32
                         ).astype(cdt) + brs_ref[li]
            h = h + rs[:, :R]
            skips = skips + rs[:, R:]

        x = jax.nn.relu(skips)
        x = jax.nn.relu(jnp.dot(x, h1_ref[:],
                                preferred_element_type=jnp.float32)
                        + b1_ref[:].astype(jnp.float32)).astype(cdt)
        logits = (jnp.dot(x.astype(jnp.float32), h2_ref[:],
                          preferred_element_type=jnp.float32)
                  + b2_ref[:])                             # [B, mu] f32

        if sample:
            if greedy:
                y = logits
            else:
                y = logits / temp_ref[0, 0] + gum_ref[pl.ds(s, 1)][0]
            x_next = jnp.argmax(y, axis=-1, keepdims=True)  # [B, 1]
            out_ref[pl.ds(s, 1)] = x_next.astype(jnp.int32)[None]
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, mu), 1)
            xoh_ref[:] = (iota == x_next).astype(cdt)
        else:
            out_ref[pl.ds(s, 1)] = logits[None]
        # pe0_ref already holds emb0[x_t] for the next step (set above)
        return _

    jax.lax.fori_loop(0, CHUNK, step, None)

    if resume:
        @pl.when(i == pl.num_programs(0) - 1)
        def _export_state():
            bufs1_ref[:] = bufs_ref[:]
            pe01_ref[:] = pe0_ref[:]
            xoh1_ref[:] = xoh_ref[:]


def _pack_inputs(gp: GenParams, gcond: jax.Array, cfg: ModelConfig):
    cdt = gp.wff.dtype
    return (
        gp.wff, gp.wrs, gp.vc_all, gp.brs,
        gp.emb_w[0], gp.emb_w[1], gp.emb_b[None, :].astype(cdt),
        gcond.astype(cdt),
        gp.head_h1, gp.head_b1[None, :], gp.head_h2,
        gp.head_b2[None, :],
    )


def _specs(cfg: ModelConfig, B: int, dtype) -> list:
    R = cfg.residual_channels
    S = cfg.skip_channels
    L = cfg.n_layers_total
    mu = cfg.mu
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return [
        const(L, 2 * R, 2 * R),      # wff
        const(L, R, R + S),          # wrs
        const(cfg.d, L * 2 * R),     # vc_all
        const(L, R + S),             # brs
        const(mu, R),                # emb0
        const(mu, R),                # emb1
        const(1, R),                 # emb_b
        const(L, B, 2 * R),          # gcond
        const(S, S),                 # head h1
        const(1, S),                 # b1
        const(S, mu),                # h2
        const(1, mu),                # b2
    ]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "greedy", "interpret"))
def generate_ids_pallas(gp: GenParams, cfg: ModelConfig,
                        cond: jax.Array, gcond: jax.Array,
                        seed: jax.Array, temperature: jax.Array,
                        greedy: bool = False,
                        interpret: bool | None = None) -> jax.Array:
    """Sample ``[B, T]`` ids. cond ``[B, T, d]``, gcond ``[L, B, 2R]``,
    seed int32 scalar, temperature f32 scalar."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, d = cond.shape
    _, total = _offsets(cfg)
    Tp = T + ((-T) % CHUNK)
    cond_tm = jnp.swapaxes(cond, 0, 1).astype(gp.wff.dtype)  # [T, B, d]
    if Tp != T:
        cond_tm = jnp.pad(cond_tm, ((0, Tp - T), (0, 0), (0, 0)))

    grid = (Tp // CHUNK,)
    kernel = functools.partial(_body, cfg, True, greedy, False)
    ids = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp, B, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # seed
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # temperature
            pl.BlockSpec((CHUNK, B, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),       # cond chunk
            pl.BlockSpec((CHUNK, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),       # ids_in (unused)
            *_specs(cfg, B, gp.wff.dtype),
        ],
        out_specs=pl.BlockSpec((CHUNK, B, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((total, B, cfg.residual_channels), gp.wff.dtype),
            pltpu.VMEM((B, cfg.mu), gp.wff.dtype),
            pltpu.VMEM((B, cfg.residual_channels), gp.wff.dtype),
            pltpu.VMEM((CHUNK, B, cfg.mu), jnp.float32),  # gumbel
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        jnp.asarray(temperature, jnp.float32).reshape(1, 1),
        cond_tm,
        jnp.zeros((Tp, B, 1), jnp.int32),
        *_pack_inputs(gp, gcond, cfg),
    )
    return jnp.swapaxes(ids[:T, :, 0], 0, 1)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "greedy", "interpret"),
                   donate_argnames=("state",))
def generate_ids_pallas_resume(gp: GenParams, cfg: ModelConfig,
                               cond: jax.Array, gcond: jax.Array,
                               seed: jax.Array, temperature: jax.Array,
                               state: DecodeState,
                               greedy: bool = False,
                               interpret: bool | None = None
                               ) -> Tuple[jax.Array, DecodeState]:
    """Resumable slice of ``generate_ids_pallas``: sample ``[B, T]``
    ids for the next T cond samples, carrying ring-buffer state across
    calls.  T must be a multiple of CHUNK and state.t0 CHUNK-aligned;
    then feeding the same total cond through any sequence of resumed
    calls is BIT-IDENTICAL to one one-shot call (same weights-in-VMEM
    layout, same per-chunk PRNG stream indexed by absolute chunk
    number — tested in tests/test_decode_resume.py).  This is the
    serving decode path: the daemon pushes fixed-size cond slices
    through one warm compiled program regardless of request length.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, d = cond.shape
    if T % CHUNK != 0:
        raise ValueError(f"resumable push must be a multiple of "
                         f"CHUNK={CHUNK} samples, got {T}")
    _, total = _offsets(cfg)
    cond_tm = jnp.swapaxes(cond, 0, 1).astype(gp.wff.dtype)  # [T, B, d]
    R = cfg.residual_channels
    mu = cfg.mu
    cdt = gp.wff.dtype
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    grid = (T // CHUNK,)
    kernel = functools.partial(_body, cfg, True, greedy, True)
    ids, bufs1, pe01, xoh1 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, 1), jnp.int32),
            jax.ShapeDtypeStruct((total, B, R), cdt),
            jax.ShapeDtypeStruct((B, R), cdt),
            jax.ShapeDtypeStruct((B, mu), cdt),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # seed
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # temperature
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # t0
            pl.BlockSpec((CHUNK, B, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),       # cond chunk
            pl.BlockSpec((CHUNK, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),       # ids_in (unused)
            const(total, B, R),                          # bufs in
            const(B, R),                                 # pe0 in
            const(B, mu),                                # xoh in
            *_specs(cfg, B, cdt),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(total, B, R),                          # bufs out
            const(B, R),                                 # pe0 out
            const(B, mu),                                # xoh out
        ),
        scratch_shapes=[
            pltpu.VMEM((total, B, R), cdt),
            pltpu.VMEM((B, mu), cdt),
            pltpu.VMEM((B, R), cdt),
            pltpu.VMEM((CHUNK, B, mu), jnp.float32),     # gumbel
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        jnp.asarray(temperature, jnp.float32).reshape(1, 1),
        jnp.asarray(state.t0, jnp.int32).reshape(1, 1),
        cond_tm,
        jnp.zeros((T, B, 1), jnp.int32),
        state.bufs, state.pe0, state.xoh,
        *_pack_inputs(gp, gcond, cfg),
    )
    new_state = DecodeState(t0=state.t0 + T, bufs=bufs1, pe0=pe01,
                            xoh=xoh1)
    return jnp.swapaxes(ids[:, :, 0], 0, 1), new_state


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def teacher_logits_pallas(gp: GenParams, cfg: ModelConfig,
                          ids_in: jax.Array, cond: jax.Array,
                          gcond: jax.Array,
                          interpret: bool | None = None) -> jax.Array:
    """Teacher-forced logits ``[B, T, mu]`` — parity oracle mode."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, d = cond.shape
    _, total = _offsets(cfg)
    Tp = T + ((-T) % CHUNK)
    cond_tm = jnp.swapaxes(cond, 0, 1).astype(gp.wff.dtype)
    ids_p = jnp.swapaxes(ids_in.astype(jnp.int32), 0, 1)[:, :, None]
    if Tp != T:
        cond_tm = jnp.pad(cond_tm, ((0, Tp - T), (0, 0), (0, 0)))
        ids_p = jnp.pad(ids_p, ((0, Tp - T), (0, 0), (0, 0)))

    grid = (Tp // CHUNK,)
    kernel = functools.partial(_body, cfg, False, False, False)
    logits = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Tp, B, cfg.mu), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, B, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),       # teacher ids
            *_specs(cfg, B, gp.wff.dtype),
        ],
        out_specs=pl.BlockSpec((CHUNK, B, cfg.mu), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((total, B, cfg.residual_channels), gp.wff.dtype),
            pltpu.VMEM((B, cfg.mu), gp.wff.dtype),
            pltpu.VMEM((B, cfg.residual_channels), gp.wff.dtype),
            pltpu.VMEM((CHUNK, B, cfg.mu), jnp.float32),  # gumbel
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1, 1), jnp.float32),
        cond_tm,
        ids_p,
        *_pack_inputs(gp, gcond, cfg),
    )
    return jnp.swapaxes(logits, 0, 1)[:, :T]
