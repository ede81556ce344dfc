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

* ONE kernel runs a *chunk* of up to MAX_CHUNK_LAYERS layers for one
  batch group (grid over B, forward groups 2 elements/program, layers
  statically unrolled so every dilated shift is a static slice).  h
  and cond are read once per chunk; the only fwd outputs are the
  chunk's skip sum [T,S] and the chunk-boundary h.
* The backward kernel RECOMPUTES the chunk forward, parking each
  layer's input in VMEM scratch (flash-attention-style), then walks the
  layers in reverse producing dh, dcond, and — accumulated across the
  sequential batch grid — all weight gradients.  No activation tensor
  between fwd and bwd ever touches HBM.
* The skip projection (z @ ws) runs in-kernel so dskips is consumed
  directly; per-layer biases are summed once at the XLA level.
* Chunking keeps the scratch + block VMEM budget under ~80 MB for the
  flagship T=7680; chunks chain at the XLA level and compose with
  jax.checkpoint.

save_gates variant ("pallas_sg", measured study in docs/PERF.md): the
forward also writes each layer's gate halves (ta|sb, bf16
[B,nl,T,2R]) to HBM, and the backward's pass 1 then replays only the
residual chain — no u matmuls, no transcendentals.  HBM traffic
(~39 MB/elem/chunk each way) buys back ~15% of the step's FLOPs:
measured faster at B>=32 (best 838 utt/s at B=64 vs 800 recompute),
slower at B=16 because the gall window forces the forward from G=2 to
G=1.  Default stays "pallas"; select with decoder_kernel="pallas_sg".

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
    """Causal shift along the time axis (axis -2; batch-group aware)."""
    if n == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (n, 0)
    return jnp.pad(x, pad)[..., : x.shape[-2], :]


def _shift_left(x: jax.Array, n: int) -> jax.Array:
    if n == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, n)
    return jnp.pad(x, pad)[..., n:, :]


def _u_of(h, cond_f, gc_ref, wff_ref, vc_ref, li, dil):
    """h [G,T,R], cond_f [G*T,d] -> (ph [G*T,2R], u [G,T,2R] f32)."""
    G, T, R = h.shape
    ph = jnp.concatenate([_shift_right(h, dil), h],
                         axis=-1).reshape(G * T, 2 * R)
    u = (jnp.dot(ph, wff_ref[li], preferred_element_type=jnp.float32)
         + jnp.dot(cond_f, vc_ref[li],
                   preferred_element_type=jnp.float32)
         ).reshape(G, T, 2 * R) + gc_ref[:, li][:, None, :].astype(
             jnp.float32)
    return ph, u


def _gate(u, R, cdt):
    """u [G,T,2R] f32 -> (ta, sb [G,T,R] f32, z [G*T,R] cdt)."""
    ta = jnp.tanh(u[..., :R])
    sb = jax.nn.sigmoid(u[..., R:])
    z = (ta * sb).astype(cdt).reshape(-1, R)
    return ta, sb, z


def _embed_h(ids3, idsp3, wemb_ref, bemb_ref, cdt):
    """In-kernel input embedding (round 4, "decoder input embedding"
    profile line — 3.7 ms of gather/one-hot HBM traffic at B=64):
    h[t] = w1[ids[t]] + w0[ids[t-1]] + b as two one-hot MXU matmuls
    built entirely in VMEM.  One-hot rows are exact {0,1}, so the
    matmul reproduces the gather bit-for-bit (f32 accumulate, one cast
    — vs the XLA path's two bf16 adds).  Returns the one-hots too: the
    backward contracts them against dh for the table gradient.

    ids arrive pre-reshaped as ``[G, T//128, 128]`` — Mosaic requires
    a block's last two dims divisible by (8, 128) or equal to the
    array's, which a 2-D ``[G, T]`` block violates at G<8; the
    ``[T//128, 128]`` layout tiles exactly.  ``idsp3`` is the causal
    shift ids[t-1] computed at the XLA level (one cheap int pad) with
    the sentinel ``mu`` at t=0, so its one-hot row is all-zero there —
    matching shift_right's zero padding with no in-kernel mask.

    ids3/idsp3 [G,T/128,128] int32, wemb_ref [2,mu,R], bemb_ref [1,R]
    -> (oh1 [G*T,mu], ohp [G*T,mu], h [G,T,R])."""
    G, Tc, lanes = ids3.shape
    T = Tc * lanes
    mu, R = wemb_ref.shape[1], wemb_ref.shape[2]
    iota_mu = jax.lax.broadcasted_iota(jnp.int32, (G, Tc, lanes, mu), 3)
    oh1 = (ids3[..., None] == iota_mu).astype(cdt).reshape(G * T, mu)
    ohp = (idsp3[..., None] == iota_mu).astype(cdt).reshape(G * T, mu)
    h = (jnp.dot(oh1, wemb_ref[1], preferred_element_type=jnp.float32)
         + jnp.dot(ohp, wemb_ref[0],
                   preferred_element_type=jnp.float32)
         + bemb_ref[0].astype(jnp.float32))
    return oh1, ohp, h.astype(cdt).reshape(G, T, R)


def _ids3_of(ids: jax.Array, mu: int):
    """XLA-level prep for the embed kernels: ids ``[B, T]`` ->
    (ids3, idsp3) ``[B, T//128, 128]`` — the exact-tiling layout
    Mosaic's block rules accept at batch groups < 8 — where idsp3 is
    the causal shift ids[t-1] with sentinel ``mu`` at t=0 (its one-hot
    row is then all-zero, matching shift_right's zero pad)."""
    B, T = ids.shape
    assert T % 128 == 0, (
        f"embed_in_kernel needs length % 128 == 0, got T={T}")
    idsp = jnp.concatenate(
        [jnp.full((B, 1), mu, ids.dtype), ids[:, :-1]], axis=1)
    return (ids.reshape(B, T // 128, 128),
            idsp.reshape(B, T // 128, 128))


def _fwd_kernel(dils: Tuple[int, ...], R: int, save_gates: bool,
                acc: bool, embed: bool, *refs):
    if embed:
        (ids_ref, idsp_ref, wemb_ref, bemb_ref, cond_ref, gc_ref,
         wff_ref, vc_ref, wr_ref, br_ref, ws_ref, tail_ref,
         hout_ref, skips_ref, *rest) = refs
        cdt = wemb_ref.dtype
        _, _, h = _embed_h(ids_ref[...], idsp_ref[...], wemb_ref,
                           bemb_ref, cdt)
    else:
        (h_ref, cond_ref, gc_ref, wff_ref, vc_ref, wr_ref, br_ref,
         ws_ref, tail_ref, hout_ref, skips_ref, *rest) = refs
        cdt = h_ref.dtype
        h = h_ref[...]                               # [G, T, R]
    G, T, _ = h.shape
    cond_f = cond_ref[...].reshape(G * T, -1)
    # the skip accumulator initialises from the chain (round 4, "kernel
    # glue" profile line): the FIRST chunk seeds it with the summed
    # per-layer skip bias (tail = [1,S]), later chunks read the running
    # total straight from HBM (tail = [G,T,S], acc=True) — so the
    # XLA-level s1+s2+s3+bias combine fusions (~1.6 ms of [B,T,S]
    # round trips at flagship B=64) never exist
    if acc:
        skips = tail_ref[...].reshape(
            G * T, ws_ref.shape[-1]).astype(jnp.float32)
    else:
        skips = jnp.broadcast_to(tail_ref[0].astype(jnp.float32),
                                 (G * T, ws_ref.shape[-1]))
    for li, dil in enumerate(dils):
        _, u = _u_of(h, cond_f, gc_ref, wff_ref, vc_ref, li, dil)
        ta, sb, z = _gate(u, R, cdt)
        if save_gates:
            rest[0][:, li] = jnp.concatenate([ta, sb],
                                             axis=-1).astype(cdt)
        h = (h.reshape(G * T, R)
             + jnp.dot(z, wr_ref[li],
                       preferred_element_type=jnp.float32).astype(cdt)
             + br_ref[li].astype(cdt)).reshape(G, T, R)
        skips = skips + jnp.dot(z, ws_ref[li],
                                preferred_element_type=jnp.float32)
    hout_ref[...] = h
    skips_ref[...] = skips.reshape(G, T, -1).astype(cdt)


def _bwd_kernel(dils: Tuple[int, ...], R: int, save_gates: bool,
                embed: bool, *refs):
    if embed:
        (ids_ref, idsp_ref, wemb_ref, bemb_ref, cond_ref, gc_ref,
         wff_ref, vc_ref, wr_ref, br_ref, ws_ref, dhout_ref,
         dskips_ref, *rest) = refs
        cdt = wemb_ref.dtype
        oh1, ohp, h = _embed_h(ids_ref[...], idsp_ref[...], wemb_ref,
                               bemb_ref, cdt)
        if save_gates:
            (gall_in_ref, dwemb_ref, dbemb_ref, dcond_ref, dgc_ref,
             dwff_ref, dvc_ref, dwr_ref, dbr_ref, dws_ref,
             hall_ref) = rest
        else:
            (dwemb_ref, dbemb_ref, dcond_ref, dgc_ref, dwff_ref,
             dvc_ref, dwr_ref, dbr_ref, dws_ref, hall_ref,
             gall_ref) = rest
    else:
        (h_ref, cond_ref, gc_ref, wff_ref, vc_ref, wr_ref,
         br_ref, ws_ref, dhout_ref, dskips_ref, *rest) = refs
        cdt = h_ref.dtype
        h = h_ref[...]                               # [G, T, R]
        if save_gates:
            # gates were saved to HBM by the forward — pass 1 only
            # replays the cheap residual chain (one [T,R]x[R,R]
            # matmul per layer)
            (gall_in_ref, dh_ref, dcond_ref, dgc_ref, dwff_ref,
             dvc_ref, dwr_ref, dbr_ref, dws_ref, hall_ref) = rest
        else:
            (dh_ref, dcond_ref, dgc_ref, dwff_ref, dvc_ref,
             dwr_ref, dbr_ref, dws_ref, hall_ref, gall_ref) = rest
    b = pl.program_id(0)
    nl = len(dils)
    G, T, _ = h.shape
    cond_f = cond_ref[...].reshape(G * T, -1)
    dskips = dskips_ref[...].reshape(G * T, -1).astype(cdt)

    # pass 1: recompute the chunk forward, parking both the layer
    # inputs AND the gate halves (ta|sb) in VMEM — pass 2 then needs
    # neither the u matmuls nor the transcendentals again.  In
    # save_gates mode the gate halves come from HBM, so the u matmuls
    # and transcendentals are skipped here too: only the residual
    # chain (z @ wr) is replayed to reconstruct each layer's input.
    for li, dil in enumerate(dils):
        hall_ref[li] = h
        if save_gates:
            g = gall_in_ref[:, li]                   # [G, T, 2R]
            z = (g[..., :R] * g[..., R:]).reshape(G * T, R)
        else:
            _, u = _u_of(h, cond_f, gc_ref, wff_ref, vc_ref, li, dil)
            ta, sb, z = _gate(u, R, cdt)
            gall_ref[li] = jnp.concatenate([ta, sb],
                                           axis=-1).astype(cdt)
        h = (h.reshape(G * T, R)
             + jnp.dot(z, wr_ref[li],
                       preferred_element_type=jnp.float32).astype(cdt)
             + br_ref[li].astype(cdt)).reshape(G, T, R)

    # pass 2: reverse sweep
    dh = dhout_ref[...].reshape(G * T, R).astype(jnp.float32)
    dcond = jnp.zeros(cond_f.shape, jnp.float32)

    @pl.when(b == 0)
    def _init():
        dwff_ref[:] = jnp.zeros(dwff_ref.shape, jnp.float32)
        dvc_ref[:] = jnp.zeros(dvc_ref.shape, jnp.float32)
        dwr_ref[:] = jnp.zeros(dwr_ref.shape, jnp.float32)
        dbr_ref[:] = jnp.zeros(dbr_ref.shape, jnp.float32)
        dws_ref[:] = jnp.zeros(dws_ref.shape, jnp.float32)
        if embed:
            dwemb_ref[:] = jnp.zeros(dwemb_ref.shape, jnp.float32)
            dbemb_ref[:] = jnp.zeros(dbemb_ref.shape, jnp.float32)

    for li in reversed(range(nl)):
        dil = dils[li]
        hin = hall_ref[li]                           # [G, T, R]
        ph = jnp.concatenate([_shift_right(hin, dil), hin],
                             axis=-1).reshape(G * T, 2 * R)
        g = gall_in_ref[:, li] if save_gates else gall_ref[li]
        ta = g[..., :R].astype(jnp.float32)
        sb = g[..., R:].astype(jnp.float32)
        z = (ta * sb).astype(cdt).reshape(G * T, R)

        dh_c = dh.astype(cdt)                        # [G*T, R]
        # h_{li+1} = h_li + z @ wr + br ; skips += z @ ws
        dbr_ref[li] += jnp.sum(dh, axis=0)
        dwr_ref[li] += jnp.dot(z.T, dh_c,
                               preferred_element_type=jnp.float32)
        dws_ref[li] += jnp.dot(z.T, dskips,
                               preferred_element_type=jnp.float32)
        dz = (jnp.dot(dh_c, wr_ref[li].T,
                      preferred_element_type=jnp.float32)
              + jnp.dot(dskips, ws_ref[li].T,
                        preferred_element_type=jnp.float32)
              ).reshape(G, T, R)
        da = dz * sb * (1.0 - ta * ta)
        db = dz * ta * sb * (1.0 - sb)
        du_g = jnp.concatenate([da, db], axis=-1)    # [G, T, 2R] f32
        du = du_g.astype(cdt).reshape(G * T, 2 * R)

        dgc_ref[:, li] = jnp.sum(du_g, axis=1)
        dwff_ref[li] += jnp.dot(ph.T, du,
                                preferred_element_type=jnp.float32)
        dvc_ref[li] += jnp.dot(cond_f.T, du,
                               preferred_element_type=jnp.float32)
        dcond = dcond + jnp.dot(du, vc_ref[li].T,
                                preferred_element_type=jnp.float32)
        dph = jnp.dot(du, wff_ref[li].T,
                      preferred_element_type=jnp.float32
                      ).reshape(G, T, 2 * R)
        dh = (dh.reshape(G, T, R) + dph[..., R:]
              + _shift_left(dph[..., :R], dil)).reshape(G * T, R)

    if embed:
        # d(embedding): dh never leaves VMEM — contract it against the
        # one-hots for the table grad instead of writing [B,T,R] to
        # HBM for an XLA-side scatter/one-hot pass (the whole point of
        # the fusion; the bias grad is the plain row sum)
        dh_c = dh.astype(cdt)
        dwemb_ref[1] += jnp.dot(oh1.T, dh_c,
                                preferred_element_type=jnp.float32)
        dwemb_ref[0] += jnp.dot(ohp.T, dh_c,
                                preferred_element_type=jnp.float32)
        dbemb_ref[0] += jnp.sum(dh, axis=0)
    else:
        dh_ref[...] = dh.reshape(G, T, R).astype(cdt)
    dcond_ref[...] = dcond.reshape(G, T, -1).astype(cdt)


def _bwd_kernel_windowed(dils: Tuple[int, ...], R: int, A: int, Tc: int,
                         hpad_ref, cond_ref, gc_ref, wff_ref, vc_ref,
                         wr_ref, br_ref, ws_ref, dhout_ref, dskips_ref,
                         dh_ref, dcond_ref, dgc_ref, dwff_ref, dvc_ref,
                         dwr_ref, dbr_ref, dws_ref,
                         hall_ref, gall_ref, spill_ref):
    """Time-windowed recompute backward (VERDICT r2 #1).

    Grid = (B//G, nT), time windows walked RIGHT-to-LEFT (dh flows
    backward through the causal shifts). Per window [t0, t1):

    * pass 1 recomputes the chunk forward over the EXTENDED window
      [t0-A, t1) straight from the (VMEM-resident, left-padded) chunk
      input ``hpad`` — the in-window zero-shift corrupts layer li's
      recompute only on its first sum(dils[:li]) frames, and with
      A >= sum(dils) pass 2 never reads a corrupted frame (exactness
      argument in the commit; pinned vs lax in tests). Scratch is
      ``[nl, G, Tc+A, R]`` instead of full-T — the VMEM saving that
      buys the batch group back.
    * pass 2 sweeps layers in reverse over the window rows only. The
      one cross-window dependency is shift_left: dh(t) takes
      dph_a(t+dil) from the window to the RIGHT — carried in the
      persistent ``spill`` scratch (zeroed at j==0, the sequence tail,
      where shift_left pads zeros).
    """
    cdt = hpad_ref.dtype
    b = pl.program_id(0)
    j = pl.program_id(1)
    nT = pl.num_programs(1)
    tc = nT - 1 - j
    t0p = tc * Tc                    # window start in hpad coords
    nl = len(dils)
    G = hpad_ref.shape[0]
    W = Tc + A
    d = cond_ref.shape[-1]

    @pl.when(j == 0)
    def _init_per_b():
        spill_ref[:] = jnp.zeros(spill_ref.shape, jnp.float32)
        dgc_ref[:] = jnp.zeros(dgc_ref.shape, jnp.float32)

    @pl.when((b == 0) & (j == 0))
    def _init():
        dwff_ref[:] = jnp.zeros(dwff_ref.shape, jnp.float32)
        dvc_ref[:] = jnp.zeros(dvc_ref.shape, jnp.float32)
        dwr_ref[:] = jnp.zeros(dwr_ref.shape, jnp.float32)
        dbr_ref[:] = jnp.zeros(dbr_ref.shape, jnp.float32)
        dws_ref[:] = jnp.zeros(dws_ref.shape, jnp.float32)

    # pass 1: recompute over [t0-A, t1)
    h = hpad_ref[:, pl.ds(t0p, W), :]                 # [G, W, R]
    condw = cond_ref[:, pl.ds(t0p, W), :]
    condw_f = condw.reshape(G * W, d)
    # positions before the sequence start: every h_li there must be an
    # EXACT zero (shift_right's causal padding), but the recompute
    # would regenerate gate(bias)-driven nonzeros from the zero-padded
    # input — mask them out after each residual update (the leftmost
    # windows extend to negative t whenever t0 < A)
    neg = (jax.lax.broadcasted_iota(jnp.int32, (G, W, 1), 1)
           + (t0p - A)) < 0
    for li, dil in enumerate(dils):
        hall_ref[li] = h
        _, u = _u_of(h, condw_f, gc_ref, wff_ref, vc_ref, li, dil)
        ta, sb, z = _gate(u, R, cdt)
        gall_ref[li] = jnp.concatenate([ta[:, A:], sb[:, A:]],
                                       axis=-1).astype(cdt)
        h = (h.reshape(G * W, R)
             + jnp.dot(z, wr_ref[li],
                       preferred_element_type=jnp.float32).astype(cdt)
             + br_ref[li].astype(cdt)).reshape(G, W, R)
        h = jnp.where(neg, jnp.zeros((), cdt), h)

    # pass 2: reverse layer sweep over the window rows
    dh = dhout_ref[...].reshape(G * Tc, R).astype(jnp.float32)
    dskips = dskips_ref[...].reshape(G * Tc, -1).astype(cdt)
    cond_win = condw[:, A:, :].reshape(G * Tc, d)
    dcond = jnp.zeros((G * Tc, d), jnp.float32)
    for li in reversed(range(nl)):
        dil = dils[li]
        hin = hall_ref[li]                            # [G, W, R]
        # shift_right over the EXTENDED window then crop to [A:] ==
        # hin[A-dil : W-dil] (A >= dil), but built from a pad (fresh,
        # offset-aligned buffer) — Mosaic rejects lane-concats whose
        # operands carry mismatched sublane offsets, which the direct
        # unaligned slice produces
        ph = jnp.concatenate([_shift_right(hin, dil)[:, A:],
                              hin[:, A:]],
                             axis=-1).reshape(G * Tc, 2 * R)
        g = gall_ref[li]                              # [G, Tc, 2R]
        ta = g[..., :R].astype(jnp.float32)
        sb = g[..., R:].astype(jnp.float32)
        z = (ta * sb).astype(cdt).reshape(G * Tc, R)

        dh_c = dh.astype(cdt)
        dbr_ref[li] += jnp.sum(dh, axis=0)
        dwr_ref[li] += jnp.dot(z.T, dh_c,
                               preferred_element_type=jnp.float32)
        dws_ref[li] += jnp.dot(z.T, dskips,
                               preferred_element_type=jnp.float32)
        dz = (jnp.dot(dh_c, wr_ref[li].T,
                      preferred_element_type=jnp.float32)
              + jnp.dot(dskips, ws_ref[li].T,
                        preferred_element_type=jnp.float32)
              ).reshape(G, Tc, R)
        da = dz * sb * (1.0 - ta * ta)
        db = dz * ta * sb * (1.0 - sb)
        du_g = jnp.concatenate([da, db], axis=-1)     # [G, Tc, 2R] f32
        du = du_g.astype(cdt).reshape(G * Tc, 2 * R)

        dgc_ref[:, li] += jnp.sum(du_g, axis=1)
        dwff_ref[li] += jnp.dot(ph.T, du,
                                preferred_element_type=jnp.float32)
        dvc_ref[li] += jnp.dot(cond_win.T, du,
                               preferred_element_type=jnp.float32)
        dcond = dcond + jnp.dot(du, vc_ref[li].T,
                                preferred_element_type=jnp.float32)
        dph = jnp.dot(du, wff_ref[li].T,
                      preferred_element_type=jnp.float32
                      ).reshape(G, Tc, 2 * R)
        dph_a = dph[..., :R]
        # shift_left across the window boundary: the tail takes the
        # RIGHT window's first dil frames of dph_a from the spill carry
        tail = spill_ref[li, :, :dil, :]              # [G, dil, R] f32
        # shift_left within the window (pad-based, aligned) + the tail
        # placed at the last dil rows — avoids a sublane concat of an
        # unaligned dph_a slice
        shifted = _shift_left(dph_a, dil) + \
            jnp.pad(tail, ((0, 0), (Tc - dil, 0), (0, 0)))
        spill_ref[li, :, :dil, :] = dph_a[:, :dil, :]
        dh = (dh.reshape(G, Tc, R) + dph[..., R:]
              + shifted).reshape(G * Tc, R)

    dh_ref[...] = dh.reshape(G, Tc, R).astype(cdt)
    dcond_ref[...] = dcond.reshape(G, Tc, d).astype(cdt)


def _const_spec(*shape):
    return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _group_spec(G: int, *shape):
    """Blocks of G batch elements per sequential grid step."""
    return pl.BlockSpec((G,) + shape,
                        lambda b: (b,) + tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _group_of(B: int, want: int = 2) -> int:
    """Batch elements per program. Grouping pairs halves per-program
    fixed costs and doubles matmul rows; used for the FORWARD kernel
    only — the backward's recompute scratch ([nl,G,T,R]) plus its f32
    temporaries exceed VMEM at G=2/T=7680 (measured 167M > 128M), so
    the backward runs G=1."""
    return want if B % want == 0 else 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_stack_chunk(dils: Tuple[int, ...], interpret: bool,
                      save_gates: bool, bwd_windows: int,
                      h, cond, gc, wff, vc, wr, br, ws, bias
                      ) -> Tuple[jax.Array, jax.Array]:
    """nl-layer chunk: returns (h_out [B,T,R], skips [B,T,S]).

    ``bias`` [1,S] seeds the in-kernel skip accumulator (the summed
    per-layer skip biases for the whole stack — passed to the FIRST
    chunk of a chain; see fused_stack_chunk_acc for the rest).

    ``save_gates`` trades HBM for FLOPs in the backward: the forward
    writes each layer's gate halves (ta|sb, bf16 ``[B,nl,T,2R]``) to
    HBM and the backward skips the chunk-forward recompute's u matmuls
    and transcendentals, replaying only the residual chain.  With
    ``False`` (flash-attention-style) nothing but (h_out, skips)
    leaves the kernel and the backward recomputes the chunk forward.

    ``bwd_windows`` > 1 runs the recompute backward TIME-WINDOWED
    (grid over T-chunks with a sum(dils) halo + dh spill carry,
    _bwd_kernel_windowed): the per-program scratch shrinks by ~nT so
    the batch group returns to G=2. 0/1 = the full-T backward.
    Ignored (full-T) under ``save_gates``.
    """
    out = _chunk_fwd_call(dils, interpret, False, (h,), cond, gc,
                          wff, vc, wr, br, ws, bias)
    return out[0], out[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_stack_chunk_acc(dils: Tuple[int, ...], interpret: bool,
                          save_gates: bool, bwd_windows: int,
                          h, cond, gc, wff, vc, wr, br, ws, skips_in
                          ) -> Tuple[jax.Array, jax.Array]:
    """Chained chunk: like fused_stack_chunk but the skip accumulator
    initialises from ``skips_in`` [B,T,S] (the previous chunk's
    output), read inside the kernel — one [B,T,S] HBM read instead of
    the XLA combine's read+read+write.  d(skips_out)/d(skips_in) is
    the identity, so the backward passes the skips cotangent through
    unchanged (zero extra traffic)."""
    out = _chunk_fwd_call(dils, interpret, False, (h,), cond, gc,
                          wff, vc, wr, br, ws, skips_in, acc=True)
    return out[0], out[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_stack_chunk_embed(dils: Tuple[int, ...], interpret: bool,
                            save_gates: bool, bwd_windows: int,
                            ids, wemb, bemb, cond, gc, wff, vc, wr,
                            br, ws, bias
                            ) -> Tuple[jax.Array, jax.Array]:
    """First-chunk variant that computes the input embedding IN the
    kernel: ids int32 ``[B,T]``, wemb ``[2,mu,R]`` (two causal taps),
    bemb ``[1,R]`` replace the materialized h ``[B,T,R]``.  The
    backward contracts dh against the in-VMEM one-hots for the table
    gradient, so neither h nor dh ever touches HBM (round-4 profile:
    the XLA embedding fwd+bwd was 3.7 ms / 5% of the B=64 step).
    ``bwd_windows`` is ignored (full-T backward)."""
    out = _chunk_fwd_call(dils, interpret, False, (ids, wemb, bemb),
                          cond, gc, wff, vc, wr, br, ws, bias,
                          embed=True)
    return out[0], out[1]


def _chunk_fwd_call(dils, interpret, save_gates,
                    lead, cond, gc, wff, vc, wr, br, ws, tail,
                    acc=False, embed=False):
    """``lead`` is ``(h,)`` or — embed variant — ``(ids, wemb, bemb)``
    (int32 [B,T], [2,mu,R], [1,R]); the kernel then computes the input
    embedding in VMEM instead of reading a materialized h."""
    if embed:
        ids, wemb, bemb = lead
        B, T = ids.shape
        mu, R = wemb.shape[1], wemb.shape[2]
        ids3, idsp3 = _ids3_of(ids, mu)
        lead = (ids3, idsp3, wemb, bemb)
    else:
        (h,) = lead
        B, T, R = h.shape
    d = cond.shape[-1]
    nl = len(dils)
    S = ws.shape[-1]
    # save_gates runs G=1: the gall output window ([G,nl,T,2R],
    # double-buffered by the pipeline) exceeds VMEM at G=2/T=7680.
    # (A G=2 variant that kept gall in HBM and streamed it per layer
    # with explicit make_async_copy DMAs was measured SLOWER at every
    # batch — 41.8 vs 39.1 ms at B=32 — the pipeline's own windowed
    # copies overlap across programs better; see docs/PERF.md.)
    # VQVAE_FWD_WANT_G: experiment knob. G=4 is VMEM-INFEASIBLE at the
    # flagship T=7680 (measured: 183M > 128M — the double-buffered
    # [G,T,S] skips window alone is 30M at G=4), so G=2 is the
    # largest feasible forward group, not merely the chosen one.
    import os
    G = _group_of(B, 1 if save_gates else
                  int(os.environ.get("VQVAE_FWD_WANT_G", "2")))
    cdt = wemb.dtype if embed else h.dtype
    out_specs = [_group_spec(G, T, R), _group_spec(G, T, S)]
    out_shape = [jax.ShapeDtypeStruct((B, T, R), cdt),
                 jax.ShapeDtypeStruct((B, T, S), cdt)]
    if save_gates:
        out_specs.append(_group_spec(G, nl, T, 2 * R))
        out_shape.append(jax.ShapeDtypeStruct((B, nl, T, 2 * R), cdt))
    lead_specs = ([_group_spec(G, T // 128, 128),   # ids3 (int32)
                   _group_spec(G, T // 128, 128),   # idsp3
                   _const_spec(2, mu, R),           # wemb
                   _const_spec(1, R)]               # bemb
                  if embed else [_group_spec(G, T, R)])   # h
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dils, R, save_gates, acc,
                          embed),
        grid=(B // G,),
        in_specs=lead_specs + [
            _group_spec(G, T, d),           # cond
            _group_spec(G, nl, 2 * R),      # gc  [B,nl,2R]
            _const_spec(nl, 2 * R, 2 * R),  # wff
            _const_spec(nl, d, 2 * R),      # vc
            _const_spec(nl, R, R),          # wr
            _const_spec(nl, R),             # br
            _const_spec(nl, R, S),          # ws
            # tail: running skip total [B,T,S] (acc) or the summed
            # skip bias [1,S] (first chunk)
            _group_spec(G, T, S) if acc else _const_spec(1, S),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*lead, cond, gc, wff, vc, wr, br, ws, tail)
    return out


def _chunk_vjp_fwd(dils, interpret, save_gates, bwd_windows,
                   h, cond, gc, wff, vc, wr, br, ws, bias):
    out = _chunk_fwd_call(dils, interpret, save_gates, (h,), cond,
                          gc, wff, vc, wr, br, ws, bias)
    gall = out[2] if save_gates else None
    return tuple(out[:2]), (h, cond, gc, wff, vc, wr, br, ws, gall)


def _chunk_vjp_fwd_acc(dils, interpret, save_gates, bwd_windows,
                       h, cond, gc, wff, vc, wr, br, ws, skips_in):
    out = _chunk_fwd_call(dils, interpret, save_gates, (h,), cond,
                          gc, wff, vc, wr, br, ws, skips_in, acc=True)
    gall = out[2] if save_gates else None
    return tuple(out[:2]), (h, cond, gc, wff, vc, wr, br, ws, gall)


def _chunk_vjp_fwd_embed(dils, interpret, save_gates, bwd_windows,
                         ids, wemb, bemb, cond, gc, wff, vc, wr, br,
                         ws, bias):
    out = _chunk_fwd_call(dils, interpret, save_gates,
                          (ids, wemb, bemb), cond, gc, wff, vc, wr,
                          br, ws, bias, embed=True)
    gall = out[2] if save_gates else None
    return tuple(out[:2]), (ids, wemb, bemb, cond, gc, wff, vc, wr,
                            br, ws, gall)


def _chunk_vjp_bwd_embed(dils, interpret, save_gates, bwd_windows,
                         res, cots):
    import numpy as np
    dbias = jnp.sum(cots[1].astype(jnp.float32),
                    axis=(0, 1)).reshape(1, -1).astype(res[1].dtype)
    # ids are integers: their cotangent is float0 by JAX convention
    dids = np.zeros(res[0].shape, jax.dtypes.float0)
    return (dids,) + _chunk_grads(dils, interpret, save_gates, 0,
                                  res, cots, embed=True) + (dbias,)


def _chunk_vjp_bwd(dils, interpret, save_gates, bwd_windows, res, cots):
    # d(skips)/d(bias) is a broadcast: dbias = sum over rows of dskips
    # — the same [B,T,S] reduction XLA used to emit for the out-of-
    # kernel `skips + sum(bs)` add, so the backward cost is unchanged
    dbias = jnp.sum(cots[1].astype(jnp.float32),
                    axis=(0, 1)).reshape(1, -1).astype(res[0].dtype)
    return _chunk_grads(dils, interpret, save_gates, bwd_windows,
                        res, cots) + (dbias,)


def _chunk_vjp_bwd_acc(dils, interpret, save_gates, bwd_windows,
                       res, cots):
    # identity pass-through: the cotangent for skips_in IS the skips
    # cotangent (same array, no copy)
    return _chunk_grads(dils, interpret, save_gates, bwd_windows,
                        res, cots) + (cots[1],)


def _chunk_grads(dils, interpret, save_gates, bwd_windows, res, cots,
                 embed=False):
    if bwd_windows > 1 and not save_gates:
        return _chunk_bwd_windowed_call(dils, interpret, bwd_windows,
                                        res, cots)
    if embed:
        ids, wemb, bemb, cond, gc, wff, vc, wr, br, ws, gall = res
        B, T = ids.shape
        mu, R = wemb.shape[1], wemb.shape[2]
        cdt = wemb.dtype
        G_ = _group_of(B, 1)
        ids3, idsp3 = _ids3_of(ids, mu)
        lead_specs = [_group_spec(G_, T // 128, 128),
                      _group_spec(G_, T // 128, 128),
                      _const_spec(2, mu, R), _const_spec(1, R)]
        lead_args = [ids3, idsp3, wemb, bemb]
    else:
        h, cond, gc, wff, vc, wr, br, ws, gall = res
        B, T, R = h.shape
        cdt = h.dtype
        lead_specs = [_group_spec(G_ := _group_of(B, 1), T, R)]
        lead_args = [h]
    dhout, dskips = cots
    d = cond.shape[-1]
    nl = len(dils)
    S = ws.shape[-1]
    f32 = jnp.float32
    G = G_
    in_specs = lead_specs + [
        _group_spec(G, T, d),           # cond
        _group_spec(G, nl, 2 * R),      # gc
        _const_spec(nl, 2 * R, 2 * R),  # wff
        _const_spec(nl, d, 2 * R),      # vc
        _const_spec(nl, R, R),          # wr
        _const_spec(nl, R),             # br
        _const_spec(nl, R, S),          # ws
        _group_spec(G, T, R),           # dhout
        _group_spec(G, T, S),           # dskips
    ]
    args = lead_args + [cond, gc, wff, vc, wr, br, ws, dhout, dskips]
    scratch_shapes = [
        # recomputed layer inputs, parked across the reverse sweep
        # (nl<=10: ~10 MB at T=7680, R=64, G=1)
        pltpu.VMEM((nl, G, T, R), cdt),
    ]
    if save_gates:
        in_specs.append(_group_spec(G, nl, T, 2 * R))
        args.append(gall)
    else:
        # gate halves recomputed in pass 1 (another ~20 MB scratch)
        scratch_shapes.append(pltpu.VMEM((nl, G, T, 2 * R), cdt))
    # embed variant: dh never leaves the kernel — the leading outputs
    # are the (grid-accumulated) embedding-table/bias grads instead
    lead_out_specs = ([_const_spec(2, mu, R), _const_spec(1, R)]
                      if embed else [_group_spec(G, T, R)])
    lead_out_shape = ([jax.ShapeDtypeStruct((2, mu, R), f32),
                       jax.ShapeDtypeStruct((1, R), f32)]
                      if embed else
                      [jax.ShapeDtypeStruct((B, T, R), cdt)])
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, dils, R, save_gates, embed),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=lead_out_specs + [
            _group_spec(G, T, d),           # dcond
            _group_spec(G, nl, 2 * R),      # dgc [B,nl,2R]
            _const_spec(nl, 2 * R, 2 * R),  # dwff (grid-accumulated)
            _const_spec(nl, d, 2 * R),      # dvc
            _const_spec(nl, R, R),          # dwr
            _const_spec(nl, R),             # dbr
            _const_spec(nl, R, S),          # dws
        ],
        out_shape=lead_out_shape + [
            jax.ShapeDtypeStruct((B, T, d), cond.dtype),
            jax.ShapeDtypeStruct((B, nl, 2 * R), f32),
            jax.ShapeDtypeStruct((nl, 2 * R, 2 * R), f32),
            jax.ShapeDtypeStruct((nl, d, 2 * R), f32),
            jax.ShapeDtypeStruct((nl, R, R), f32),
            jax.ShapeDtypeStruct((nl, R), f32),
            jax.ShapeDtypeStruct((nl, R, S), f32),
        ],
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if embed:
        dwemb, dbemb, dcond, dgc, dwff, dvc, dwr, dbr, dws = out
        lead_grads = (dwemb.astype(wemb.dtype),
                      dbemb.astype(bemb.dtype))
    else:
        dh, dcond, dgc, dwff, dvc, dwr, dbr, dws = out
        lead_grads = (dh,)
    return lead_grads + (
        dcond, dgc.astype(gc.dtype), dwff.astype(wff.dtype),
        dvc.astype(vc.dtype), dwr.astype(wr.dtype),
        dbr.astype(br.dtype), dws.astype(ws.dtype))


def _chunk_bwd_windowed_call(dils, interpret, n_windows, res, cots):
    """Launch _bwd_kernel_windowed: grid (B//G, nT), G restored to 2."""
    h, cond, gc, wff, vc, wr, br, ws, _ = res
    dhout, dskips = cots
    B, T, R = h.shape
    d = cond.shape[-1]
    nl = len(dils)
    S = ws.shape[-1]
    f32 = jnp.float32
    nT = n_windows
    assert T % nT == 0, (T, nT)
    Tc = T // nT
    Dmax = max(dils)
    assert Tc % 8 == 0 and Tc >= Dmax, (Tc, Dmax)
    A = -(-sum(dils) // 8) * 8          # halo: exactness needs >= sum
    W = Tc + A
    # batch group (experiment knob, docs/PERF.md "Windowed backward":
    # G=1 vs G=2 measured indistinguishable — the backward is
    # FLOP-bound, not per-program-overhead-bound)
    import os
    G = _group_of(B, int(os.environ.get("VQVAE_BWD_WANT_G", "2")))

    hpad = jnp.pad(h, ((0, 0), (A, 0), (0, 0)))
    condpad = jnp.pad(cond, ((0, 0), (A, 0), (0, 0)))

    def full_spec(*shape):
        # whole (padded) array per batch group, revisited across j
        return pl.BlockSpec((G,) + shape, lambda b, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def win_spec(*shape):
        # per-window block, time reversed (right-to-left sweep)
        return pl.BlockSpec(
            (G,) + shape,
            lambda b, j, nT=nT: (b, nT - 1 - j, 0),
            memory_space=pltpu.VMEM)

    def const2(*shape):
        return pl.BlockSpec(shape, lambda b, j: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    dh, dcond, dgc, dwff, dvc, dwr, dbr, dws = pl.pallas_call(
        functools.partial(_bwd_kernel_windowed, dils, R, A, Tc),
        grid=(B // G, nT),
        in_specs=[
            full_spec(T + A, R),            # hpad
            full_spec(T + A, d),            # condpad
            pl.BlockSpec((G, nl, 2 * R), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # gc
            const2(nl, 2 * R, 2 * R),       # wff
            const2(nl, d, 2 * R),           # vc
            const2(nl, R, R),               # wr
            const2(nl, R),                  # br
            const2(nl, R, S),               # ws
            win_spec(Tc, R),                # dhout
            win_spec(Tc, S),                # dskips
        ],
        out_specs=[
            win_spec(Tc, R),                # dh
            win_spec(Tc, d),                # dcond
            pl.BlockSpec((G, nl, 2 * R), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # dgc
            const2(nl, 2 * R, 2 * R),       # dwff (grid-accumulated)
            const2(nl, d, 2 * R),           # dvc
            const2(nl, R, R),               # dwr
            const2(nl, R),                  # dbr
            const2(nl, R, S),               # dws
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
            pltpu.VMEM((nl, G, W, R), h.dtype),        # hall
            pltpu.VMEM((nl, G, Tc, 2 * R), h.dtype),   # gall (window)
            pltpu.VMEM((nl, G, Dmax, R), f32),         # dh spill carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(hpad, condpad, gc, wff, vc, wr, br, ws, dhout, dskips)
    return (dh, dcond, dgc.astype(gc.dtype), dwff.astype(wff.dtype),
            dvc.astype(vc.dtype), dwr.astype(wr.dtype),
            dbr.astype(br.dtype), dws.astype(ws.dtype))


fused_stack_chunk.defvjp(_chunk_vjp_fwd, _chunk_vjp_bwd)
fused_stack_chunk_acc.defvjp(_chunk_vjp_fwd_acc, _chunk_vjp_bwd_acc)
fused_stack_chunk_embed.defvjp(_chunk_vjp_fwd_embed,
                               _chunk_vjp_bwd_embed)


def decoder_stack_pallas(params: dict, cfg, h: jax.Array | None,
                         cond: jax.Array, gcond: jax.Array,
                         interpret: bool | None = None,
                         ids: jax.Array | None = None) -> jax.Array:
    """The full L-layer gated-residual stack on fused chunk kernels.

    h ``[B,T,R]`` embedded inputs, cond ``[B,T,d]``, gcond ``[L,B,2R]``
    (conv bias folded).  Returns skips ``[B,T,S]`` — same contract as
    the layer loop inside models/wavenet.apply_decoder, which remains
    the shadow reference (tests/test_kernels.py).

    ``cfg.embed_in_kernel``: pass ``ids [B,T]`` (int32) with ``h=None``
    and the FIRST chunk computes the input embedding in-kernel
    (fused_stack_chunk_embed) — h and dh never exist as HBM tensors.

    ``cfg.decoder_kernel == "pallas_sg"`` selects the save-gates
    variant (gates to HBM in fwd, no u-recompute in bwd); ``"pallas"``
    is the zero-activation-HBM recompute variant.  Perf tradeoff
    measured in docs/PERF.md.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    save_gates = cfg.decoder_kernel == "pallas_sg"
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

    chunk, chunk_acc = fused_stack_chunk, fused_stack_chunk_acc
    chunk_embed = fused_stack_chunk_embed
    if cfg.remat:
        chunk = jax.checkpoint(fused_stack_chunk,
                               static_argnums=(0, 1, 2, 3))
        chunk_acc = jax.checkpoint(fused_stack_chunk_acc,
                                   static_argnums=(0, 1, 2, 3))
        chunk_embed = jax.checkpoint(fused_stack_chunk_embed,
                                     static_argnums=(0, 1, 2, 3))

    bwd_windows = getattr(cfg, "bwd_time_windows", 0)
    cond = cond.astype(cdt)
    # the chunks CHAIN the skip accumulator through the kernels: the
    # first seeds it with the summed per-layer bias, later chunks read
    # the running total in-kernel (fused_stack_chunk_acc) — no
    # [B,T,S]-sized XLA combine fusions between chunks (round-4
    # profile: 1.6 ms of pure HBM glue at flagship B=64)
    skips = jnp.sum(bs, axis=0).reshape(1, -1)
    for i, l0 in enumerate(range(0, L, per)):
        l1 = min(l0 + per, L)
        if i == 0 and ids is not None:
            # in-kernel input embedding: ids + the [2,mu,R] table go
            # in; the materialized h [B,T,R] (and its dh in the
            # backward) never touch HBM
            wemb = params["emb"]["w"].astype(cdt)
            bemb = params["emb"]["b"].reshape(1, -1).astype(cdt)
            h, skips = chunk_embed(
                tuple(dils[l0:l1]), interpret, save_gates,
                bwd_windows, ids, wemb, bemb, cond, gct[:, l0:l1],
                wff[l0:l1], vc[l0:l1], wr[l0:l1], br[l0:l1],
                ws[l0:l1], skips)
            continue
        h, skips = (chunk if i == 0 else chunk_acc)(
            tuple(dils[l0:l1]), interpret, save_gates, bwd_windows, h,
            cond, gct[:, l0:l1], wff[l0:l1], vc[l0:l1],
            wr[l0:l1], br[l0:l1], ws[l0:l1], skips)
    return skips
