"""1-D convolution primitives, TPU-first.

The reference leans on cuDNN via ``chainer.functions.convolution_nd`` /
``deconvolution_nd`` (SURVEY.md §2.2 N1).  Here:

* **Causal dilated convs** (the WaveNet hot path, filter size 2-3) are
  expressed as a sum of *time-shifted dense matmuls* — for filter size k:
  ``y[t] = sum_j x[t - (k-1-j)*d] @ w[j]``.  Each tap is one big
  ``[B*T, C_in] x [C_in, C_out]`` matmul that XLA tiles straight onto the
  MXU, and the shifts are free (pad+slice fuses into the surrounding
  computation).  This avoids cuDNN-style small-window conv kernels that
  map poorly to the systolic array.
* **Strided encoder convs** fold time into channels (space-to-depth by
  the stride) and run as shifted dense matmuls too — XLA's own conv
  lowering leaves them at <1% MFU (measured, docs/PERF.md "encoder");
  ``lax.conv_general_dilated`` remains the fallback for T % stride != 0.
* **Upsampling** (latents -> audio rate) is ``lax.conv_transpose``.

Layout is ``[B, T, C]`` (channels on the 128-lane minor dimension).

All params are plain pytrees (dicts of arrays): init lives next to apply,
everything composes with jit/grad/shard_map without framework overhead.
Weight init is LeCun-normal with zero bias, matching Chainer's conv
default so loss curves are comparable (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax


def _lecun_normal(key, shape, fan_in, dtype):
    return jax.random.normal(key, shape, dtype) / math.sqrt(fan_in)


def dense_init(key, in_ch: int, out_ch: int, dtype=jnp.float32,
               bias: bool = True) -> Dict[str, jax.Array]:
    p = {"w": _lecun_normal(key, (in_ch, out_ch), in_ch, dtype)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int,
                dtype=jnp.float32, bias: bool = True
                ) -> Dict[str, jax.Array]:
    """Weights for a 1-D conv: w ``[kernel, in_ch, out_ch]``."""
    p = {"w": _lecun_normal(key, (kernel, in_ch, out_ch),
                            kernel * in_ch, dtype)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def shift_right(x: jax.Array, n: int) -> jax.Array:
    """Shift ``[B, T, C]`` right along T by n, zero-filling (causal pad)."""
    if n == 0:
        return x
    return jnp.pad(x, ((0, 0), (n, 0), (0, 0)))[:, : x.shape[1], :]


def causal_conv_apply(params: Dict[str, jax.Array], x: jax.Array,
                      dilation: int = 1, dtype=None) -> jax.Array:
    """Causal dilated 1-D conv of ``[B, T, C_in] -> [B, T, C_out]``.

    Output at t depends on inputs at {t, t-d, ..., t-(k-1)d} only; the
    left context is zero-padded (equivalent to the reference's padded
    ``convolution_nd`` causal stack).
    """
    w = params["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    k = w.shape[0]
    y = x @ w[k - 1]
    for j in range(k - 1):
        y = y + shift_right(x, (k - 1 - j) * dilation) @ w[j]
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def strided_conv_apply(params: Dict[str, jax.Array], x: jax.Array,
                       stride: int, dtype=None) -> jax.Array:
    """Strided 'SAME' 1-D conv (encoder downsampling):
    ``[B, T, C_in] -> [B, T//stride, C_out]``.

    TPU-first lowering (when ``T % stride == 0``): space-to-depth fold
    of the time axis by ``stride`` into channels, then the conv is a
    handful of *time-shifted dense matmuls* over the folded sequence —
    the same trick the decoder's causal convs use.  XLA's own
    ``conv_general_dilated`` lowering of this shape runs at <1% MFU on
    v5e (the C_in=1 first layer pads to 128 lanes; measured 5.8 ms of
    a 40 ms flagship step — docs/PERF.md "encoder"); the folded-matmul
    form is bandwidth-bound.  Equality with the lax conv is pinned in
    tests/test_ops.py.

    Derivation: SAME with ``T % stride == 0`` pads ``k - s`` total,
    ``(k - s)//2`` on the left, so ``y[n] = sum_j x[ns + j - pad] w[j]``.
    Writing ``j - pad = qs + r`` (``0 <= r < s``) and folding
    ``f[m] = x[ms : (m+1)s]`` (``[T/s, s*C]``), tap ``j`` reads row
    block ``r`` of ``f[n + q]``: group taps by ``q`` into matrices
    ``W_q [s*C, C_out]`` and ``y = sum_q shift(f, -q) @ W_q``.
    """
    w = params["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    B, T, C = x.shape
    k, _, Co = w.shape
    s = stride
    if T % s != 0 or k < s:
        y = lax.conv_general_dilated(
            x, w,
            window_strides=(s,),
            padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if "b" in params:
            y = y + params["b"].astype(y.dtype)
        return y

    pad = (k - s) // 2
    f = x.reshape(B, T // s, s * C)
    # group taps by which folded block they read
    taps: Dict[int, list] = {}
    for j in range(k):
        q, r = divmod(j - pad, s)
        taps.setdefault(q, []).append((r, j))
    y = None
    for q, rj in taps.items():
        wq = jnp.zeros((s * C, Co), w.dtype)
        for r, j in rj:
            wq = wq.at[r * C:(r + 1) * C].set(w[j])
        fq = f
        if q > 0:    # read ahead: shift left, zero-fill the tail
            fq = jnp.pad(f, ((0, 0), (0, q), (0, 0)))[:, q:, :]
        elif q < 0:  # read behind: shift right, zero-fill the head
            fq = jnp.pad(f, ((0, 0), (-q, 0), (0, 0)))[:, :f.shape[1], :]
        t = fq @ wq
        y = t if y is None else y + t
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def upsample_init(key, in_ch: int, out_ch: int, hop: int,
                  kernel_mult: int = 2, dtype=jnp.float32
                  ) -> Dict[str, jax.Array]:
    """Transposed-conv upsampler params (latent rate -> audio rate).

    Reference equivalent: ``DeconvolutionND`` on the VQ output
    (SURVEY.md §2.1 WaveNet decoder row).
    """
    kernel = hop * kernel_mult
    return conv1d_init(key, in_ch, out_ch, kernel, dtype)


def upsample_apply(params: Dict[str, jax.Array], z: jax.Array,
                   hop: int, dtype=None) -> jax.Array:
    """``[B, T_lat, C_in] -> [B, T_lat*hop, C_out]``: stride-``hop``
    SAME transposed conv as TWO packed MXU matmuls (no overlap-add).

    Derivation (kernel K == 2*hop, enforced by config; wf = w flipped
    to match lax.conv_transpose's spatial flip): the SAME output at
    position t = p*hop + s is

        s <  hop/2:  z[p-1] @ wf[s + 3*hop/2] + z[p] @ wf[s + hop/2]
        s >= hop/2:  z[p]   @ wf[s + hop/2]   + z[p+1] @ wf[s - hop/2]

    i.e. every audio sample is (neighbour pair) @ (one tap each).  Pack
    the taps into two ``[2*C_in, hop*C_out]`` weights (the inapplicable
    neighbour's block zeroed) and the whole map is two
    ``[B*T_lat, 2*C_in] x [2*C_in, hop*C_out]`` contractions over the
    once-materialised neighbour concat — a pure row-major reshape away
    from ``[B, T, C_out]``.  The round-4 profile's 5.4 ms "upsampler
    einsum" line (docs/PERF.md) was this op's einsum+overlap-add
    predecessor: the ``[B,T_lat,2*hop,C]`` intermediate and its pad/add/
    slice chains (and their backward mirrors) round-tripped HBM; here
    the only audio-rate tensor is the output itself, and autodiff gives
    the matmul-only backward.  The two-matmul split (p0-taps | p1-taps)
    keeps each output element's f32 tap-sums bitwise identical to the
    predecessor, so frozen golden trajectories are unaffected; the
    zeroed blocks contribute exact zeros to the accumulation.
    Equality with lax.conv_transpose is pinned in tests/test_ops.py.
    """
    w = params["w"]
    if dtype is not None:
        z = z.astype(dtype)
        w = w.astype(dtype)
    K, cin, cout = w.shape
    B, Tl, _ = z.shape
    assert K == 2 * hop, (K, hop)
    assert hop % 2 == 0, hop
    h2 = hop // 2
    # lax.conv_transpose applies the kernel FLIPPED along the spatial
    # axis (verified by impulse probe); flip here so checkpoints trained
    # on the conv path stay bit-compatible
    wf = w[::-1]
    zero = jnp.zeros((h2, cin, cout), wf.dtype)
    # P0 rows (the VALID-conv "p0" taps, r in [0, hop)): pair (z, z_next)
    #   s <  h2 -> z[p]   @ wf[s + h2]   (next block zero)
    #   s >= h2 -> z[p+1] @ wf[s - h2]   (cur block zero)
    wp0 = jnp.concatenate(
        [jnp.concatenate([wf[h2:hop], zero], 0),       # cur taps
         jnp.concatenate([zero, wf[:h2]], 0)], 1)      # next taps
    # P1 rows (the "p1" taps, r in [hop, 2*hop)): pair (z_prev, z)
    #   s <  h2 -> z[p-1] @ wf[s + 3*h2] (cur block zero)
    #   s >= h2 -> z[p]   @ wf[s + h2]   (prev block zero)
    wp1 = jnp.concatenate(
        [jnp.concatenate([wf[3 * h2:], zero], 0),      # prev taps
         jnp.concatenate([zero, wf[hop:3 * h2]], 0)], 1)   # cur taps
    # [hop, 2cin, cout] -> [2cin, hop*cout]
    wp0 = jnp.transpose(wp0, (1, 0, 2)).reshape(2 * cin, hop * cout)
    wp1 = jnp.transpose(wp1, (1, 0, 2)).reshape(2 * cin, hop * cout)

    znext = jnp.pad(z, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    zprev = jnp.pad(z, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    e0 = jnp.concatenate([z, znext], -1).reshape(B * Tl, 2 * cin)
    e1 = jnp.concatenate([zprev, z], -1).reshape(B * Tl, 2 * cin)
    y = (jnp.dot(e0, wp0,
                 preferred_element_type=jnp.float32).astype(z.dtype)
         + jnp.dot(e1, wp1,
                   preferred_element_type=jnp.float32).astype(z.dtype))
    y = y.reshape(B, Tl * hop, cout)
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y
