"""Vector quantizer with straight-through gradients
(reference: ``net.py :: class VQ(chainer.Function)``, SURVEY.md §2.1, §3.3).

The reference implements a custom Function whose backward copies the
output cotangent verbatim onto z_e and gives the codebook ``None``
(it learns only through loss2).  In JAX the same gradient topology is
``e_st = z + stop_gradient(e - z)`` — no custom autodiff plumbing —
with:

  loss2 (codebook)   = mean ||sg(z_e) - e||^2
  loss3 (commitment) = mean ||z_e - sg(e)||^2   (scaled by beta upstream)

The nearest-neighbour search is a distance+argmin+gather; the default
path lets XLA fuse it (one [N,d]x[d,K] MXU matmul + row argmin); a fused
Pallas kernel with identical semantics lives in kernels/vq_pallas.py and
is selected with ``impl='pallas'``.

EMA codebook updates (stretch config, BASELINE configs[4]) follow
van den Oord et al. App. A: per-step counts/sums are accumulated into
exponential moving averages; under data parallelism the per-shard
count/sum are psum'd by XLA automatically because the update is plain
arithmetic inside the pjit-ed step.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vqvae_tpu.configs import ModelConfig


class VQState(NamedTuple):
    """EMA accumulator state (unused when cfg.ema is False)."""

    count: jax.Array  # [K]   EMA of assignment counts
    sum: jax.Array    # [K,d] EMA of assigned-vector sums


def init_vq(key, cfg: ModelConfig) -> Dict:
    # N(0,1) rows, mirroring Chainer EmbedID's default init so the
    # early loss2/loss3 magnitudes track the reference
    return {"codebook": jax.random.normal(key, (cfg.K, cfg.d),
                                          cfg.pdtype)}


def init_vq_state(params: Dict) -> VQState:
    cb = params["codebook"]
    # explicit copy: .astype(float32) of an f32 array aliases the
    # codebook buffer, which breaks donation in the jitted train step
    return VQState(count=jnp.zeros((cb.shape[0],), jnp.float32),
                   sum=jnp.array(cb, jnp.float32, copy=True))


def nearest_code(z: jax.Array, codebook: jax.Array,
                 impl: str = "lax") -> jax.Array:
    """Indices ``[...]`` of the L2-nearest codebook row for each z vector."""
    if impl == "pallas":
        from vqvae_tpu.kernels.vq_pallas import vq_argmin_pallas
        flat = z.reshape(-1, z.shape[-1])
        return vq_argmin_pallas(flat, codebook).reshape(z.shape[:-1])
    # ||z - w||^2 = ||z||^2 - 2 z.w + ||w||^2 ; ||z||^2 constant in argmin
    scores = (z @ codebook.T) * 2.0 - jnp.sum(codebook ** 2, axis=-1)
    return jnp.argmax(scores, axis=-1)


def quantize(params: Dict, z: jax.Array, impl: str = "lax"
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """z_e ``[..., d]`` -> (e_st straight-through, e raw, indices).

    ``e_st`` carries dL/de into z_e verbatim (STE); ``e`` is the raw
    gathered embedding (grads flow to the codebook via loss2).
    """
    codebook = params["codebook"].astype(z.dtype)
    idx = nearest_code(jax.lax.stop_gradient(z),
                       jax.lax.stop_gradient(codebook), impl)
    e = codebook[idx]
    e_st = z + jax.lax.stop_gradient(e - z)
    return e_st, e, idx


def vq_losses(z: jax.Array, e: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(loss2 codebook, loss3 commitment) — means over all elements."""
    loss2 = jnp.mean((jax.lax.stop_gradient(z) - e) ** 2)
    loss3 = jnp.mean((z - jax.lax.stop_gradient(e)) ** 2)
    return loss2, loss3


def ema_update(params: Dict, state: VQState, z: jax.Array,
               idx: jax.Array, cfg: ModelConfig
               ) -> Tuple[Dict, VQState]:
    """One EMA codebook update from a batch of assignments.

    Pure arithmetic — safe inside jit/pjit; with a sharded batch the
    one-hot segment sums become psum'd partial sums automatically.
    """
    z = jax.lax.stop_gradient(z.reshape(-1, z.shape[-1])
                              .astype(jnp.float32))
    onehot = jax.nn.one_hot(idx.reshape(-1), cfg.K, dtype=jnp.float32)
    batch_count = jnp.sum(onehot, axis=0)                 # [K]
    batch_sum = onehot.T @ z                              # [K, d]
    decay = cfg.ema_decay
    count = state.count * decay + batch_count * (1 - decay)
    total = state.sum * decay + batch_sum * (1 - decay)
    # Laplace-smoothed counts avoid dead-code divide-by-zero
    n = jnp.sum(count)
    stable = (count + cfg.ema_eps) / (n + cfg.K * cfg.ema_eps) * n
    codebook = (total / stable[:, None]).astype(params["codebook"].dtype)
    return {"codebook": codebook}, VQState(count=count, sum=total)


def usage_update(state: VQState, idx: jax.Array, cfg: ModelConfig
                 ) -> VQState:
    """Track assignment-count EMA WITHOUT touching the codebook — the
    gradient-trained (non-EMA) path's usage signal for dead-code
    restart (round-2 quality check measured the plain gradient codebook
    collapsing to 1/K codes on synthetic harmonics)."""
    onehot = jax.nn.one_hot(idx.reshape(-1), cfg.K, dtype=jnp.float32)
    batch_count = jnp.sum(onehot, axis=0)
    count = state.count * cfg.ema_decay + batch_count * (1 - cfg.ema_decay)
    return VQState(count=count, sum=state.sum)


def restart_dead_codes(params: Dict, state: VQState, z: jax.Array,
                       key: jax.Array, cfg: ModelConfig
                       ) -> Tuple[Dict, VQState]:
    """Re-seed codebook rows whose EMA usage dropped below
    ``cfg.code_restart_threshold`` with random encoder outputs from the
    current batch (classic anti-collapse move; jit-safe arithmetic)."""
    thr = cfg.code_restart_threshold
    z = jax.lax.stop_gradient(z.reshape(-1, z.shape[-1])
                              .astype(jnp.float32))
    picks = jax.random.randint(key, (cfg.K,), 0, z.shape[0])
    candidates = z[picks]                                # [K, d]
    dead = state.count < thr                             # [K]
    codebook = jnp.where(dead[:, None],
                         candidates.astype(params["codebook"].dtype),
                         params["codebook"])
    # reset the EMA stats of restarted rows so they adapt quickly
    count = jnp.where(dead, jnp.full_like(state.count, thr), state.count)
    total = jnp.where(dead[:, None], candidates * thr, state.sum)
    return {"codebook": codebook}, VQState(count=count, sum=total)


def code_perplexity(idx: jax.Array, K: int) -> jax.Array:
    """exp(entropy) of the batch code-usage distribution — the standard
    VQ codebook-health metric (K == fully uniform usage)."""
    onehot = jax.nn.one_hot(idx.reshape(-1), K, dtype=jnp.float32)
    p = jnp.mean(onehot, axis=0)
    return jnp.exp(-jnp.sum(p * jnp.log(p + 1e-10)))
