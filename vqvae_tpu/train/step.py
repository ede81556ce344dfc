"""The jitted train step (reference: ``StandardUpdater.update`` /
``MultiprocessParallelUpdater`` — SURVEY.md §3.1 hot loop).

Everything the reference does per iteration — forward, three losses,
backward, NCCL gradient allreduce, Adam update — is ONE XLA program:
``value_and_grad`` of the fused forward, gradient psum implied by the
batch's 'data' sharding, optax Adam, and (optionally) the EMA codebook
update.  Host work per step is an enqueue.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax

from vqvae_tpu.audio.framing import frame_batch
from vqvae_tpu.configs import Config
from vqvae_tpu.models import forward
from vqvae_tpu.models.vq import ema_update
from vqvae_tpu.parallel.mesh import (
    batch_sharding,
    param_shardings,
    replicated,
)
from vqvae_tpu.train.state import TrainState, make_optimizer


def train_step(state: TrainState, wav: jax.Array, speaker: jax.Array,
               cfg: Config, impl: str = "lax", sp_mesh=None
               ) -> Tuple[TrainState, dict]:
    """One update. wav ``[B, length+1]`` float raw slices, speaker ``[B]``.

    Framing (mu-law companding, next-sample targets) runs fused here —
    on device, sharded — rather than on the host like the reference's
    Preprocess (SURVEY.md §3.4). ``sp_mesh`` (static) routes the
    decoder stack sequence-parallel when the mesh has a 'seq' axis.
    """
    mcfg = cfg.model
    batch = frame_batch(wav, speaker, mcfg.mu, mcfg.mulaw_mode)

    def loss_fn(params):
        loss, (metrics, aux) = forward(params, mcfg, batch, impl,
                                       mesh=sp_mesh)
        return loss, (metrics, aux)

    (_, (metrics, aux)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    updates, opt_state = make_optimizer(cfg).update(
        grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u,
                                    state.params, updates)

    vq_state = state.vq_state
    if mcfg.ema:
        # codebook receives no gradient when EMA (loss2 absent, e_st
        # stops it); overwrite with the EMA estimate
        new_vq, vq_state = ema_update(params["vq"], state.vq_state,
                                      aux["z"], aux["indices"], mcfg)
        if mcfg.code_restart_threshold > 0:
            from vqvae_tpu.models.vq import restart_dead_codes
            key = jax.random.fold_in(
                jax.random.PRNGKey(cfg.train.seed + 101), state.step)
            new_vq, vq_state = restart_dead_codes(
                new_vq, vq_state, aux["z"], key, mcfg)
        params = dict(params, vq=new_vq)
    elif mcfg.code_restart_threshold > 0:
        # gradient-trained codebook + dead-code restart: usage-count
        # EMA only (the codebook itself keeps learning via loss2);
        # dead rows re-seed from the current batch's encoder outputs
        from vqvae_tpu.models.vq import restart_dead_codes, usage_update
        vq_state = usage_update(state.vq_state, aux["indices"], mcfg)
        key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.train.seed + 101), state.step)
        new_vq, vq_state = restart_dead_codes(
            params["vq"], vq_state, aux["z"], key, mcfg)
        params = dict(params, vq=new_vq)

    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, vq_state=vq_state)
    return new_state, metrics


def eval_step(params, wav: jax.Array, speaker: jax.Array,
              cfg: Config, impl: str = "lax", sp_mesh=None) -> dict:
    """Validation forward (reference: the Evaluator extension over the
    valid split — SURVEY.md §2.1 Training CLI row). Same fused forward,
    no grads/update."""
    batch = frame_batch(wav, speaker, cfg.model.mu,
                        cfg.model.mulaw_mode)
    _, (metrics, _) = forward(params, cfg.model, batch, impl,
                              mesh=sp_mesh)
    return metrics


def _sp_mesh_or_none(mesh):
    """The mesh itself when it carries an active sequence-parallel
    axis (routes the decoder through parallel/sp_decoder.py)."""
    return mesh if ("seq" in mesh.axis_names
                    and mesh.shape["seq"] > 1) else None


def make_eval_step(cfg: Config, mesh, impl: str = "lax") -> Callable:
    return jax.jit(
        partial(eval_step, cfg=cfg, impl=impl,
                sp_mesh=_sp_mesh_or_none(mesh)),
        in_shardings=(None, batch_sharding(mesh), batch_sharding(mesh)),
        out_shardings=replicated(mesh),
    )


def make_train_step(cfg: Config, mesh, impl: str = "lax"
                    ) -> Tuple[Callable, Callable]:
    """Returns (jitted step, state_shardings) for ``mesh``.

    The step is donated (state buffers reused in-place); inputs arrive
    batch-sharded over 'data'; XLA inserts the gradient reductions.
    """
    def state_shardings(state: TrainState) -> TrainState:
        return TrainState(
            step=replicated(mesh),
            params=param_shardings(mesh, state.params),
            opt_state=param_shardings(mesh, state.opt_state),
            vq_state=param_shardings(mesh, state.vq_state),
        )

    def jit_step(shardings):
        return jax.jit(
            partial(train_step, cfg=cfg, impl=impl,
                    sp_mesh=_sp_mesh_or_none(mesh)),
            in_shardings=(shardings, batch_sharding(mesh),
                          batch_sharding(mesh)),
            out_shardings=(shardings, replicated(mesh)),
            donate_argnums=(0,),
        )

    return jit_step, state_shardings
