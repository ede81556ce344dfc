"""Train state (reference: Chainer ``Trainer`` + ``Adam`` internals —
SURVEY.md §2.2 N5, §3.5).

One pytree carries everything the reference's full-trainer snapshot
carried: params, Adam moments, the step counter, and the EMA-codebook
accumulators (the reference's iterator position has no analogue — the
loader is IID random sampling, so the step counter is the resume
state)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax

from vqvae_tpu.configs import Config
from vqvae_tpu.models import init_model, init_vq_state
from vqvae_tpu.models.vq import VQState


class TrainState(NamedTuple):
    step: jax.Array          # [] int32
    params: Any              # model param pytree
    opt_state: Any           # optax state (Adam moments)
    vq_state: VQState        # EMA accumulators (identity when not EMA)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    adam = optax.adam(t.lr, b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps)
    if t.codebook_lr_mult == 1.0:
        return adam
    # gradient-trained (non-EMA) codebook: Adam self-normalises update
    # magnitude, so scaling loss2 does nothing — a per-leaf multiplier
    # on the codebook's Adam update is the lever (quality study in
    # docs/PERF.md "gradient codebook"). Chained AFTER adam so only the
    # final update scales; masked so every other leaf is untouched.
    def codebook_mask(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(k, "key", None) == "codebook" for k in path),
            tree)
    return optax.chain(
        adam,
        optax.masked(
            optax.scale(float(t.codebook_lr_mult)), codebook_mask))


def create_train_state(key, cfg: Config) -> TrainState:
    params = init_model(key, cfg.model)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        opt_state=opt_state,
        vq_state=init_vq_state(params),
    )
