"""Training loop (reference: ``train.py`` Trainer wiring + trainer.run()
— SURVEY.md §3.1).

Host responsibilities per step are minimal: pull a prefetched numpy
batch, device_put with the 'data' sharding, enqueue the compiled step.
Logging/checkpoint triggers mirror the reference's extension triggers.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from vqvae_tpu.configs import Config
from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
from vqvae_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from vqvae_tpu.train.metrics import MetricsLogger
from vqvae_tpu.train.state import TrainState, create_train_state
from vqvae_tpu.train.step import make_train_step


def train(cfg: Config, dataset, out_dir: Optional[str] = None,
          resume: bool = False, num_steps: Optional[int] = None,
          mesh=None, impl: str = "lax", echo: bool = True,
          valid_dataset=None) -> TrainState:
    """Run training; returns the final TrainState (fully replicated
    leaves stay sharded — use jax.device_get on what you need)."""
    out_dir = out_dir or cfg.train.out_dir
    num_steps = num_steps if num_steps is not None else cfg.train.num_steps
    mesh = mesh or make_mesh(cfg.train.mesh_data, cfg.train.mesh_model,
                             cfg.train.mesh_slices, cfg.train.mesh_seq)
    n_data = mesh.shape["data"] * mesh.shape.get("slice", 1)
    assert cfg.train.batch_size % n_data == 0, (
        f"global batch {cfg.train.batch_size} must divide the "
        f"batch-sharding axes ({n_data} devices)")
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(out_dir, exist_ok=True)
    # record the resolved config so decode-side CLIs reload it instead
    # of requiring a matching --preset (configs/presets.save_config)
    if jax.process_index() == 0:
        from vqvae_tpu.configs import save_config
        save_config(cfg, out_dir)

    jit_step_for, state_shardings = make_train_step(cfg, mesh, impl)
    init = lambda: create_train_state(  # noqa: E731
        jax.random.PRNGKey(cfg.train.seed), cfg)
    if jax.process_count() > 1:
        # multi-controller: establish the cross-process collective
        # context while all hosts are in lockstep, and create the
        # state ON device under the global sharding (a host-side
        # device_put of non-addressable shards is not portable)
        from vqvae_tpu.parallel.distributed import warmup_collectives
        warmup_collectives(mesh)
        shardings = state_shardings(jax.eval_shape(init))
        state = jax.jit(init, out_shardings=shardings)()
    else:
        state = init()
        shardings = state_shardings(state)
        state = jax.device_put(state, shardings)
    step_fn = jit_step_for(shardings)

    start = 0
    if resume and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        state = jax.device_put(state, shardings)
        start = int(jax.device_get(state.step))

    from vqvae_tpu.audio.grain_loader import make_loader
    from vqvae_tpu.parallel.distributed import (
        local_batch_slice, put_global_batch,
    )
    from vqvae_tpu.train.evaluator import Evaluator
    from vqvae_tpu.utils.profiling import StepTimer, profile_trace
    # deterministic, resumable stream: batch i is a pure function of
    # (seed, i); resuming at step N replays exactly what a straight run
    # would have seen (reference parity: iterator-position restore).
    # Both loader kinds ("threads" default, "grain") produce the SAME
    # stream — audio/grain_loader.py.
    loader = make_loader(cfg.train.loader, dataset,
                         cfg.train.batch_size, seed=cfg.train.seed,
                         start_batch=start)
    # metrics/plots are written by process 0 only (on a pod every host
    # runs this loop; checkpointing below stays collective — orbax
    # requires all processes to participate)
    logger = (MetricsLogger(out_dir, tensorboard=cfg.train.tensorboard)
              if jax.process_index() == 0 else None)
    bshard = batch_sharding(mesh)
    # multi-host: every host sees the same (seed, index) stream and
    # device-puts only its own rows (parallel/distributed.py);
    # single-host this is the identity slice + a plain device_put
    hsl = local_batch_slice(cfg.train.batch_size)

    evaluator = None
    if valid_dataset is not None and cfg.train.eval_every > 0:
        evaluator = Evaluator(valid_dataset, cfg, mesh, impl)

    prof = cfg.train.profile_steps
    prof_ctx = None
    timer = StepTimer()
    timed_to = start          # last step covered by a timer interval
    try:
        metrics = None
        for step in range(start, num_steps):
            if prof and step == start + 10:
                prof_ctx = profile_trace(os.path.join(out_dir, "profile"))
                prof_ctx.__enter__()
            wav, spk = next(loader)
            wav, spk = put_global_batch(bshard, wav[hsl], spk[hsl])
            state, metrics = step_fn(state, wav, spk)
            if prof and step == start + 10 + prof - 1:
                jax.device_get(metrics["loss"])
                prof_ctx.__exit__(None, None, None)
                prof_ctx, prof = None, 0
            do_log = ((step + 1) % cfg.train.log_every == 0
                      or step == start)
            # eval fires on ITS schedule (and forces a log row), not
            # only when it happens to coincide with a log step
            do_eval = (evaluator is not None
                       and (step + 1) % cfg.train.eval_every == 0)
            if do_log or do_eval:
                rec = sps = None
                if logger is not None:
                    rec = dict(jax.device_get(metrics))
                    # the device_get above is a sync point, so the
                    # timer interval measures real device throughput,
                    # not the host's async enqueue rate — and it is
                    # closed BEFORE the evaluator runs, so a
                    # full-split validation pass never deflates the
                    # reported training rate (utils/profiling.py)
                    sps = timer.tick(step + 1 - timed_to)
                    timed_to = step + 1
                # the eval step is collective — every process runs it
                ev = evaluator(state.params) if do_eval else None
                if do_eval:
                    timer.reset()  # keep eval out of the NEXT interval
                if logger is not None:
                    if sps is not None:
                        rec["steps_per_sec"] = sps
                    if ev is not None:
                        rec.update(ev)
                    logger.log(step + 1, rec, echo)
            if (step + 1) % cfg.train.checkpoint_every == 0:
                save_checkpoint(ckpt_dir, state, cfg.train.keep_checkpoints)
        if num_steps > start and (num_steps % cfg.train.checkpoint_every):
            save_checkpoint(ckpt_dir, state, cfg.train.keep_checkpoints)
        if logger is not None:
            logger.plot()
    finally:
        if prof_ctx is not None:
            prof_ctx.__exit__(None, None, None)
        loader.close()
        if logger is not None:
            logger.close()
    return state
