"""Checkpoint / resume via orbax (reference:
``extensions.snapshot`` + ``serializers.load_npz`` — SURVEY.md §5.4).

The reference snapshots the whole Trainer (params, Adam state, iterator
position, triggers).  Here one orbax checkpoint holds the full
TrainState pytree (params, opt moments, step, EMA accumulators);
writes are atomic (orbax renames on commit), so a preemption mid-write
never corrupts the resume point.  Weights-only export mirrors
``snapshot_object`` for the generator CLI.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from vqvae_tpu.train.state import TrainState


def _manager(directory: str, keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True),
    )


def save_checkpoint(directory: str, state: TrainState,
                    keep: int = 5) -> None:
    mgr = _manager(directory, keep)
    step = int(jax.device_get(state.step))
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, template: TrainState,
                       step: int | None = None) -> TrainState:
    """Restore into the (possibly sharded) structure of ``template``."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    assert step is not None, f"no checkpoint under {directory}"
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      template)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored


def export_weights(path: str, params: Any) -> None:
    """Weights-only .npz export (reference ``snapshot_object``)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp): np.asarray(jax.device_get(v))
              for kp, v in flat}
    np.savez(path, **arrays)


def load_weights_npz(path: str, template: Any) -> Any:
    """Load a weights-only .npz back into the structure of ``template``
    (reference: ``load_npz`` of a ``snapshot_object`` — the generator
    CLI's lightweight model-only load path)."""
    z = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, t in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        assert key in z.files, f"missing weight {key} in {path}"
        a = z[key]
        assert a.shape == t.shape, (key, a.shape, t.shape)
        leaves.append(jax.numpy.asarray(a, t.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
