"""Subprocess worker for the localhost 2-process multi-controller test
(tests/test_distributed.py::test_two_process_localhost_matches_single).

Each process runs the SAME program — tiny config, fixed data stream —
through the real multi-host path: ``initialize_from_env()`` first (before
any backend touch), a global mesh over all processes' devices, per-host
``local_batch_slice`` rows fed through ``put_global_batch`` (which takes
the ``make_array_from_process_local_data`` branch when process_count>1),
and the jitted donated train step. Prints one JSON line of results.

Env contract (set by the spawning test):
  XLA_FLAGS=--xla_force_host_platform_device_count=<n_local>
  JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
  (unset for the single-process reference run)
  VQVAE_WORKER_STEPS: number of train steps
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from vqvae_tpu.parallel.distributed import (  # noqa: E402
    initialize_from_env,
    local_batch_slice,
    put_global_batch,
)

multi = initialize_from_env()
expected_procs = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
assert multi == (expected_procs > 1), (multi, expected_procs)
assert jax.process_count() == expected_procs, jax.process_count()

from vqvae_tpu.audio.datasets import SineDataset  # noqa: E402
from vqvae_tpu.configs import get_config  # noqa: E402
from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh  # noqa: E402
from vqvae_tpu.train import create_train_state, make_train_step  # noqa: E402


def main() -> None:
    import dataclasses

    cfg = get_config("tiny")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=8))
    n_steps = int(os.environ.get("VQVAE_WORKER_STEPS", "2"))
    mesh = make_mesh()  # global: every device of every process
    assert len(mesh.devices.flat) == 8, mesh

    jit_for, shardings_of = make_train_step(cfg, mesh)
    abs_state = jax.eval_shape(
        lambda: create_train_state(jax.random.PRNGKey(0), cfg))
    sh = shardings_of(abs_state)
    # multi-host-safe init: create the state ON device under the global
    # sharding (a host-side device_put of non-addressable shards would
    # not be portable)
    state = jax.jit(lambda: create_train_state(jax.random.PRNGKey(0), cfg),
                    out_shardings=sh)()
    step_fn = jit_for(sh)

    bsh = batch_sharding(mesh)
    B = cfg.train.batch_size
    hsl = local_batch_slice(B)
    ds = SineDataset(cfg.data)
    rng = np.random.default_rng(0)  # host-independent stream
    metrics = None
    for _ in range(n_steps):
        wavs, spks = zip(*[ds.sample(rng) for _ in range(B)])
        wav = np.stack(wavs)
        spk = np.asarray(spks, np.int32)
        w, s = put_global_batch(bsh, wav[hsl], spk[hsl])
        state, metrics = step_fn(state, w, s)

    # metrics are replicated -> addressable on every process; so is the
    # codebook (P() at model=1)
    out = {
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "loss": float(metrics["loss"]),
        "loss1": float(metrics["loss1"]),
        "codebook_sum": float(np.sum(np.asarray(
            jax.device_get(state.params["vq"]["codebook"])))),
        "step": int(jax.device_get(state.step)),
    }
    print("RESULT " + json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
