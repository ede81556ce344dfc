"""Subprocess worker for the localhost 2-process multi-controller test
(tests/test_distributed.py::test_two_process_localhost_matches_single).

Each process runs the SAME program — the REAL ``train()`` loop on the
tiny config and a fixed sine stream — through the real multi-host path:
``initialize_from_env()`` first (before any backend touch), then
``train()``, which builds the global mesh, warms the cross-process
collective context (``warmup_collectives``), creates the state on
device under the global sharding, feeds per-host ``local_batch_slice``
rows through ``put_global_batch`` (the
``make_array_from_process_local_data`` branch when process_count>1),
logs from process 0 only, and checkpoints collectively through orbax.
Prints one JSON line of results.

Env contract (set by the spawning test):
  XLA_FLAGS=--xla_force_host_platform_device_count=<n_local>
  JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
  (unset for the single-process reference run)
  VQVAE_WORKER_STEPS: number of train steps
  VQVAE_WORKER_OUT: run directory (SHARED between the two processes,
  as on a pod with a shared filesystem)
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from vqvae_tpu.parallel.distributed import initialize_from_env  # noqa: E402

multi = initialize_from_env()
expected_procs = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
assert multi == (expected_procs > 1), (multi, expected_procs)
assert jax.process_count() == expected_procs, jax.process_count()

from vqvae_tpu.audio.datasets import SineDataset  # noqa: E402
from vqvae_tpu.configs import get_config  # noqa: E402
from vqvae_tpu.train import train  # noqa: E402


def main() -> None:
    import dataclasses

    n_steps = int(os.environ.get("VQVAE_WORKER_STEPS", "2"))
    cfg = get_config("tiny")
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=8, num_steps=n_steps, log_every=1,
        eval_every=0))
    out_dir = os.environ["VQVAE_WORKER_OUT"]
    state = train(cfg, SineDataset(cfg.data), out_dir=out_dir,
                  echo=False)

    # params/step are replicated -> addressable on every process
    out = {
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "codebook_sum": float(np.sum(np.asarray(
            jax.device_get(state.params["vq"]["codebook"])))),
        "step": int(jax.device_get(state.step)),
    }
    if jax.process_index() == 0:
        with open(os.path.join(out_dir, "log.jsonl")) as f:
            last = [json.loads(line) for line in f][-1]
        out["loss"] = last["loss"]
        out["loss1"] = last["loss1"]
    print("RESULT " + json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
