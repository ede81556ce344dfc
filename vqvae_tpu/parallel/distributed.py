"""Multi-host (multi-process) scaffolding — the SPMD half of
SURVEY.md §2.3 "elastic / multi-node" that can be built and tested
without multi-host hardware (ROADMAP item 5 remainder).

JAX's multi-controller model: every host runs the SAME program,
`jax.distributed.initialize()` wires them into one logical device
mesh, and each host feeds only the batch rows that live on its local
devices. Three pieces:

* ``initialize_from_env()`` — calls ``jax.distributed.initialize``
  when a coordinator is configured. Multi-host REQUIRES the three env
  vars JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
  (or VQVAE_DIST_AUTO=1 for a bare ``initialize()`` where the platform
  plugin can resolve cluster metadata itself); without them each host
  runs standalone. Safe no-op on this single-host box. Must be called
  BEFORE any other JAX API touches the backend (jax.devices(),
  jax.process_count(), any jit) — cli/train.py calls it first thing.
* ``local_batch_slice(B)`` — the contiguous row range of the global
  batch this process owns. The batch axis shards over
  ('slice','data') majormost (parallel/mesh.batch_sharding), and
  make_mesh lays processes out so device order == process order, so
  equal contiguous slices per process are correct.
* ``put_global_batch(sharding, *host_arrays)`` — on one host this is
  ``jax.device_put``; under multi-controller each host passes ONLY its
  local rows and the function assembles the global array with
  ``jax.make_array_from_process_local_data``.

The train loop composes them: ``loader`` yields the full global batch
on every host (the (seed, index) stream is host-independent), each
host device_puts its ``local_batch_slice`` — no cross-host data
traffic, bit-identical to the single-host stream.
"""

from __future__ import annotations

import os

import jax
import numpy as np


_initialized = False


def initialize_from_env() -> bool:
    """Initialise multi-controller JAX if configured; returns whether
    a multi-process runtime is active (safe no-op single-host).

    Order matters: ``jax.distributed.initialize`` must run before ANY
    call that initializes an XLA backend (``jax.devices()``,
    ``jax.process_count()``, jit dispatch, ...) — JAX raises
    RuntimeError otherwise. So this reads only env vars and an own
    module flag before deciding, and consults ``jax.process_count()``
    only after a successful init.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        _initialized = True
        return jax.process_count() > 1
    if os.environ.get("VQVAE_DIST_AUTO") == "1":
        # Platform plugins (TPU pods) can resolve coordinator/process
        # metadata themselves; opt-in so single-host runs stay cheap.
        jax.distributed.initialize()
        _initialized = True
        return jax.process_count() > 1
    return False


def warmup_collectives(mesh) -> None:
    """Establish the cross-process collective context (Gloo TCP pairs
    on CPU, equivalent channel setup elsewhere) while all processes
    are still in lockstep, right after mesh construction.

    Without this the context is first created when the train step
    dispatches its first psum — and per-host compile-cache hits/misses
    can skew processes past the 30s connect timeout (observed:
    ``Gloo context initialization failed: DEADLINE_EXCEEDED``). A
    trivial all-reduce here costs milliseconds and removes the race.
    No-op single-process.
    """
    if jax.process_count() == 1:
        return
    from vqvae_tpu.parallel.mesh import batch_sharding, replicated
    n = len(mesh.devices.flat)
    ones = np.ones((n,), np.float32)
    warm = jax.jit(lambda x: x.sum(), out_shardings=replicated(mesh))(
        put_global_batch(batch_sharding(mesh),
                         ones[local_batch_slice(n)]))
    assert float(warm) == n, warm


def local_batch_slice(global_batch: int,
                      process_index: int | None = None,
                      process_count: int | None = None) -> slice:
    """Rows of the global batch owned by this process (contiguous:
    the batch axis is sharded over the majormost mesh axes, and
    make_mesh orders devices process-major)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{pc} processes")
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)


def put_global_batch(sharding, *host_arrays):
    """Device-put a batch under ``sharding``.

    Single-process: plain ``jax.device_put`` of the full arrays.
    Multi-process: each host passes only its ``local_batch_slice``
    rows; the global array is assembled without cross-host copies.
    """
    if jax.process_count() == 1:
        out = tuple(jax.device_put(a, sharding) for a in host_arrays)
    else:
        out = tuple(
            jax.make_array_from_process_local_data(
                sharding, np.asarray(a))
            for a in host_arrays)
    return out if len(out) > 1 else out[0]
