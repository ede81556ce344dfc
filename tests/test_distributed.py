"""Multi-host scaffolding (parallel/distributed.py): slicing logic and
single-host equivalence — testable without multi-host hardware
(SURVEY.md §4.3 trick: the multi-process pieces are pure functions of
(process_index, process_count) plus a jax.device_put that must reduce
to the identity path on one host)."""

import json
import os

import jax
import numpy as np
import pytest

from vqvae_tpu.parallel.distributed import (
    initialize_from_env,
    local_batch_slice,
    put_global_batch,
)
from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh


def test_local_batch_slice_single_process():
    assert local_batch_slice(32) == slice(0, 32)


def test_local_batch_slice_simulated_hosts():
    got = [local_batch_slice(32, pi, 4) for pi in range(4)]
    assert got == [slice(0, 8), slice(8, 16), slice(16, 24),
                   slice(24, 32)]
    # every global row owned exactly once, in order
    rows = [r for s in got for r in range(s.start, s.stop)]
    assert rows == list(range(32))
    with pytest.raises(ValueError):
        local_batch_slice(30, 0, 4)


def test_put_global_batch_matches_device_put():
    mesh = make_mesh()          # all 8 fake CPU devices
    bshard = batch_sharding(mesh)
    rng = np.random.default_rng(0)
    wav = rng.uniform(-1, 1, (16, 64)).astype(np.float32)
    spk = np.arange(16, dtype=np.int32)
    hsl = local_batch_slice(16)
    w, s = put_global_batch(bshard, wav[hsl], spk[hsl])
    assert w.sharding.is_equivalent_to(bshard, w.ndim)
    np.testing.assert_array_equal(np.asarray(w), wav)
    np.testing.assert_array_equal(np.asarray(s), spk)
    # single array in -> bare array out
    w2 = put_global_batch(bshard, wav)
    np.testing.assert_array_equal(np.asarray(w2), wav)


def test_initialize_from_env_noop_single_host():
    assert initialize_from_env() is False
    assert jax.process_count() == 1


def _run_worker(env, timeout=600):
    import subprocess
    import sys

    base = os.environ.copy()
    base.update(env)
    base["JAX_PLATFORMS"] = "cpu"
    # the worker runs as a script, so sys.path[0] is tests/, not the
    # repo root — make the package importable without an install
    repo_root = os.path.dirname(os.path.dirname(__file__))
    base["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, base.get("PYTHONPATH")) if p)
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    proc = subprocess.run(
        [sys.executable, worker], env=base, timeout=timeout,
        capture_output=True, text=True)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError((proc.stdout, proc.stderr))


def test_two_process_localhost_matches_single(tmp_path):
    """The real multi-controller path (SURVEY.md §2.3 elastic row):
    two CPU processes x 4 virtual devices wired into ONE 8-device mesh
    via jax.distributed.initialize over localhost, each running the
    REAL ``train()`` loop against a SHARED run directory (as on a pod
    filesystem) — per-host local_batch_slice feeding through the
    make_array_from_process_local_data branch, process-0-only logging,
    collective orbax checkpointing. Two train steps must match a
    single-process 8-device run."""
    import socket
    from concurrent.futures import ThreadPoolExecutor

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    steps = {"VQVAE_WORKER_STEPS": "2",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    # single-process reference: same 8 devices in one process
    ref = _run_worker(dict(
        steps, XLA_FLAGS="--xla_force_host_platform_device_count=8",
        VQVAE_WORKER_OUT=str(tmp_path / "ref")))
    assert ref["process_count"] == 1 and ref["step"] == 2

    shared_out = str(tmp_path / "multi")  # ONE dir for both processes

    def spawn(pid):
        return _run_worker(dict(
            steps,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            VQVAE_WORKER_OUT=shared_out))

    with ThreadPoolExecutor(2) as ex:
        r0, r1 = list(ex.map(spawn, [0, 1]))
    if r0["process_id"] == 1:
        r0, r1 = r1, r0

    for r in (r0, r1):
        assert r["process_count"] == 2 and r["step"] == 2
    # both controllers observe the identical replicated result
    assert r0["codebook_sum"] == r1["codebook_sum"]
    assert "loss" not in r1          # logging is process-0-only
    # and it matches the single-process run to float tolerance
    np.testing.assert_allclose(r0["loss"], ref["loss"], rtol=1e-5)
    np.testing.assert_allclose(r0["loss1"], ref["loss1"], rtol=1e-5)
    np.testing.assert_allclose(r0["codebook_sum"], ref["codebook_sum"],
                               rtol=1e-5)
    # the shared run dir holds one coherent set of artifacts
    import os
    assert os.path.exists(os.path.join(shared_out, "log.jsonl"))
    assert os.path.isdir(os.path.join(shared_out, "checkpoints"))
