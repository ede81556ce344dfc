"""Multi-host scaffolding (parallel/distributed.py): slicing logic and
single-host equivalence — testable without multi-host hardware
(SURVEY.md §4.3 trick: the multi-process pieces are pure functions of
(process_index, process_count) plus a jax.device_put that must reduce
to the identity path on one host)."""

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
