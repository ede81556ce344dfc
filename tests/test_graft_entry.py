"""Driver-contract checks: entry() compiles single-device,
dryrun_multichip runs a real sharded train step on the 8-device CPU
mesh."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry
    fn, args = entry()
    loss, metrics = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert {"loss1", "loss2", "loss3"} <= set(metrics)


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_dryrun_multichip_nondivisible():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(5)
