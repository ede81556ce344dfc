"""utils/ tests: profiling trace + step timer."""

import os
import time

from vqvae_tpu.utils import StepTimer, profile_trace


def test_step_timer():
    t = StepTimer(alpha=1.0)
    assert t.tick() is None
    time.sleep(0.2)          # "compile" interval — must be discarded
    assert t.tick() is None
    time.sleep(0.01)
    r = t.tick()
    assert r is not None and 10 < r < 1000  # compile step not in EMA


def test_profile_trace(tmp_path):
    import jax
    import jax.numpy as jnp
    d = str(tmp_path / "prof")
    with profile_trace(d):
        jnp.sum(jnp.ones((128, 128))).block_until_ready()
    # a trace directory with xplane artifacts exists
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no profiler artifacts written"
