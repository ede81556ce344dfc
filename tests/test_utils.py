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


def test_step_timer_interval():
    # tick(n) divides the interval over n steps: a 2x-longer gap
    # covering 2 steps must report the same per-step rate
    t = StepTimer(alpha=1.0)
    t.tick()
    time.sleep(0.05)
    t.tick()                 # discarded compile interval
    time.sleep(0.02)
    r1 = t.tick()
    time.sleep(0.04)
    r2 = t.tick(2)
    assert r1 is not None and r2 is not None
    assert abs(r1 - r2) / r1 < 0.5


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
