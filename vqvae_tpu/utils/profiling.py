"""Tracing / profiling (SURVEY.md §5.1).

The reference has no profiler — only a ProgressBar iterations/sec
display.  The TPU rebuild exposes:

* ``profile_trace(dir)`` — context manager around ``jax.profiler``
  producing a TensorBoard-compatible trace (xplane) of device + host
  activity; view with ``tensorboard --logdir <dir>``.
* ``StepTimer`` — cheap EMA wall-clock step timer for the console
  (the ProgressBar equivalent, without a TTY dependency).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Smoothed steps/sec over HOST-SYNCHRONIZED intervals.

    Call ``tick(n)`` only at points where the device has provably
    caught up (e.g. right after a ``device_get`` of the step's
    metrics), passing the number of steps since the previous tick.
    Ticking every step without a sync would measure the host's
    ENQUEUE rate — jit dispatch is asynchronous, so that number can
    run several-fold above real device throughput.
    """

    def __init__(self, alpha: float = 0.5):
        self.alpha = alpha
        self.ema = None          # smoothed seconds per step
        self._last = None
        self._ticks = 0

    def tick(self, n: int = 1) -> float | None:
        """Record an ``n``-step synchronized interval; returns smoothed
        steps/sec (None until a steady-state interval exists). The
        FIRST interval is discarded: it contains jit compilation,
        which would poison the EMA for many intervals."""
        now = time.perf_counter()
        self._ticks += 1
        if self._last is None:
            self._last = now
            return None
        dt = (now - self._last) / max(1, n)
        self._last = now
        if self._ticks == 2:        # interval containing the compile
            return None
        self.ema = dt if self.ema is None else \
            (1 - self.alpha) * self.ema + self.alpha * dt
        return 1.0 / self.ema if self.ema else None

    def reset(self) -> None:
        """Restart the current interval without recording it — call
        after non-training work at a tick boundary (e.g. a validation
        pass) so its wall time never deflates a training interval."""
        if self._last is not None:
            self._last = time.perf_counter()
