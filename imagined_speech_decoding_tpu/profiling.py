"""Profiling / tracing: jax.profiler integration + wall-clock timers.

The reference's only tracing facility is the ``Tick``/``Tock`` wall-clock
timers (``src/fast/utils.py:62-98``); those live in ``utils``. The
TPU-native additions here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` emitting
    a TensorBoard-loadable device trace (op-level timeline, HBM usage);
  * ``annotate(name)`` — ``TraceAnnotation`` wrapper so host-side phases
    show up inside the device trace;
  * ``StepTimer`` — steady-state steps/sec measurement with warmup
    discard and a device-sync callback (on the axon remote backend,
    ``block_until_ready`` does not reliably block — sync by reading back
    a scalar).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, List, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that appears on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def sync_scalar(arr) -> float:
    """Force device completion by reading one scalar back to the host."""
    import jax.numpy as jnp

    flat = arr
    while getattr(flat, "ndim", 0) > 0:
        flat = flat[0]
    return float(flat)


class StepTimer:
    """Steady-state throughput measurement.

    Usage::

        timer = StepTimer(warmup=2)
        for i in range(10):
            out = step(...)
            timer.lap(lambda: sync_scalar(out[0]))
        print(timer.steps_per_sec)
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.laps: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def lap(self, sync: Optional[Callable[[], float]] = None) -> Optional[float]:
        if sync is not None:
            sync()
        now = time.perf_counter()
        self._count += 1
        # The first lap can never produce a delta (no prior timestamp),
        # so warmup=0 behaves like warmup=1 instead of crashing.
        if self._count <= self.warmup or self._t0 is None:
            self._t0 = now
            return None
        delta = now - self._t0
        self._t0 = now
        self.laps.append(delta)
        return delta

    @property
    def mean_lap(self) -> float:
        return sum(self.laps) / len(self.laps) if self.laps else float("nan")

    @property
    def steps_per_sec(self) -> float:
        m = self.mean_lap
        return 1.0 / m if m and m == m else float("nan")
