"""Tracing/profiling subsystem (SURVEY §5): jax.profiler integration and
the steady-state step timer used by bench.py and docs/PERFORMANCE.md
measurements. Reference analogue: the Tick/Tock wall-clock timers
(``/root/reference/src/fast/utils.py:62-98``) — those live in utils and
are covered by test_utils; this file covers the TPU-native additions."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.profiling import StepTimer, annotate, sync_scalar, trace


class TestStepTimer:
    def test_warmup_laps_discarded(self):
        t = StepTimer(warmup=2)
        assert t.lap() is None
        assert t.lap() is None
        assert t.lap() is not None
        assert len(t.laps) == 1

    def test_warmup_zero_behaves_like_one(self):
        """The first lap has no prior timestamp, so warmup=0 must not
        crash or record a garbage delta."""
        t = StepTimer(warmup=0)
        assert t.lap() is None
        assert t.lap() is not None
        assert len(t.laps) == 1

    def test_mean_and_rate_consistent(self):
        t = StepTimer(warmup=1)
        for _ in range(5):
            t.lap()
        assert len(t.laps) == 4
        assert t.steps_per_sec == pytest.approx(1.0 / t.mean_lap)

    def test_empty_timer_is_nan_not_crash(self):
        t = StepTimer()
        assert np.isnan(t.mean_lap)
        assert np.isnan(t.steps_per_sec)

    def test_sync_callback_invoked_before_timestamp(self):
        calls = []
        t = StepTimer(warmup=1)
        t.lap(sync=lambda: calls.append(1) or 0.0)
        t.lap(sync=lambda: calls.append(2) or 0.0)
        assert calls == [1, 2]


class TestSyncScalar:
    def test_reads_back_first_element(self):
        x = jnp.arange(12.0).reshape(3, 4) + 1.0
        assert sync_scalar(x) == 1.0

    def test_scalar_passthrough(self):
        assert sync_scalar(jnp.float32(2.5)) == 2.5


class TestTrace:
    def test_trace_writes_profile_artifacts(self, tmp_path):
        """One jitted step under trace() must leave a TensorBoard-loadable
        profile tree (plugins/profile/<run>/*) in the logdir."""
        logdir = str(tmp_path / "trace")
        with trace(logdir):
            with annotate("test-step"):
                y = jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8)))
                float(y)
        produced = glob.glob(os.path.join(logdir, "plugins", "profile", "*", "*"))
        assert produced, f"no profile artifacts under {logdir}"

    def test_trace_stops_on_exception(self, tmp_path):
        """The context manager must stop the profiler on error so a later
        trace can start (start_trace raises if one is already active)."""
        logdir = str(tmp_path / "t1")
        with pytest.raises(ValueError, match="boom"):
            with trace(logdir):
                raise ValueError("boom")
        with trace(str(tmp_path / "t2")):
            pass
