"""Tests for the native acquisition ring buffer (native/eegring.cpp).

The consistency test drives a real producer thread against a snapshotting
consumer and checks every snapshot is a contiguous, un-torn window — the
property the seqlock protocol guarantees.
"""

import threading

import numpy as np
import pytest

from imagined_speech_decoding_tpu import ringbuf

pytestmark = pytest.mark.skipif(
    not ringbuf.native_available(), reason="no C++ toolchain for libeegring"
)


def _pattern(n_channels, start, n):
    """(C, n) chunk where sample with global index g on channel c has the
    exactly-representable float32 value g + c/8."""
    g = np.arange(start, start + n, dtype=np.float32)
    c = np.arange(n_channels, dtype=np.float32)[:, None] / 8.0
    return g[None, :] + c


class TestBasics:
    def test_push_snapshot_roundtrip(self):
        with ringbuf.NativeRingBuffer(4, 32) as ring:
            assert not ring.ready(8)
            ring.push(_pattern(4, 0, 10))
            assert ring.total_pushed == 10
            out, end = ring.snapshot_latest(8)
            assert end == 10
            np.testing.assert_array_equal(out, _pattern(4, 2, 8))

    def test_wraparound(self):
        with ringbuf.NativeRingBuffer(2, 16) as ring:
            for start in range(0, 50, 5):
                ring.push(_pattern(2, start, 5))
            out, end = ring.snapshot_latest(16)
            assert end == 50
            np.testing.assert_array_equal(out, _pattern(2, 34, 16))

    def test_oversized_chunk_keeps_tail(self):
        with ringbuf.NativeRingBuffer(3, 16) as ring:
            ring.push(_pattern(3, 0, 100))
            assert ring.total_pushed == 100
            out, end = ring.snapshot_latest(16)
            assert end == 100
            np.testing.assert_array_equal(out, _pattern(3, 84, 16))

    def test_insufficient_raises(self):
        with ringbuf.NativeRingBuffer(2, 16) as ring:
            ring.push(_pattern(2, 0, 4))
            with pytest.raises(RuntimeError, match="need 8"):
                ring.snapshot_latest(8)

    def test_window_larger_than_capacity_raises(self):
        with ringbuf.NativeRingBuffer(2, 16) as ring:
            ring.push(_pattern(2, 0, 16))
            with pytest.raises(ValueError, match="capacity"):
                ring.snapshot_latest(32)

    def test_closed_ring_raises_not_segfaults(self):
        ring = ringbuf.NativeRingBuffer(2, 16)
        ring.close()
        with pytest.raises(RuntimeError, match="closed"):
            ring.push(_pattern(2, 0, 4))
        with pytest.raises(RuntimeError, match="closed"):
            ring.snapshot_latest(8)

    def test_monotonic_end_index(self):
        with ringbuf.NativeRingBuffer(2, 64) as ring:
            ring.push(_pattern(2, 0, 32))
            _, e1 = ring.snapshot_latest(16)
            ring.push(_pattern(2, 32, 8))
            _, e2 = ring.snapshot_latest(16)
            assert (e1, e2) == (32, 40)


class TestConcurrentConsistency:
    def test_no_torn_snapshots_under_concurrent_push(self):
        """Producer thread streams the global-index pattern; every
        consumer snapshot must be a contiguous pattern window (a torn
        copy would mix samples from different generations)."""
        n_channels, capacity, window = 4, 1024, 256
        total = 200_000
        ring = ringbuf.NativeRingBuffer(n_channels, capacity)

        def produce():
            start = 0
            rng = np.random.default_rng(0)
            while start < total:
                n = int(rng.integers(1, 64))
                ring.push(_pattern(n_channels, start, n))
                start += n

        t = threading.Thread(target=produce)
        t.start()
        checked = 0
        try:
            while t.is_alive() or checked == 0:
                if not ring.ready(window):
                    continue
                out, end = ring.snapshot_latest(window)
                expected = _pattern(n_channels, end - window, window)
                np.testing.assert_array_equal(out, expected)
                checked += 1
        finally:
            t.join()
        out, end = ring.snapshot_latest(window)
        np.testing.assert_array_equal(out, _pattern(n_channels, end - window, window))
        assert checked > 10, f"only {checked} concurrent snapshots exercised"
        ring.close()


class TestStreamingDecoderNative:
    def test_native_matches_python_ring(self):
        """The native-backed StreamingDecoder decodes the same window as
        the numpy-backed one for identical pushes."""
        from imagined_speech_decoding_tpu.serving import StreamingDecoder

        seen = {}

        def fake_decoder(x):
            seen["window"] = np.asarray(x)[0]
            return np.ones((1, 5), np.float32) / 5.0

        rng = np.random.default_rng(3)
        chunks = [rng.normal(size=(4, n)).astype(np.float32) for n in (7, 40, 13, 29)]

        py = StreamingDecoder(fake_decoder, 4, 64)
        nat = StreamingDecoder(fake_decoder, 4, 64, native=True)
        for ch in chunks:
            py.push(ch)
            nat.push(ch)
        assert py.ready and nat.ready
        py.decode_latest()
        py_window = seen["window"].copy()
        nat.decode_latest()
        np.testing.assert_array_equal(seen["window"], py_window)
        nat.close()
