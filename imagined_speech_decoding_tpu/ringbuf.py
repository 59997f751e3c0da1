"""ctypes bindings for libeegring — the native acquisition ring buffer.

Native serving tier (see ``native/eegring.cpp``): a lock-free
single-producer ring that an acquisition thread fills concurrently with
the decode loop snapshotting the latest window — bounded-latency
consistency without the GIL serializing producer and consumer (the
pure-Python fallback is ``serving.StreamingDecoder``'s numpy ring).
Built on demand by ``native/build.sh``; raises cleanly when no compiler
is available.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from ._native import load_native_lib

_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = load_native_lib(
        "libeegring.so", "use serving.StreamingDecoder's Python ring instead"
    )
    lib.eegring_create.restype = ctypes.c_void_p
    lib.eegring_create.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
    lib.eegring_destroy.argtypes = [ctypes.c_void_p]
    lib.eegring_channels.restype = ctypes.c_uint32
    lib.eegring_channels.argtypes = [ctypes.c_void_p]
    lib.eegring_capacity.restype = ctypes.c_uint32
    lib.eegring_capacity.argtypes = [ctypes.c_void_p]
    lib.eegring_total.restype = ctypes.c_uint64
    lib.eegring_total.argtypes = [ctypes.c_void_p]
    lib.eegring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.eegring_snapshot.restype = ctypes.c_longlong
    lib.eegring_snapshot.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    """True if the native ring can be built/loaded on this host."""
    try:
        _load_lib()
        return True
    except RuntimeError:
        return False


class NativeRingBuffer:
    """Lock-free (C, capacity) sample ring; see module docstring.

    ``push`` may be called from a different (even non-Python) thread than
    ``snapshot_latest``; snapshots are tear-checked and retried.
    """

    def __init__(self, n_channels: int, capacity: int):
        self._lib = _load_lib()
        self._ptr = self._lib.eegring_create(n_channels, capacity)
        if not self._ptr:
            raise ValueError("invalid ring dimensions")
        self.n_channels = n_channels
        self.capacity = capacity

    def _handle(self):
        """Guard every C call: a NULL handle after close() would be
        dereferenced by the native code (segfault, not an exception)."""
        if not self._ptr:
            raise RuntimeError("ring buffer is closed")
        return self._ptr

    def push(self, chunk: np.ndarray) -> None:
        """Append ``(C, n)`` samples (producer side)."""
        h = self._handle()
        chunk = np.ascontiguousarray(chunk, np.float32)
        if chunk.ndim != 2 or chunk.shape[0] != self.n_channels:
            raise ValueError(f"expected ({self.n_channels}, n), got {chunk.shape}")
        self._lib.eegring_push(
            h, chunk.ctypes.data_as(ctypes.c_void_p), chunk.shape[1]
        )

    @property
    def total_pushed(self) -> int:
        return int(self._lib.eegring_total(self._handle()))

    def ready(self, window: int) -> bool:
        return self.total_pushed >= window

    def snapshot_latest(self, window: int, max_retries: int = 64) -> tuple:
        """Copy the latest ``(C, window)`` samples.

        Returns ``(samples, end_index)`` where ``end_index`` is the
        global sample count at capture (monotonic — lets callers detect
        duplicate/skipped windows). Raises if fewer than ``window``
        samples were ever pushed, or if the producer outran the consumer
        ``max_retries`` times (window too close to capacity).
        """
        h = self._handle()
        if window > self.capacity:
            raise ValueError(
                f"window {window} exceeds ring capacity {self.capacity}"
            )
        out = np.empty((self.n_channels, window), np.float32)
        rc = self._lib.eegring_snapshot(
            h, out.ctypes.data_as(ctypes.c_void_p), window, max_retries
        )
        if rc == -1:
            raise RuntimeError(
                f"ring has {self.total_pushed} samples; need {window}"
            )
        if rc == -2:
            raise RuntimeError(
                f"snapshot torn {max_retries} times; enlarge capacity "
                f"(window {window} / capacity {self.capacity})"
            )
        return out, int(rc)

    def close(self) -> None:
        if self._ptr:
            self._lib.eegring_destroy(self._ptr)
            self._ptr = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
