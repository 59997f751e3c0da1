"""ctypes bindings for libeegcache — the native binary corpus cache.

Native IO tier of the data layer (see ``native/eegcache.cpp``): a
dependency-free binary tensor container with multi-threaded reads, used
as a faster alternative to the gzip-HDF5 caches for the serving/training
hot path. The shared library is built on demand by ``native/build.sh``
(g++ only); if no compiler is available the module raises cleanly and
the HDF5 layer remains the fallback.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from .._native import load_native_lib

_DTYPES = {np.dtype(np.float32): 0, np.dtype(np.uint8): 1}
_DTYPES_INV = {0: np.dtype(np.float32), 1: np.dtype(np.uint8)}

_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = load_native_lib("libeegcache.so", "use the HDF5 cache layer instead")
    lib.eegcache_write.restype = ctypes.c_int
    lib.eegcache_write.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.eegcache_open.restype = ctypes.c_void_p
    lib.eegcache_open.argtypes = [ctypes.c_char_p]
    lib.eegcache_close.argtypes = [ctypes.c_void_p]
    lib.eegcache_dtype.restype = ctypes.c_uint32
    lib.eegcache_dtype.argtypes = [ctypes.c_void_p]
    lib.eegcache_ndim.restype = ctypes.c_uint32
    lib.eegcache_ndim.argtypes = [ctypes.c_void_p]
    lib.eegcache_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.eegcache_read_all.restype = ctypes.c_int
    lib.eegcache_read_all.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.eegcache_read_rows.restype = ctypes.c_int
    lib.eegcache_read_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_int
    ]
    _lib = lib
    return lib


def available() -> bool:
    """True if the native library is (or can be) built and loaded."""
    try:
        _load_lib()
        return True
    except RuntimeError:
        return False


def write_cache(path: str, array: np.ndarray) -> str:
    """Write a contiguous numpy tensor to a native cache file."""
    lib = _load_lib()
    arr = np.ascontiguousarray(array)
    if arr.dtype not in _DTYPES:
        raise TypeError(f"unsupported dtype {arr.dtype}; use float32/uint8")
    dims = (ctypes.c_uint64 * arr.ndim)(*arr.shape)
    rc = lib.eegcache_write(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p),
        _DTYPES[arr.dtype], arr.ndim, dims,
    )
    if rc != 0:
        raise IOError(f"eegcache_write({path}) failed with code {rc}")
    return path


class FastCache:
    """Reader handle over a native cache file."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.eegcache_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open cache {path}")
        code = self._lib.eegcache_dtype(self._h)
        if code not in _DTYPES_INV:
            # close before raising — no __del__ would free the C handle
            self.close()
            raise TypeError(
                f"cache {path} has on-disk dtype code {code} with no numpy "
                "mapping on this reader (supported: float32, uint8)"
            )
        self.dtype = _DTYPES_INV[code]
        ndim = self._lib.eegcache_ndim(self._h)
        dims = (ctypes.c_uint64 * ndim)()
        self._lib.eegcache_dims(self._h, dims)
        self.shape: Tuple[int, ...] = tuple(int(d) for d in dims)

    def _handle(self):
        """Guard every C call: a NULL handle after close() would be
        dereferenced by the native code (segfault, not an exception)."""
        if not self._h:
            raise RuntimeError("cache reader is closed")
        return self._h

    def read_all(self, n_threads: int = 8) -> np.ndarray:
        h = self._handle()
        out = np.empty(self.shape, self.dtype)
        rc = self._lib.eegcache_read_all(
            h, out.ctypes.data_as(ctypes.c_void_p), n_threads
        )
        if rc != 0:
            raise IOError(f"eegcache_read_all failed with code {rc}")
        return out

    def read_rows(self, start: int, count: int, n_threads: int = 8) -> np.ndarray:
        h = self._handle()
        if start < 0 or count < 0:
            raise ValueError(f"start/count must be non-negative, got {start}/{count}")
        out = np.empty((count,) + self.shape[1:], self.dtype)
        rc = self._lib.eegcache_read_rows(
            h, start, count, out.ctypes.data_as(ctypes.c_void_p), n_threads
        )
        if rc != 0:
            raise IOError(f"eegcache_read_rows failed with code {rc}")
        return out

    def close(self):
        if self._h:
            self._lib.eegcache_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
