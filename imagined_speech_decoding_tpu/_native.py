"""Shared loader for the C++ native tier (``native/*.so``).

One implementation of the build-on-demand + load + availability-probe
boilerplate used by ``data.fastcache`` (libeegcache) and ``ringbuf``
(libeegring): resolve the ``native/`` dir, run ``build.sh`` if the
requested library is missing, wrap loader failures in ``RuntimeError``
so callers can probe availability without crashing on a foreign-arch
``.so``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess


def native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def load_native_lib(name: str, fallback_hint: str) -> ctypes.CDLL:
    """Load ``native/<name>`` (building the native tier on demand).

    Raises ``RuntimeError`` when the library cannot be built or loaded;
    ``fallback_hint`` names the pure-Python alternative in the message.
    """
    so_path = os.path.join(native_dir(), name)
    if not os.path.exists(so_path):
        build = os.path.join(native_dir(), "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise RuntimeError(
                f"{name} missing and build failed ({e}); {fallback_hint}"
            ) from e
    try:
        return ctypes.CDLL(so_path)
    except OSError as e:  # present but unloadable (foreign arch/glibc)
        raise RuntimeError(f"{name} could not be loaded ({e}); {fallback_hint}") from e
