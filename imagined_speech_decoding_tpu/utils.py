"""General utilities: ANSI colors, timers, seeding, misc helpers.

Capability parity with the reference utils (reference:
``src/fast/utils.py:17-114``): colored console output, ``Tick``/``Tock``
wall-clock timers with fps, path helpers, and seeding. The JAX twist:
``seed_all`` seeds the *host* RNGs (numpy/random — used for fold splits
and artifact naming) and returns an explicit ``jax.random.PRNGKey`` that
callers thread through the functional training code; there is no global
device RNG state to seed.
"""

from __future__ import annotations

import datetime
import os
import random
import string
import time

import numpy as np


# ---------------------------------------------------------------------------
# ANSI colors (reference: src/fast/utils.py:17-30)
# ---------------------------------------------------------------------------

def _wrap(code: str):
    def color(text) -> str:
        return f"\033[{code}m{text}\033[0m"

    return color


green = _wrap("92")
yellow = _wrap("93")
red = _wrap("91")
blue = _wrap("94")
cyan = _wrap("96")
magenta = _wrap("95")
bold = _wrap("1")


# ---------------------------------------------------------------------------
# Misc helpers (reference: src/fast/utils.py:36-56)
# ---------------------------------------------------------------------------

def convert_to_number(s: str):
    """Parse a string into int or float if possible, else return it unchanged."""
    try:
        return int(s)
    except (TypeError, ValueError):
        pass
    try:
        return float(s)
    except (TypeError, ValueError):
        return s


def first_existing_path(candidates) -> str:
    """First EXISTING path from a candidate list (the reference's
    ``find_available_path``, ``src/fast/utils.py:44-47`` — kept under a
    name that says what it does)."""
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(f"none of the given paths exists: {list(candidates)}")


def next_available_path(path: str) -> str:
    """Return ``path`` if free, else ``path_1``, ``path_2``, ... first free
    one (collision-avoiding output paths; intentionally NOT the
    reference's same-named helper, which returns the first existing)."""
    if not os.path.exists(path):
        return path
    base, ext = os.path.splitext(path)
    i = 1
    while os.path.exists(f"{base}_{i}{ext}"):
        i += 1
    return f"{base}_{i}{ext}"


def now(fmt: str = "%Y-%m-%d %H:%M:%S") -> str:
    return datetime.datetime.now().strftime(fmt)


def random_string(n: int = 8) -> str:
    return "".join(random.choices(string.ascii_lowercase + string.digits, k=n))


# ---------------------------------------------------------------------------
# Timers (reference: src/fast/utils.py:62-98)
# ---------------------------------------------------------------------------

class Tick:
    """Named block timer: ``with Tick('step'): ...`` prints elapsed time + fps.

    Attributes ``delta`` (seconds) and ``fps`` are populated on exit so
    callers can harvest measurements programmatically (used by bench.py).
    """

    def __init__(self, name: str = "", silent: bool = False):
        self.name = name
        self.silent = silent
        self.delta = float("nan")
        self.fps = float("nan")

    def __enter__(self):
        self.t0 = time.perf_counter()
        if self.name and not self.silent:
            print(f"{self.name} ", end="", flush=True)
        return self

    def __exit__(self, *exc):
        self.delta = time.perf_counter() - self.t0
        self.fps = 1.0 / self.delta if self.delta > 0 else float("inf")
        if not self.silent:
            print(f"[{self.delta:.3f} s | {self.fps:.1f} fps]")
        return False


class Tock:
    """Inline timer: ``t = Tock(); ...; t.tock('label')`` prints split times."""

    def __init__(self, silent: bool = False):
        self.silent = silent
        self.t0 = time.perf_counter()
        self.delta = float("nan")
        self.fps = float("nan")

    def tick(self):
        self.t0 = time.perf_counter()
        return self

    def tock(self, name: str = "") -> float:
        self.delta = time.perf_counter() - self.t0
        self.fps = 1.0 / self.delta if self.delta > 0 else float("inf")
        if not self.silent:
            print(f"{name} [{self.delta:.3f} s | {self.fps:.1f} fps]")
        self.t0 = time.perf_counter()
        return self.delta


# ---------------------------------------------------------------------------
# Seeding (reference: src/fast/utils.py:104-114)
# ---------------------------------------------------------------------------

def seed_all(seed: int):
    """Seed host RNGs and return a ``jax.random.PRNGKey``.

    The reference seeds python/numpy/torch/cuda and pins cuDNN to
    deterministic mode. Under JAX, device-side randomness is already
    deterministic given the returned key; numpy/random are seeded because
    fold splitting (sklearn KFold) and host-side shuffles use them.
    """
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


# Deprecated alias: the reference's same-named function has the OPPOSITE
# semantics (first existing path); use the explicit names above.
find_available_path = next_available_path
