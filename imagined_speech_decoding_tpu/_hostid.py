"""Host fingerprint for salting persistent JAX compilation-cache dirs.

XLA:CPU AOT cache entries encode the compile host's CPU features and can
SIGILL when loaded on a machine without them; checkouts (and their cache
dirs) may persist across heterogeneous hosts. Import-light on purpose —
used by ``tests/conftest.py`` before the main package and by
``__graft_entry__.py``.
"""

from __future__ import annotations

import hashlib
import os
import platform
import re
import shutil


def host_fingerprint() -> str:
    """Short hash of this host's CPU identity (feature flags where
    available; processor string + hostname as the fallback so hosts
    without ``/proc/cpuinfo`` still get distinct salts)."""
    try:
        with open("/proc/cpuinfo") as f:
            ident = next((l for l in f if l.startswith(("flags", "Features"))), "")
    except OSError:
        ident = f"{platform.processor()}|{platform.node()}"
    return hashlib.sha256((platform.machine() + ident).encode()).hexdigest()[:12]


def enable_persistent_cache(
    base: str = None, prefix: str = ".jax_cache", min_compile_secs: float = 0.5
) -> str:
    """Turn on JAX's persistent compilation cache in a host-salted dir.

    Call before the first jit execution (import-time config is fine).
    Kills repeat-run compile cost — most importantly the multi-minute
    Mosaic compile of the corpus-preprocessing Pallas IIR kernels
    (VERDICT r1: 914 s cold vs 0.17 s steady) — for bench + every CLI.
    ``base`` defaults to the repo checkout containing this package.
    """
    import jax

    existing = jax.config.jax_compilation_cache_dir
    if existing:  # respect an already-configured cache (e.g. pytest's)
        return existing
    if base is None:
        base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # For a pip-installed package the parent is site-packages —
        # creating/pruning cache dirs there pollutes the install tree
        # (or silently degrades to no cache on a read-only install,
        # reintroducing the multi-minute cold Mosaic compile). Use the
        # user cache instead; a repo checkout (this file's parent has
        # the bench/entry markers) keeps the repo-local dir.
        if not os.path.exists(os.path.join(base, "bench.py")):
            base = os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "imagined_speech_decoding_tpu",
            )
            os.makedirs(base, exist_ok=True)
    path = salted_cache_dir(base, prefix)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


_FINGERPRINT_RE = re.compile(r"^[0-9a-f]{12}$")


def salted_cache_dir(base: str, prefix: str) -> str:
    """Return ``<base>/<prefix>_<fingerprint>``, pruning sibling cache
    dirs salted for OTHER hosts (and the legacy unsalted dir) so stale
    per-host caches don't accumulate in a long-lived checkout.

    Only entries whose suffix after ``prefix_`` is a bare 12-hex host
    fingerprint are pruned: ``.jax_cache_dryrun_<fp>`` must survive a
    prune with prefix ``.jax_cache`` (they are distinct caches — one
    per backend — and deleting the sibling reintroduces the cold
    Mosaic compile the cache exists to kill)."""
    name = f"{prefix}_{host_fingerprint()}"
    try:
        for entry in os.listdir(base):
            if entry == name:
                continue
            is_stale_salted = entry.startswith(prefix + "_") and _FINGERPRINT_RE.match(
                entry[len(prefix) + 1 :]
            )
            if entry == prefix or is_stale_salted:
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
    except OSError:
        pass
    return os.path.join(base, name)
