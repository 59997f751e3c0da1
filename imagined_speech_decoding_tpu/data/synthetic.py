"""Synthetic EEG generator for tests and benchmarks.

The reference tests stand in ``torch.randn`` for EEG
(``tests/conftest.py:57-69``); pure noise can't validate *learning*, so
this generator adds a class-conditional structure: each class imprints a
distinct set of band-limited sinusoidal sources mixed into the montage,
plus 1/f-ish background noise. Models must find the class signature to
beat chance, which makes end-to-end "does training learn?" tests
meaningful without the real (non-redistributable) dataset.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .constants import SFREQ, TARGET_TIMEPOINTS


def synthetic_trials(
    seed: int,
    n_trials: int,
    n_channels: int = 64,
    n_samples: int = TARGET_TIMEPOINTS,
    n_classes: int = 5,
    sfreq: float = SFREQ,
    snr: float = 0.6,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate ``(N, C, T)`` float32 trials with learnable class structure.

    Each class k has 3 oscillatory sources at class-specific frequencies
    (4-30 Hz) with fixed random spatial mixing patterns; trials add phase
    jitter and broadband noise. ``snr`` scales the class signal.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / sfreq

    freqs = 4.0 + 26.0 * rng.random((n_classes, 3))
    mixing = rng.normal(size=(n_classes, 3, n_channels)).astype(np.float32)

    y = rng.integers(0, n_classes, size=n_trials).astype(np.uint8)
    x = rng.normal(scale=1.0, size=(n_trials, n_channels, n_samples)).astype(np.float32)
    # Crude 1/f coloring: mix in a first-order AR(1) low-pass of the
    # white noise (unit-variance normalized), tilting the spectrum
    # toward low frequencies like resting EEG background.
    from scipy.signal import lfilter

    a = 0.9
    smooth = lfilter([1.0], [1.0, -a], x, axis=-1).astype(np.float32)
    smooth *= np.float32(np.sqrt(1.0 - a * a))  # AR(1) stationary gain
    x = (0.5 * x + 0.5 * smooth).astype(np.float32)

    phases = rng.uniform(0, 2 * np.pi, size=(n_trials, 3))
    for k in range(n_classes):
        sel = np.flatnonzero(y == k)
        if sel.size == 0:
            continue
        # sources: (n_sel, 3, T)
        src = np.sin(
            2 * np.pi * freqs[k][None, :, None] * t[None, None, :]
            + phases[sel][:, :, None]
        ).astype(np.float32)
        x[sel] += snr * np.einsum("nst,sc->nct", src, mixing[k])

    return x, y


def synthetic_trials_device(
    key,
    n_trials: int,
    n_channels: int = 64,
    n_samples: int = TARGET_TIMEPOINTS,
    n_classes: int = 5,
    sfreq: float = SFREQ,
    snr: float = 0.6,
    label_noise: float = 0.0,
    dtype=None,
):
    """Device-side (jit-able) synthetic EEG: same class-conditional
    structure as ``synthetic_trials`` but generated with ``jax.random``
    on the accelerator — full-corpus generation in milliseconds (the
    host-numpy path needs minutes for billions of gaussians).

    ``label_noise``: fraction of trials whose RETURNED label is
    re-drawn uniformly from the other classes while the signal keeps
    the true class. This puts a hard ceiling on reachable accuracy —
    ``(1 - p) + p/(K-1) * 0`` vs the true posterior's optimum of
    ``1 - p`` on clean-signal trials — so convergence benches land at a
    pinned intermediate value instead of saturating at 1.0 (an
    accuracy-regression canary: a broken LR schedule / leaked BN stat /
    mis-indexed batch shows up as a drop below the expected band, which
    saturation would mask).

    Returns ``(x (N, C, T), y (N,))`` jax arrays.
    """
    import jax
    import jax.numpy as jnp

    kf, km, ky, kx, kp, kn = jax.random.split(key, 6)
    dtype = dtype or jnp.float32
    freqs = 4.0 + 26.0 * jax.random.uniform(kf, (n_classes, 3))
    mixing = jax.random.normal(km, (n_classes, 3, n_channels), dtype)
    y = jax.random.randint(ky, (n_trials,), 0, n_classes)
    x = jax.random.normal(kx, (n_trials, n_channels, n_samples), dtype)
    phases = jax.random.uniform(kp, (n_trials, 3), minval=0.0, maxval=2 * np.pi)
    t = jnp.arange(n_samples) / sfreq
    src = jnp.sin(
        2 * np.pi * freqs[y][:, :, None] * t[None, None, :] + phases[:, :, None]
    ).astype(dtype)
    sig = jnp.einsum("nst,nsc->nct", src, mixing[y])
    if label_noise > 0.0:
        kf1, kf2 = jax.random.split(kn)
        flip = jax.random.uniform(kf1, (n_trials,)) < label_noise
        # uniform over the K-1 OTHER classes (offset 1..K-1 mod K)
        offset = jax.random.randint(kf2, (n_trials,), 1, n_classes)
        y_out = jnp.where(flip, (y + offset) % n_classes, y)
    else:
        y_out = y
    return x + snr * sig, y_out.astype(jnp.int32)


def synthetic_corpus(
    seed: int,
    n_subjects: int = 15,
    n_trials: int = 350,
    n_channels: int = 64,
    n_samples: int = TARGET_TIMEPOINTS,
    n_classes: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate a full ``(S, N, C, T)`` corpus (per-subject seeds differ)."""
    xs, ys = [], []
    for s in range(n_subjects):
        x, y = synthetic_trials(seed + 1000 * s, n_trials, n_channels, n_samples, n_classes)
        xs.append(x)
        ys.append(y)
    return np.stack(xs), np.stack(ys)


def synthetic_trials_device_chunked(
    key,
    n_trials: int,
    n_channels: int = 64,
    n_samples: int = TARGET_TIMEPOINTS,
    n_classes: int = 5,
    *,
    n_chunks: int = 6,
    label_noise: float = 0.0,
    dtype=None,
    **kwargs,
):
    """:func:`synthetic_trials_device` built as ``n_chunks`` invocations
    of one small program + an on-device concat, with the chunk buffers
    freed before returning.

    Why chunks: the remote TPU service's cost to stand up a COLD program
    scales superlinearly (and with high variance) in the program's
    output size — a fresh 1 GB-output generator's first invocation
    measured 68 s once and >9 min another time, while an ~180 MB
    (875-trial) program warms in seconds; the service caches programs
    across client processes, so warm calls are sub-second either way.
    Chunk keys are ``fold_in(key, i)`` — deterministic, identical
    statistics (a different stream than the monolithic generator).
    Freeing the chunk buffers matters: holding them alongside the
    concatenated corpus doubles its HBM footprint into whatever trains
    next (measured OOM at the 75-model bench stack).
    """
    import jax
    import jax.numpy as jnp

    if n_trials % n_chunks:
        raise ValueError(f"n_chunks={n_chunks} must divide n_trials={n_trials}")
    per = n_trials // n_chunks
    gen = jax.jit(
        lambda k: synthetic_trials_device(
            k, per, n_channels, n_samples, n_classes,
            label_noise=label_noise, dtype=dtype, **kwargs,
        )
    )
    parts = [gen(jax.random.fold_in(key, i)) for i in range(n_chunks)]
    x, y = jax.jit(
        lambda ps: (
            jnp.concatenate([p[0] for p in ps]),
            jnp.concatenate([p[1] for p in ps]),
        )
    )(parts)
    # Force completion before deleting inputs (donation-free program,
    # but delete() on an in-flight input is undefined on some backends).
    from ..profiling import sync_scalar

    sync_scalar(x)
    for xp, yp in parts:
        xp.delete()
        yp.delete()
    return x, y
