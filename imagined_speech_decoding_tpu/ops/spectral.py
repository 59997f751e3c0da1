"""Spectral features: STFT, Welch PSD, band powers, filter banks.

The reference computes spectra on the host (``scipy.signal.stft`` with
``nperseg=64, noverlap=32`` in ``scripts/global_shap_analysis.py:120-174``;
MNE PSD in ``scripts/artifact_analysis.py:45-48``). Here they are batched
jittable ops: framing is a static gather, the FFT is XLA's native rFFT,
everything maps over arbitrary leading axes. Parity with SciPy defaults
is pinned by tests at rtol 1e-4.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .windowing import sliding_window

# Canonical EEG bands (reference: scripts/global_shap_analysis.py band map).
BANDS: Dict[str, Tuple[float, float]] = {
    "Delta": (0.5, 4.0),
    "Theta": (4.0, 8.0),
    "Alpha": (8.0, 13.0),
    "Beta": (13.0, 30.0),
    "Gamma": (30.0, 45.0),
}


def _hann(n: int) -> np.ndarray:
    """Periodic Hann window (scipy ``get_window('hann', n)`` default)."""
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def stft(
    x: jnp.ndarray,
    fs: float = 1.0,
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    window: str = "hann",
) -> Tuple[np.ndarray, np.ndarray, jnp.ndarray]:
    """Short-time Fourier transform matching ``scipy.signal.stft`` defaults.

    Batched over leading axes: ``x (..., T) -> Zxx (..., F, N)`` complex.
    Defaults reproduce scipy's ``boundary='zeros'``, ``padded=True``,
    ``scaling='spectrum'`` (division by ``win.sum()``).
    """
    if window != "hann":
        raise NotImplementedError("only 'hann' is supported")
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    win = _hann(nperseg)

    half = nperseg // 2
    xx = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)])
    t = xx.shape[-1]
    rem = (t - nperseg) % step
    if rem:
        xx = jnp.pad(xx, [(0, 0)] * (x.ndim - 1) + [(0, step - rem)])

    frames = sliding_window(xx, nperseg, step)  # (..., N, nperseg)
    spec = jnp.fft.rfft(frames * jnp.asarray(win, x.dtype), axis=-1)
    spec = spec * (1.0 / win.sum())
    zxx = jnp.swapaxes(spec, -1, -2)  # (..., F, N)

    freqs = np.fft.rfftfreq(nperseg, d=1.0 / fs)
    n_frames = zxx.shape[-1]
    times = (np.arange(n_frames) * step) / fs
    return freqs, times, zxx


def welch_psd(
    x: jnp.ndarray,
    fs: float = 1.0,
    nperseg: int = 256,
    noverlap: Optional[int] = None,
) -> Tuple[np.ndarray, jnp.ndarray]:
    """Welch power spectral density matching ``scipy.signal.welch`` defaults.

    Hann window, 50% overlap, constant detrend per segment, one-sided
    density scaling. ``x (..., T) -> Pxx (..., F)``.
    """
    if nperseg > x.shape[-1]:
        # scipy.signal.welch clamps nperseg to the signal length (with a
        # warning) instead of failing; without this, short signals hit
        # an opaque empty-stack error in sliding_window.
        import warnings

        warnings.warn(
            f"nperseg = {nperseg} is greater than signal length = "
            f"{x.shape[-1]}, using nperseg = {x.shape[-1]}",
            stacklevel=2,
        )
        nperseg = x.shape[-1]
    if noverlap is None:
        noverlap = nperseg // 2
    elif noverlap >= nperseg:
        # scipy.signal.welch raises here too (incl. after clamping)
        raise ValueError(
            f"noverlap ({noverlap}) must be less than nperseg ({nperseg})"
        )
    step = nperseg - noverlap
    win = _hann(nperseg)

    frames = sliding_window(x, nperseg, step)  # (..., N, nperseg)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # detrend='constant'
    spec = jnp.fft.rfft(frames * jnp.asarray(win, x.dtype), axis=-1)
    scale = 1.0 / (fs * (win * win).sum())
    p = (spec.real**2 + spec.imag**2) * scale
    # one-sided doubling (not DC; not Nyquist when nperseg is even)
    n_f = p.shape[-1]
    mult = np.full(n_f, 2.0)
    mult[0] = 1.0
    if nperseg % 2 == 0:
        mult[-1] = 1.0
    p = p * jnp.asarray(mult, p.dtype)
    pxx = jnp.mean(p, axis=-2)
    freqs = np.fft.rfftfreq(nperseg, d=1.0 / fs)
    return freqs, pxx


def band_power(
    x: jnp.ndarray,
    fs: float,
    bands: Sequence[Tuple[float, float]],
    nperseg: int = 256,
    log: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Per-band (log-)power via Welch PSD integration.

    ``x (..., T) -> (..., n_bands)``. Band power is the rectangle-rule
    integral of the PSD over the band (inclusive edges).
    """
    freqs, pxx = welch_psd(x, fs=fs, nperseg=min(nperseg, x.shape[-1]))
    df = float(freqs[1] - freqs[0]) if len(freqs) > 1 else 1.0
    outs = []
    for lo, hi in bands:
        sel = (freqs >= lo) & (freqs <= hi)
        outs.append(jnp.sum(pxx[..., sel], axis=-1) * df)
    bp = jnp.stack(outs, axis=-1)
    return jnp.log(bp + eps) if log else bp


def log_bandpower_features(x: jnp.ndarray, fs: float, nperseg: int = 256) -> jnp.ndarray:
    """Canonical 5-band log-power feature vector per channel.

    ``(..., C, T) -> (..., C * 5)`` — the feature set for the MLP
    baseline (BASELINE.json config #1).
    """
    bp = band_power(x, fs, list(BANDS.values()), nperseg=nperseg, log=True)
    return bp.reshape(bp.shape[:-2] + (-1,))


def filterbank(
    x: jnp.ndarray,
    fs: float,
    bands: Sequence[Tuple[float, float]],
    method: str = "iir",
    order: int = 4,
) -> jnp.ndarray:
    """Apply a bank of zero-phase band-passes: ``(..., T) -> (..., B, T)``."""
    from .filters import bandpass_filter

    ys = [bandpass_filter(x, fs, lo, hi, method=method, order=order) for lo, hi in bands]
    return jnp.stack(ys, axis=-2)


def band_stft_heatmap(
    x: jnp.ndarray,
    fs: float,
    nperseg: int = 64,
    noverlap: int = 32,
    bands: Dict[str, Tuple[float, float]] = BANDS,
) -> Tuple[Tuple[str, ...], np.ndarray, jnp.ndarray]:
    """Band x time magnitude matrix from an STFT (group-SHAP band heatmaps,
    reference ``scripts/global_shap_analysis.py:120-174``).

    ``x (..., T) -> (..., n_bands, n_frames)`` mean |STFT| per band.
    """
    freqs, times, zxx = stft(x, fs=fs, nperseg=nperseg, noverlap=noverlap)
    mag = jnp.abs(zxx)
    rows = []
    for name, (lo, hi) in bands.items():
        sel = (freqs >= lo) & (freqs < hi)
        if not sel.any():
            sel = np.zeros_like(sel)
            sel[np.argmin(np.abs(freqs - (lo + hi) / 2))] = True
        rows.append(jnp.mean(mag[..., sel, :], axis=-2))
    return tuple(bands.keys()), times, jnp.stack(rows, axis=-2)
