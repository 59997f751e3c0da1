"""Batched digital filtering on TPU: IIR (biquad cascades) + FIR.

The reference preprocesses per-trial with SciPy/MNE on the host (e.g.
MNE ``filter_data`` 4-40 Hz FIR in ``notebooks/svm_baseline.ipynb``).
Here filtering is a pure, jittable op over a batched
``[..., time]`` tensor:

* filter *design* (Butterworth, notch, FIR windows) happens on the host
  at trace time via ``scipy.signal`` — coefficients are static constants
  baked into the compiled graph;
* filter *application* runs on device — IIR recurrences as a single
  ``lax.scan`` over time carrying per-signal section states (the whole
  corpus filters in one scan), FIR as one ``conv_general_dilated``.

Zero-phase ``filtfilt``/``sosfiltfilt`` reproduce SciPy's defaults
(odd-extension padding, ``lfilter_zi`` initial conditions) to rtol 1e-4.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Application primitives (device)
# ---------------------------------------------------------------------------

def lfilter(b: np.ndarray, a: np.ndarray, x: jnp.ndarray, zi: Optional[jnp.ndarray] = None):
    """Causal IIR/FIR filter, Direct Form II transposed, scanned over time.

    ``b``/``a`` are static 1-D coefficient arrays (``a[0]`` need not be 1;
    it is normalized away at trace time). ``x`` is ``(..., T)``. ``zi``,
    if given, is the initial state ``(..., K)`` with
    ``K = max(len(a), len(b)) - 1``. Returns ``y`` (and final state when
    ``zi`` is provided), matching ``scipy.signal.lfilter`` semantics.
    """
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    k = max(len(a), len(b)) - 1
    b = np.pad(b / a[0], (0, k + 1 - len(b)))
    a = np.pad(a / a[0], (0, k + 1 - len(a)))
    bj = jnp.asarray(b, x.dtype)
    aj = jnp.asarray(a, x.dtype)

    batch_shape = x.shape[:-1]
    return_zf = zi is not None
    if zi is None:
        z0 = jnp.zeros(batch_shape + (k,), x.dtype)
    else:
        z0 = jnp.broadcast_to(zi, batch_shape + (k,)).astype(x.dtype)

    xt = jnp.moveaxis(x, -1, 0)  # (T, ...)

    def step(z, xn):
        yn = bj[0] * xn + z[..., 0]
        # z_i' = b_{i+1} x - a_{i+1} y + z_{i+1}   (z_K treated as 0)
        z_shift = jnp.concatenate(
            [z[..., 1:], jnp.zeros(batch_shape + (1,), x.dtype)], axis=-1
        )
        znew = bj[1:] * xn[..., None] - aj[1:] * yn[..., None] + z_shift
        return znew, yn

    zf, yt = jax.lax.scan(step, z0, xt)
    y = jnp.moveaxis(yt, 0, -1)
    return (y, zf) if return_zf else y


def sosfilt(sos: np.ndarray, x: jnp.ndarray, zi: Optional[jnp.ndarray] = None):
    """Causal biquad-cascade filter scanned once over time.

    ``sos``: static ``(S, 6)`` second-order sections (scipy layout
    ``[b0 b1 b2 a0 a1 a2]``). ``x``: ``(..., T)``. ``zi``: optional
    initial state ``(..., S, 2)``. One ``lax.scan`` carries all section
    states; the short per-step section chain is unrolled (S is 2-4).
    """
    sos = np.asarray(sos, np.float64)
    s = sos.shape[0]
    sos = sos / sos[:, 3:4]  # normalize a0 = 1
    coef = jnp.asarray(sos, x.dtype)

    batch_shape = x.shape[:-1]
    return_zf = zi is not None
    if zi is None:
        z0 = jnp.zeros(batch_shape + (s, 2), x.dtype)
    else:
        z0 = jnp.broadcast_to(zi, batch_shape + (s, 2)).astype(x.dtype)

    xt = jnp.moveaxis(x, -1, 0)

    def step(z, xn):
        out = xn
        zs = []
        for i in range(s):
            b0, b1, b2, _, a1, a2 = [coef[i, j] for j in range(6)]
            y = b0 * out + z[..., i, 0]
            znew0 = b1 * out - a1 * y + z[..., i, 1]
            znew1 = b2 * out - a2 * y
            zs.append(jnp.stack([znew0, znew1], axis=-1))
            out = y
        return jnp.stack(zs, axis=-2), out

    zf, yt = jax.lax.scan(step, z0, xt)
    y = jnp.moveaxis(yt, 0, -1)
    return (y, zf) if return_zf else y


def _odd_ext(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Odd extension of the trailing axis by ``n`` samples on both ends.

    Raises like SciPy when the signal is too short — the reversed slices
    would silently truncate and corrupt the filtfilt output otherwise.
    """
    if n < 1:
        return x
    if x.shape[-1] <= n:
        raise ValueError(
            f"The length of the input vector x must be greater than padlen, "
            f"which is {n} (got {x.shape[-1]} samples)"
        )
    left = 2 * x[..., :1] - x[..., n:0:-1]
    right = 2 * x[..., -1:] - x[..., -2 : -(n + 2) : -1]
    return jnp.concatenate([left, x, right], axis=-1)


def filtfilt(
    b: np.ndarray, a: np.ndarray, x: jnp.ndarray, padlen: Optional[int] = None
) -> jnp.ndarray:
    """Zero-phase forward-backward filter = ``scipy.signal.filtfilt`` defaults.

    Odd-extension padding (default ``padlen = 3 * max(len(a), len(b))``)
    and ``lfilter_zi`` steady-state initial conditions, applied forward
    then backward, batched over all leading axes.
    """
    from scipy.signal import lfilter_zi  # host-side, trace-time only

    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    if padlen is None:
        padlen = 3 * max(len(a), len(b))
    zi = np.asarray(lfilter_zi(b, a), np.float64)  # (K,)

    ext = _odd_ext(x, padlen)
    zi_j = jnp.asarray(zi, x.dtype)
    y, _ = lfilter(b, a, ext, zi=zi_j * ext[..., :1])
    y = jnp.flip(y, axis=-1)
    y, _ = lfilter(b, a, y, zi=zi_j * y[..., :1])
    y = jnp.flip(y, axis=-1)
    return y[..., padlen : y.shape[-1] - padlen] if padlen > 0 else y


def sos_zero_phase(
    sosfilt_fn, sos: np.ndarray, x: jnp.ndarray, padlen: Optional[int] = None
) -> jnp.ndarray:
    """Shared ``sosfiltfilt`` trace-time machinery (SciPy-default padlen
    formula, odd extension, ``sosfilt_zi`` steady-state seeding, the
    forward-backward flips), parameterized on the causal filter backend
    ``sosfilt_fn(sos, x, zi) -> (y, zf)`` so the XLA and Pallas paths
    can never drift apart."""
    from scipy.signal import sosfilt_zi  # host-side, trace-time only

    sos = np.asarray(sos, np.float64)
    if padlen is None:
        ntaps = 2 * sos.shape[0] + 1
        ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
        padlen = 3 * int(ntaps)
    zi = np.asarray(sosfilt_zi(sos), np.float64)  # (S, 2)

    ext = _odd_ext(x, padlen)
    zi_j = jnp.asarray(zi, x.dtype)
    y, _ = sosfilt_fn(sos, ext, zi_j * ext[..., :1, None])
    y = jnp.flip(y, axis=-1)
    y, _ = sosfilt_fn(sos, y, zi_j * y[..., :1, None])
    y = jnp.flip(y, axis=-1)
    return y[..., padlen : y.shape[-1] - padlen] if padlen > 0 else y


def sosfiltfilt(sos: np.ndarray, x: jnp.ndarray, padlen: Optional[int] = None) -> jnp.ndarray:
    """Zero-phase biquad-cascade filter = ``scipy.signal.sosfiltfilt`` defaults."""
    return sos_zero_phase(lambda s, v, zi: sosfilt(s, v, zi=zi), sos, x, padlen)


def fir_filter(taps: np.ndarray, x: jnp.ndarray, zero_phase: bool = True) -> jnp.ndarray:
    """Apply a linear-phase FIR filter with one batched convolution.

    ``taps``: static 1-D kernel (odd length for exact zero-phase).
    ``zero_phase=True`` compensates the group delay (centered 'same'
    convolution with edge reflection), the MNE ``filter_data``-style
    application. Runs as ``conv_general_dilated`` — MXU-friendly.
    """
    taps = np.asarray(taps, np.float64)
    n = len(taps)
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    flat = x.reshape((-1, 1, t))

    if zero_phase:
        left, right = (n - 1) // 2, n - 1 - (n - 1) // 2
        flat = jnp.pad(flat, ((0, 0), (0, 0), (left, right)), mode="reflect")
        pad = "VALID"
    else:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (n - 1, 0)))
        pad = "VALID"

    kern = jnp.asarray(taps[::-1].copy(), x.dtype).reshape(1, 1, n)
    y = jax.lax.conv_general_dilated(
        flat, kern, window_strides=(1,), padding=pad,
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,  # full f32 accumulate for SciPy parity
    )
    return y.reshape(batch_shape + (t,))


# ---------------------------------------------------------------------------
# Design + apply convenience (host design, device apply)
# ---------------------------------------------------------------------------

def butter_sos(
    sfreq: float, l_freq: Optional[float], h_freq: Optional[float], order: int = 4
) -> np.ndarray:
    """Design a Butterworth band/low/high-pass as second-order sections."""
    from scipy.signal import butter

    nyq = sfreq / 2.0
    if l_freq is not None and h_freq is not None:
        return butter(order, [l_freq / nyq, h_freq / nyq], btype="bandpass", output="sos")
    if h_freq is not None:
        return butter(order, h_freq / nyq, btype="lowpass", output="sos")
    if l_freq is not None:
        return butter(order, l_freq / nyq, btype="highpass", output="sos")
    raise ValueError("need at least one of l_freq / h_freq")


def notch_ba(sfreq: float, freq: float, q: float = 30.0) -> Tuple[np.ndarray, np.ndarray]:
    """Design an IIR notch (``scipy.signal.iirnotch``)."""
    from scipy.signal import iirnotch

    return iirnotch(freq, q, fs=sfreq)


def mne_style_fir_taps(
    sfreq: float,
    l_freq: Optional[float],
    h_freq: Optional[float],
    l_trans_bandwidth: Optional[float] = None,
    h_trans_bandwidth: Optional[float] = None,
) -> np.ndarray:
    """Design a windowed-sinc FIR bandpass with MNE-default geometry.

    MNE ``filter_data`` defaults reproduced: hamming window; transition
    bandwidths ``min(max(f*0.25, 2), f)`` (low) / ``min(max(f*0.25, 2),
    nyq-f)`` (high); filter length ``3.3 / min(trans_bw) * sfreq``
    rounded to odd; and — the part a bare ``firwin(f)`` call gets wrong —
    MNE's documented band-edge convention: ``l_freq``/``h_freq`` are the
    PASSBAND edges and the half-amplitude (−6 dB) points sit at
    ``l_freq − l_trans/2`` / ``h_freq + h_trans/2``, i.e. the transition
    bands lie entirely OUTSIDE the requested passband. ``firwin`` places
    −6 dB exactly at its cutoff argument, so the cutoffs passed are the
    shifted values. The response specs (−6 dB points, hamming 53 dB
    stopband, 0.2% passband ripple) are pinned by
    ``tests/test_ops.py::TestMNfirResponse``.
    """
    from scipy.signal import firwin

    nyq = sfreq / 2.0
    lt = ht = None
    if l_freq is not None:
        lt = l_trans_bandwidth or min(max(l_freq * 0.25, 2.0), l_freq)
    if h_freq is not None:
        ht = h_trans_bandwidth or min(max(h_freq * 0.25, 2.0), nyq - h_freq)
    trans = min(w for w in (lt, ht) if w is not None)
    n = int(round(3.3 / trans * sfreq))
    n |= 1  # odd length → exact zero-phase
    if l_freq is not None and h_freq is not None:
        return firwin(
            n, [l_freq - lt / 2.0, h_freq + ht / 2.0],
            fs=sfreq, pass_zero=False, window="hamming",
        )
    if h_freq is not None:
        return firwin(n, h_freq + ht / 2.0, fs=sfreq, pass_zero=True, window="hamming")
    return firwin(n, l_freq - lt / 2.0, fs=sfreq, pass_zero=False, window="hamming")


def bandpass_filter(
    x: jnp.ndarray,
    sfreq: float,
    l_freq: Optional[float],
    h_freq: Optional[float],
    method: str = "iir",
    order: int = 4,
) -> jnp.ndarray:
    """Zero-phase band-pass over the trailing axis, batched.

    ``method='iir'``: Butterworth SOS + ``sosfiltfilt``.
    ``method='fir'``: MNE-style windowed-sinc + centered convolution.
    """
    if method == "iir":
        return sosfiltfilt(butter_sos(sfreq, l_freq, h_freq, order), x)
    if method == "fir":
        return fir_filter(mne_style_fir_taps(sfreq, l_freq, h_freq), x, zero_phase=True)
    raise ValueError(f"unknown method {method!r}")


def notch_filter(x: jnp.ndarray, sfreq: float, freq: float = 60.0, q: float = 30.0) -> jnp.ndarray:
    """Zero-phase power-line notch over the trailing axis, batched."""
    b, a = notch_ba(sfreq, freq, q)
    return filtfilt(b, a, x)
