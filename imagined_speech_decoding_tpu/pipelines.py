"""Baseline end-to-end pipelines: featurizer + model families as one unit.

BASELINE.json declares five run configurations; FAST (config #5's model)
and the CSP+SVM classical baseline (config #2) have their own drivers
(``cli/train_fast.py``, ``cli/svm_baseline.py``). This module delivers
the remaining three as first-class pipelines consumable by the same
stacked CV engine (``train.cv.train_per_subject_cv``):

  * ``bandpower_mlp`` — config #1: notch + 8-70 Hz band-pass, Welch
    log-bandpower over 2-s segments (the "2 s epochs" of the config are
    the Welch segmentation), -> small MLP;
  * ``stft_eegnet``  — config #3: per-channel STFT log-magnitude binned
    into the five canonical EEG bands -> plane-stacked EEGNet (the bands
    are the input planes of the first conv);
  * ``cnn_bilstm``   — config #4: raw windows -> temporal/spatial conv
    frontend -> BiLSTM sequence head, with optional train-time
    augmentation (noise + channel dropout) INSIDE the jitted train step
    (see ``models.api.make_augmented_model``).

Featurization is itself jitted and batched: one compiled program maps a
whole subject's ``(N, C, T)`` trial tensor to features on device — the
reference performs comparable spectral work per-trial on the host
(``scipy.signal`` calls, e.g. ``scripts/global_shap_analysis.py:120-174``).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data.constants import SFREQ
from .train.engine import ModelDef


# ---------------------------------------------------------------------------
# Featurizers (pure jax fns over (..., C, T); jit at the call site)
# ---------------------------------------------------------------------------

def bandpower_featurize(
    x: jnp.ndarray,
    sfreq: float = SFREQ,
    l_freq: float = 8.0,
    h_freq: float = 70.0,
    notch: float = 60.0,
    epoch_seconds: float = 2.0,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Config #1 features: notch + band-pass -> per-channel 5-band
    log-power, ``(..., C, T) -> (..., C * 5)``.

    The Welch segmentation length IS the config's "2 s epochs": power is
    estimated on 2-s Hann segments at 50% overlap and averaged. Both
    zero-phase IIR stages run as SOS cascades through the same backend
    dispatch as the serving/bench paths: the Pallas biquad kernel on TPU
    (bit-identical to the scan path, far cheaper to compile), the
    ``lax.scan`` implementation elsewhere.
    """
    from scipy.signal import tf2sos

    from .ops.filters import butter_sos, notch_ba, sosfiltfilt
    from .ops.spectral import log_bandpower_features

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .ops.pallas import sosfiltfilt_pallas as _sff
    else:
        _sff = sosfiltfilt

    x = _sff(tf2sos(*notch_ba(sfreq, notch)), x)
    x = _sff(butter_sos(sfreq, l_freq, h_freq), x)
    nper = int(round(epoch_seconds * sfreq))
    return log_bandpower_features(x, sfreq, nperseg=min(nper, x.shape[-1]))


def stft_n_frames(n_samples: int, nperseg: int = 64, step: int = 8) -> int:
    """Frame count of ``ops.spectral.stft`` (scipy-default zero padding)."""
    t = n_samples + 2 * (nperseg // 2)
    rem = (t - nperseg) % step
    if rem:
        t += step - rem
    return (t - nperseg) // step + 1


def stft_image_featurize(
    x: jnp.ndarray,
    sfreq: float = SFREQ,
    nperseg: int = 64,
    step: int = 8,
) -> jnp.ndarray:
    """Config #3 features: band-binned STFT log-magnitude "image",
    ``(..., C, T) -> (..., n_bands, C, n_frames)``.

    Each canonical band (Delta..Gamma, ``ops.spectral.BANDS``) becomes an
    input plane; the plane stack feeds EEGNet's first conv
    (``eegnet_init(in_planes=n_bands)``).
    """
    from .ops.spectral import BANDS, stft

    freqs, _, zxx = stft(x, fs=sfreq, nperseg=nperseg, noverlap=nperseg - step)
    logmag = jnp.log(jnp.abs(zxx) + 1e-8)  # (..., C, F, N)
    rows = []
    band_bins = []
    for name, (lo, hi) in BANDS.items():
        sel = (freqs >= lo) & (freqs < hi)
        if not sel.any():  # degenerate band at tiny nperseg: nearest bin
            sel = np.zeros_like(sel)
            sel[np.argmin(np.abs(freqs - (lo + hi) / 2))] = True
            warnings.warn(
                f"stft_image_featurize: band {name} [{lo}, {hi}) Hz contains "
                f"no rfft bin at nperseg={nperseg}, sfreq={sfreq} — falling "
                "back to its nearest bin. Increase nperseg (frequency "
                f"resolution is {freqs[1] - freqs[0]:.2f} Hz/bin).",
                stacklevel=2,
            )
        band_bins.append((name, tuple(np.flatnonzero(sel))))
        rows.append(logmag[..., sel, :].mean(-2))  # (..., C, N)
    # Two bands resolving to the SAME bin set would train on duplicated
    # input planes — make that geometry loud instead of silent.
    for (na, ba), (nb, bb) in zip(band_bins, band_bins[1:]):
        if ba == bb:
            warnings.warn(
                f"stft_image_featurize: bands {na} and {nb} resolve to "
                f"identical rfft bins {ba} — their input planes are "
                "duplicates. Increase nperseg or drop a band.",
                stacklevel=2,
            )
    return jnp.stack(rows, axis=-3)  # (..., n_bands, C, N)


# ---------------------------------------------------------------------------
# Pipeline registry
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Pipeline:
    """A baseline config: how to featurize raw trials and build the model.

    ``featurize(x)``: pure jax fn, raw ``(..., C, T)`` -> feature array
    (identity for raw-input models). ``make_model(n_channels, n_samples,
    n_classes, compute_dtype)``: a ``ModelDef`` over the FEATURIZED
    input. ``augmentable``: the model consumes raw EEG, so
    ``ops.augment`` (noise/channel dropout) is meaningful on its input.
    """

    name: str
    description: str
    featurize: Optional[Callable]
    make_model: Callable
    augmentable: bool = False


def _make_bandpower_mlp(n_channels, n_samples, n_classes, compute_dtype):
    from .models.mlp import make_mlp_model
    from .ops.spectral import BANDS

    return make_mlp_model(
        n_channels * len(BANDS), n_classes, compute_dtype=compute_dtype
    )


def _make_stft_eegnet(n_channels, n_samples, n_classes, compute_dtype):
    from .models.eegnet import eegnet_apply, eegnet_init
    from .ops.spectral import BANDS

    frames = stft_n_frames(n_samples)

    def init(key):
        # temporal kernel 16 frames ~ 0.5 s at the 31.25 fps frame rate
        # (the raw-sample K=64 would span 2 s of frames — too long)
        return eegnet_init(
            key, n_channels, frames, n_classes,
            in_planes=len(BANDS), temporal_kernel=16,
        )

    def apply(params, state, x, *, train=False, rng=None, sample_weight=None):
        return eegnet_apply(
            params, state, x.astype(compute_dtype), train=train, rng=rng,
            sample_weight=sample_weight,
        )

    return ModelDef(init=init, apply=apply)


def _make_cnn_bilstm(n_channels, n_samples, n_classes, compute_dtype):
    from .models.rnn import make_cnn_bilstm_model

    return make_cnn_bilstm_model(
        n_channels, n_samples, n_classes, compute_dtype=compute_dtype
    )


PIPELINES: Dict[str, Pipeline] = {
    "bandpower_mlp": Pipeline(
        name="bandpower_mlp",
        description="notch + 8-70 Hz bandpass, 2-s Welch log-bandpower -> MLP "
        "(BASELINE.json config #1)",
        featurize=bandpower_featurize,
        make_model=_make_bandpower_mlp,
    ),
    "stft_eegnet": Pipeline(
        name="stft_eegnet",
        description="band-binned STFT log-magnitude planes -> EEGNet "
        "(BASELINE.json config #3)",
        featurize=stft_image_featurize,
        make_model=_make_stft_eegnet,
    ),
    "cnn_bilstm": Pipeline(
        name="cnn_bilstm",
        description="raw windows -> CNN frontend + BiLSTM sequence head "
        "(BASELINE.json config #4; --augment wires noise + channel "
        "dropout into the jitted train step)",
        featurize=None,
        make_model=_make_cnn_bilstm,
        augmentable=True,
    ),
}


def featurize_corpus(
    pipeline: Pipeline,
    X: np.ndarray,  # (S, N, C, T)
    test_per_subject: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]] = None,
):
    """Apply the pipeline featurizer to the train+val corpus and the
    per-subject test sets. One jitted program, executed per subject to
    bound peak memory (the STFT intermediate is ~5x the corpus); raw
    pipelines pass through unchanged."""
    if pipeline.featurize is None:
        return X, test_per_subject
    feat = jax.jit(pipeline.featurize)
    Xf = np.stack([np.asarray(feat(jnp.asarray(X[s]))) for s in range(X.shape[0])])
    testf = None
    if test_per_subject is not None:
        testf = {
            sid: (np.asarray(feat(jnp.asarray(xt))), yt)
            for sid, (xt, yt) in test_per_subject.items()
        }
    return Xf, testf
