"""Signal-processing ops: batched, jittable, SciPy-parity-tested.

The TPU replacement for the reference's host-side scipy/MNE per-trial
preprocessing. Every op maps over arbitrary leading batch axes and is
safe under jit/vmap/shard_map; Pallas variants of the hot paths live in
``ops.pallas`` behind the same call signatures.
"""

from .windowing import (  # noqa: F401
    baseline_correct,
    edge_pad,
    epoch_continuous,
    num_windows,
    sliding_window,
    zone_gather,
)
from .filters import (  # noqa: F401
    bandpass_filter,
    butter_sos,
    filtfilt,
    fir_filter,
    lfilter,
    mne_style_fir_taps,
    notch_ba,
    notch_filter,
    sosfilt,
    sosfiltfilt,
)
from .spectral import (  # noqa: F401
    BANDS,
    band_power,
    band_stft_heatmap,
    filterbank,
    log_bandpower_features,
    stft,
    welch_psd,
)
from .csp import CSPModel, csp_fit, csp_fit_transform, csp_transform  # noqa: F401
from .norm import BNState, batch_norm, bn_init, layer_norm, zscore  # noqa: F401
from .augment import (  # noqa: F401
    amplitude_scale,
    augment_batch,
    channel_dropout,
    gaussian_noise,
    time_shift,
)
