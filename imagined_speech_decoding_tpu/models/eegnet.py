"""Standalone EEGNet classifier over the full montage.

The canonical depthwise-separable EEG CNN (the reference embeds an
EEGNet *encoder* as a FAST zone head — ``src/fast/models/fast.py:
122-167``; this is the full-montage classifier variant, the
"EEGNet-style depthwise-separable CNN" of BASELINE.json config #3).
Accepts raw ``(B, C, T)`` trials; pair with ``ops.stft``/
``ops.log_bandpower_features`` upstream for spectral-input pipelines.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.norm import batch_norm, bn_init
from . import modules as nn

_F1, _D, _KL = 8, 2, 64


def eegnet_init(
    key: jax.Array,
    n_channels: int,
    n_samples: int,
    n_classes: int = 5,
    dtype=jnp.float32,
    in_planes: int = 1,
    temporal_kernel: int = _KL,
):
    """``in_planes > 1`` generalizes the input from one raw plane
    ``(B, C, T)`` to a stack of planes ``(B, P, C, T')`` — e.g. per-band
    log-spectrogram images (BASELINE.json config #3: "STFT spectrogram →
    EEGNet-style depthwise-separable CNN"); the temporal conv then mixes
    the planes. ``temporal_kernel`` shrinks the K=64 raw-sample kernel
    for short frame axes (spectrogram time resolution ≪ sample rate)."""
    f1, d = _F1, _D
    f2 = f1 * d
    ks = jax.random.split(key, 5)
    # classifier input length: conv1 'same' over K (+1 sample when K is
    # even) -> pool4 -> sep_depth 'same' over K=16 (+1 sample) -> pool8
    pad_t = 1 - temporal_kernel % 2
    t_out = ((n_samples + pad_t) // 4 + 1) // 8
    if t_out < 1:
        raise ValueError(
            f"n_samples={n_samples} too short for EEGNet's /32 pooling"
        )
    params = {
        "temporal": nn.conv2d_init(
            ks[0], in_planes, f1, (1, temporal_kernel), bias=False, dtype=dtype
        ),
        "spatial": nn.conv2d_init(ks[1], f1, f2, (n_channels, 1), bias=False, groups=f1, dtype=dtype),
        "sep_depth": nn.conv2d_init(ks[2], f2, f2, (1, 16), bias=False, groups=f2, dtype=dtype),
        "sep_point": nn.conv2d_init(ks[3], f2, f2, (1, 1), bias=False, dtype=dtype),
        "classifier": nn.linear_init(ks[4], f2 * t_out, n_classes, dtype=dtype),
    }
    state = {}
    for name, f in (("bn1", f1), ("bn2", f2), ("bn3", f2)):
        params[name], state[name] = bn_init(f, dtype)
    return params, state


def eegnet_apply(
    params,
    state,
    x: jnp.ndarray,
    *,
    dropout: float = 0.25,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    sample_weight: Optional[jnp.ndarray] = None,
):
    """``(B, C, T)`` raw (or ``(B, P, C, T')`` plane-stacked) ->
    ``(B, n_classes)`` logits + new BN state."""
    from ..ops.norm import bn_sample_mask

    r1, r2 = nn.split_rng(rng, 2)
    f1, f2 = _F1, _F1 * _D
    h = x if x.ndim == 4 else x[:, None, :, :]
    kt = params["temporal"]["w"].shape[-1]
    h = nn.conv2d(params["temporal"], h, padding=[(0, 0), (kt // 2, kt // 2)])
    h, bn1s = batch_norm(h, params["bn1"], state["bn1"], train=train,
                         mask=bn_sample_mask(h, sample_weight))
    h = nn.conv2d(params["spatial"], h, groups=f1)
    h, bn2s = batch_norm(h, params["bn2"], state["bn2"], train=train,
                         mask=bn_sample_mask(h, sample_weight))
    h = jax.nn.elu(h)
    h = nn.avg_pool(h, (1, 4))
    h = nn.dropout(h, dropout, r1, train)
    h = nn.conv2d(params["sep_depth"], h, padding=[(0, 0), (8, 8)], groups=f2)
    h = nn.conv2d(params["sep_point"], h)
    h, bn3s = batch_norm(h, params["bn3"], state["bn3"], train=train,
                         mask=bn_sample_mask(h, sample_weight))
    h = jax.nn.elu(h)
    h = nn.avg_pool(h, (1, 8))
    h = nn.dropout(h, dropout, r2, train)
    h = h.reshape(h.shape[0], -1)
    logits = nn.linear(params["classifier"], h)
    return logits, {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s}


def make_eegnet_model(
    n_channels: int, n_samples: int, n_classes: int = 5, compute_dtype=jnp.float32
):
    from ..train.engine import ModelDef

    def init(key):
        return eegnet_init(key, n_channels, n_samples, n_classes)

    def apply(params, state, x, *, train=False, rng=None, sample_weight=None):
        return eegnet_apply(params, state, x.astype(compute_dtype), train=train,
                            rng=rng, sample_weight=sample_weight)

    return ModelDef(init=init, apply=apply)
