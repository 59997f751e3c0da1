"""Normalization ops, including *masked* batch normalization.

Masked BN is the correctness keystone of the zone-batched encoders: the
reference's ragged per-zone encoders (4-15 channels each,
``src/fast/models/fast.py:199-210``) compute BatchNorm statistics over
only their real channels. After padding zones to a rectangular
``(Z, C_max)`` layout, plain BN would fold the zero-padded channel rows
into the statistics; masked BN reproduces the ragged semantics exactly
by weighting the reduction with the channel-validity mask.

Semantics match ``torch.nn.BatchNorm2d``: normalize with *biased* batch
variance, update running stats with the *unbiased* variance, running
update ``new = (1 - momentum) * old + momentum * batch``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class BNState(NamedTuple):
    mean: jnp.ndarray  # (F,)
    var: jnp.ndarray  # (F,)


def bn_init(num_features: int, dtype=jnp.float32) -> Tuple[dict, BNState]:
    params = {
        "scale": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
    state = BNState(mean=jnp.zeros((num_features,), dtype), var=jnp.ones((num_features,), dtype))
    return params, state


def batch_norm(
    x: jnp.ndarray,
    params: dict,
    state: BNState,
    *,
    train: bool,
    mask: Optional[jnp.ndarray] = None,
    feature_axis: int = 1,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, BNState]:
    """Batch normalization over all axes except ``feature_axis``.

    ``mask`` (optional) broadcasts against ``x``; entries with mask 0 are
    excluded from the statistics (their outputs are still normalized —
    callers re-mask afterwards if needed).
    """
    f = x.shape[feature_axis]
    shape = [1] * x.ndim
    shape[feature_axis] = f
    scale = params["scale"].reshape(shape)
    bias = params["bias"].reshape(shape)
    axes = tuple(i for i in range(x.ndim) if i != feature_axis)

    if train:
        if mask is None:
            n = 1.0
            for i in axes:
                n *= x.shape[i]
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean((x - mean.reshape(shape)) ** 2, axis=axes)
        else:
            m = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
            n = jnp.sum(m, axis=axes)
            mean = jnp.sum(x * m, axis=axes) / jnp.maximum(n, 1.0)
            var = jnp.sum(m * (x - mean.reshape(shape)) ** 2, axis=axes) / jnp.maximum(n, 1.0)
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_state = BNState(
            mean=(1 - momentum) * state.mean + momentum * mean.astype(state.mean.dtype),
            var=(1 - momentum) * state.var + momentum * unbiased.astype(state.var.dtype),
        )
        y = (x - mean.reshape(shape)) * jnp.reciprocal(jnp.sqrt(var.reshape(shape) + eps))
    else:
        new_state = state
        y = (x - state.mean.reshape(shape).astype(x.dtype)) * jnp.reciprocal(
            jnp.sqrt(state.var.reshape(shape).astype(x.dtype) + eps)
        )
    return y * scale + bias, new_state


def bn_sample_mask(
    x: jnp.ndarray,
    sample_weight: Optional[jnp.ndarray],
    channel_mask: Optional[jnp.ndarray] = None,
) -> Optional[jnp.ndarray]:
    """Combine per-sample weights ``(B,)`` (batch at axis 0 of ``x``)
    with an optional pre-broadcast channel mask into one BN mask.

    The per-sample path reproduces the reference's ragged final batch:
    a DataLoader with ``drop_last=False`` computes BatchNorm statistics
    over only the real rows of a short last batch, while the jitted
    engine pads batches to a static size with zero-weight duplicate
    rows — without this mask those padding rows would skew the batch
    statistics and the running stats.
    """
    if sample_weight is None:
        return channel_mask
    m = sample_weight.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    return m if channel_mask is None else m * channel_mask.astype(x.dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the trailing axis (torch ``nn.LayerNorm`` semantics)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps)) * scale + bias


def zscore(x: jnp.ndarray, axis=-1, eps: float = 1e-8) -> jnp.ndarray:
    """Per-signal standardization over ``axis``."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True)
    return (x - mean) / (std + eps)
