"""EEG data augmentation ops (BASELINE.json config #4: noise + channel
dropout for the raw-window CNN/BiLSTM pipeline). All pure functions of an
explicit PRNG key — vmap/jit-safe, batched over leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_noise(key: jax.Array, x: jnp.ndarray, sigma: float = 0.1) -> jnp.ndarray:
    """Additive white noise scaled by per-trial signal std."""
    std = jnp.std(x, axis=(-2, -1), keepdims=True)
    return x + sigma * std * jax.random.normal(key, x.shape, x.dtype)


def channel_dropout(key: jax.Array, x: jnp.ndarray, rate: float = 0.1) -> jnp.ndarray:
    """Zero whole channels with probability ``rate`` (per trial).

    ``x (..., C, T)``; dropped channels are zeroed, survivors are NOT
    rescaled (spatial patterns must stay calibrated for EEG).
    """
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape[:-1])
    return x * keep[..., None].astype(x.dtype)


def time_shift(key: jax.Array, x: jnp.ndarray, max_shift: int = 20) -> jnp.ndarray:
    """Circular time shift by a per-trial random offset in [-max, max]."""
    if x.ndim < 3:
        shift = jax.random.randint(key, (), -max_shift, max_shift + 1)
        return jnp.roll(x, shift, axis=-1)
    shifts = jax.random.randint(key, x.shape[:-2], -max_shift, max_shift + 1)

    def roll_one(xi, s):
        return jnp.roll(xi, s, axis=-1)

    flat = x.reshape((-1,) + x.shape[-2:])
    out = jax.vmap(roll_one)(flat, shifts.reshape(-1))
    return out.reshape(x.shape)


def amplitude_scale(key: jax.Array, x: jnp.ndarray, low: float = 0.9, high: float = 1.1) -> jnp.ndarray:
    """Per-trial random amplitude scaling."""
    batch = x.shape[:-2] if x.ndim >= 3 else ()
    s = jax.random.uniform(key, batch + (1, 1), x.dtype, low, high)
    return x * s


def augment_batch(
    key: jax.Array,
    x: jnp.ndarray,
    noise_sigma: float = 0.1,
    ch_drop: float = 0.1,
) -> jnp.ndarray:
    """Standard train-time augmentation chain: noise then channel dropout."""
    k1, k2 = jax.random.split(key)
    x = gaussian_noise(k1, x, noise_sigma)
    x = channel_dropout(k2, x, ch_drop)
    return x
