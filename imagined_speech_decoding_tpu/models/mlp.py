"""MLP classifier over spectral features.

BASELINE.json config #1: "notch + bandpass, 2 s epochs, log-bandpower
features -> small MLP". Pair with ``ops.log_bandpower_features``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import modules as nn


def mlp_init(
    key: jax.Array,
    d_in: int,
    n_classes: int = 5,
    hidden: Sequence[int] = (128, 64),
    dtype=jnp.float32,
):
    dims = [d_in, *hidden, n_classes]
    keys = jax.random.split(key, len(dims) - 1)
    params = {
        f"fc{i}": nn.linear_init(k, dims[i], dims[i + 1], dtype=dtype)
        for i, k in enumerate(keys)
    }
    return params, {}


def mlp_apply(
    params,
    state,
    x: jnp.ndarray,
    *,
    dropout: float = 0.2,
    train: bool = False,
    rng: Optional[jax.Array] = None,
):
    n_layers = len(params)
    rngs = nn.split_rng(rng, n_layers)
    h = x
    for i in range(n_layers - 1):
        h = jax.nn.gelu(nn.linear(params[f"fc{i}"], h), approximate=False)
        h = nn.dropout(h, dropout, rngs[i], train)
    return nn.linear(params[f"fc{n_layers - 1}"], h), state


def make_mlp_model(d_in: int, n_classes: int = 5, hidden=(128, 64), compute_dtype=jnp.float32):
    from ..train.engine import ModelDef

    def init(key):
        return mlp_init(key, d_in, n_classes, hidden)

    def apply(params, state, x, *, train=False, rng=None, sample_weight=None):
        # BN-free model: sample_weight accepted for interface uniformity.
        return mlp_apply(params, state, x.astype(compute_dtype), train=train, rng=rng)

    return ModelDef(init=init, apply=apply)
