"""Raw-window CNN + bidirectional LSTM sequence head.

BASELINE.json config #4: "Raw-window CNN + BiLSTM sequence head,
subject-dependent training with augmentation". A temporal-conv frontend
downsamples the raw trial into a feature sequence; a BiLSTM scans it
(``lax.scan`` — compiler-friendly recurrence); the final states feed the
classifier. The LSTM cell matches torch ``nn.LSTM`` gate conventions
(i, f, g, o packed order, sigmoid/tanh activations).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.norm import batch_norm, bn_init
from . import modules as nn


# ---------------------------------------------------------------------------
# LSTM primitives
# ---------------------------------------------------------------------------

def lstm_init(key: jax.Array, d_in: int, d_hidden: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # torch nn.LSTM initializes ALL weights (incl. input-hidden) from
    # U(±1/sqrt(hidden)) — fan-in of d_in for wi would break parity.
    bound_h = d_hidden
    return {
        "wi": nn.uniform_fan_in(k1, (d_in, 4 * d_hidden), bound_h, dtype),
        "wh": nn.uniform_fan_in(k2, (d_hidden, 4 * d_hidden), bound_h, dtype),
        "bi": nn.uniform_fan_in(k3, (4 * d_hidden,), bound_h, dtype),
        "bh": nn.uniform_fan_in(k4, (4 * d_hidden,), bound_h, dtype),
    }


def lstm_cell(params, carry, x_t):
    """One LSTM step: torch gate order (i, f, g, o)."""
    h, c = carry
    gates = (
        jnp.dot(x_t, params["wi"].astype(x_t.dtype))
        + jnp.dot(h, params["wh"].astype(x_t.dtype))
        + params["bi"].astype(x_t.dtype)
        + params["bh"].astype(x_t.dtype)
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return (h, c), h


def lstm_scan(params, xs: jnp.ndarray, reverse: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan an LSTM over ``xs (B, T, D)`` → (outputs (B, T, H), final h)."""
    b = xs.shape[0]
    hdim = params["wh"].shape[0]
    h0 = jnp.zeros((b, hdim), xs.dtype)
    c0 = jnp.zeros((b, hdim), xs.dtype)
    xt = jnp.moveaxis(xs, 1, 0)  # (T, B, D)

    def step(carry, x_t):
        return lstm_cell(params, carry, x_t)

    (h_f, _), outs = jax.lax.scan(step, (h0, c0), xt, reverse=reverse)
    return jnp.moveaxis(outs, 0, 1), h_f


def bilstm_init(key: jax.Array, d_in: int, d_hidden: int, dtype=jnp.float32):
    kf, kb = jax.random.split(key)
    return {"fwd": lstm_init(kf, d_in, d_hidden, dtype), "bwd": lstm_init(kb, d_in, d_hidden, dtype)}


def bilstm_apply(params, xs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BiLSTM: concat of forward/backward outputs + concat final states."""
    out_f, h_f = lstm_scan(params["fwd"], xs, reverse=False)
    out_b, h_b = lstm_scan(params["bwd"], xs, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1), jnp.concatenate([h_f, h_b], axis=-1)


# ---------------------------------------------------------------------------
# CNN frontend + BiLSTM classifier
# ---------------------------------------------------------------------------

def cnn_bilstm_init(
    key: jax.Array,
    n_channels: int,
    n_samples: int,
    n_classes: int = 5,
    conv_dim: int = 32,
    hidden: int = 64,
    pool: int = 8,
    dtype=jnp.float32,
):
    ks = jax.random.split(key, 4)
    params = {
        "temporal": nn.conv2d_init(ks[0], 1, conv_dim, (1, 15), bias=False, dtype=dtype),
        "spatial": nn.conv2d_init(ks[1], conv_dim, conv_dim, (n_channels, 1), bias=False, dtype=dtype),
        "rnn": bilstm_init(ks[2], conv_dim, hidden, dtype),
        "classifier": nn.linear_init(ks[3], 2 * hidden, n_classes, dtype=dtype),
    }
    bnp, bns = bn_init(conv_dim, dtype)
    params["bn"] = bnp
    return params, {"bn": bns}


def cnn_bilstm_apply(
    params,
    state,
    x: jnp.ndarray,
    *,
    pool: int = 8,
    dropout: float = 0.3,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    sample_weight: Optional[jnp.ndarray] = None,
):
    """``(B, C, T) -> (B, K)``: conv frontend → (B, T/pool, F) sequence →
    BiLSTM final states → classifier."""
    from ..ops.norm import bn_sample_mask

    (r1,) = nn.split_rng(rng, 1)
    h = x[:, None, :, :]
    h = nn.conv2d(params["temporal"], h, padding=[(0, 0), (7, 7)])  # (B, F, C, T)
    h = nn.conv2d(params["spatial"], h)  # (B, F, 1, T)
    h, bns = batch_norm(h, params["bn"], state["bn"], train=train,
                        mask=bn_sample_mask(h, sample_weight))
    h = jax.nn.elu(h)
    h = nn.avg_pool(h, (1, pool))  # (B, F, 1, T/pool)
    seq = jnp.moveaxis(h[:, :, 0, :], 1, 2)  # (B, T/pool, F)
    _, final = bilstm_apply(params["rnn"], seq)
    final = nn.dropout(final, dropout, r1, train)
    logits = nn.linear(params["classifier"], final)
    return logits, {"bn": bns}


def make_cnn_bilstm_model(
    n_channels: int, n_samples: int, n_classes: int = 5, compute_dtype=jnp.float32
):
    from ..train.engine import ModelDef

    def init(key):
        return cnn_bilstm_init(key, n_channels, n_samples, n_classes)

    def apply(params, state, x, *, train=False, rng=None, sample_weight=None):
        return cnn_bilstm_apply(params, state, x.astype(compute_dtype), train=train,
                                rng=rng, sample_weight=sample_weight)

    return ModelDef(init=init, apply=apply)
