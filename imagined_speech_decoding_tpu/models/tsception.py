"""TSception — multi-scale temporal + hemisphere-aware spatial CNN.

Functional re-design of the reference's self-contained baseline
(``scripts/train_tsception.py:39-119``): three temporal conv branches at
kernel widths 0.5/0.25/0.125 x sfreq, a full-montage and a
half-montage (hemisphere) spatial branch, BN + adaptive pooling fusion,
and a 2-layer FC classifier. Defaults match the reference's training
setup (num_T = num_S = 15, hidden 128, dropout 0.5 — ``:218-226``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.norm import batch_norm, bn_init
from . import modules as nn


def _same_pad(k: int) -> Tuple[int, int]:
    """torch ``padding='same'`` (stride 1): extra padding goes right."""
    total = k - 1
    return total // 2, total - total // 2


def adaptive_avg_pool_w(x: jnp.ndarray, out_w: int) -> jnp.ndarray:
    """torch ``AdaptiveAvgPool2d((None, out_w))`` over ``(B, F, H, W)``:
    output bin i averages ``x[..., floor(i*W/o) : ceil((i+1)*W/o)]``."""
    w = x.shape[-1]
    cols = []
    for i in range(out_w):
        lo = (i * w) // out_w
        hi = -(-((i + 1) * w) // out_w)
        cols.append(jnp.mean(x[..., lo:hi], axis=-1))
    return jnp.stack(cols, axis=-1)


def tsception_meta(
    n_channels: int, sfreq: float = 250.0, num_t: int = 15, num_s: int = 15
) -> dict:
    """Static shape metadata shared by init and apply (single source of
    truth): the three multi-scale temporal kernel widths at 0.5/0.25/
    0.125 x sfreq and the hemisphere split point."""
    return {
        "k_t": [int(sfreq * r) for r in (0.5, 0.25, 0.125)],
        "half": int(n_channels * 0.5),
        "num_t": num_t,
        "num_s": num_s,
    }


def tsception_init(
    key: jax.Array,
    n_channels: int,
    n_samples: int,
    n_classes: int = 5,
    sfreq: float = 250.0,
    num_t: int = 15,
    num_s: int = 15,
    hidden: int = 128,
    dtype=jnp.float32,
):
    ks = jax.random.split(key, 8)
    meta = tsception_meta(n_channels, sfreq, num_t, num_s)
    k_t, half = meta["k_t"], meta["half"]
    params = {
        "t1": nn.conv2d_init(ks[0], 1, num_t, (1, k_t[0]), dtype=dtype),
        "t2": nn.conv2d_init(ks[1], 1, num_t, (1, k_t[1]), dtype=dtype),
        "t3": nn.conv2d_init(ks[2], 1, num_t, (1, k_t[2]), dtype=dtype),
        "s1": nn.conv2d_init(ks[3], num_t * 3, num_s, (n_channels, 1), dtype=dtype),
        "s2": nn.conv2d_init(ks[4], num_t * 3, num_s, (half, 1), dtype=dtype),
        "fc1": nn.linear_init(ks[5], num_s * 3 * 8, hidden, dtype=dtype),
        "fc2": nn.linear_init(ks[6], hidden, n_classes, dtype=dtype),
    }
    bnt_p, bnt_s = bn_init(num_t * 3, dtype)
    bns_p, bns_s = bn_init(num_s, dtype)
    params.update({"bn_t": bnt_p, "bn_s": bns_p})
    state = {"bn_t": bnt_s, "bn_s": bns_s}
    return params, state, meta


def _t_branch(p, x, k: int):
    """conv('same') → LeakyReLU → AvgPool(1, 4)."""
    h = nn.conv2d(p, x, padding=[(0, 0), _same_pad(k)])
    h = jax.nn.leaky_relu(h, 0.01)
    return nn.avg_pool(h, (1, 4))


def tsception_apply(
    params,
    state,
    x: jnp.ndarray,
    meta,
    *,
    n_classes: int = 5,
    dropout: float = 0.5,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    sample_weight: Optional[jnp.ndarray] = None,
):
    """``(B, C, T) -> (B, n_classes)`` logits + new BN state."""
    from ..ops.norm import bn_sample_mask

    (r1,) = nn.split_rng(rng, 1)
    k_t, half = meta["k_t"], meta["half"]
    h = x[:, None, :, :]  # (B, 1, C, T)

    y = jnp.concatenate(
        [_t_branch(params["t1"], h, k_t[0]),
         _t_branch(params["t2"], h, k_t[1]),
         _t_branch(params["t3"], h, k_t[2])],
        axis=1,
    )  # (B, 3*num_T, C, T/4)
    y, bnt_s = batch_norm(y, params["bn_t"], state["bn_t"], train=train,
                          mask=bn_sample_mask(y, sample_weight))

    s1 = nn.conv2d(params["s1"], y)  # (B, num_S, 1, T/4)
    s1 = nn.avg_pool(jax.nn.leaky_relu(s1, 0.01), (1, 4))
    s2 = nn.conv2d(params["s2"], y, stride=(half, 1))  # (B, num_S, 2, T/4)
    s2 = nn.avg_pool(jax.nn.leaky_relu(s2, 0.01), (1, 4))
    ys = jnp.concatenate([s1, s2], axis=2)  # (B, num_S, 3, T/16)
    ys, bns_s = batch_norm(ys, params["bn_s"], state["bn_s"], train=train,
                           mask=bn_sample_mask(ys, sample_weight))

    z = adaptive_avg_pool_w(ys, 8)  # (B, num_S, 3, 8)
    z = z.reshape(z.shape[0], -1)
    z = jax.nn.relu(nn.linear(params["fc1"], z))
    z = nn.dropout(z, dropout, r1, train)
    logits = nn.linear(params["fc2"], z)
    return logits, {"bn_t": bnt_s, "bn_s": bns_s}


def make_tsception_model(
    n_channels: int,
    n_samples: int,
    n_classes: int = 5,
    sfreq: float = 250.0,
    compute_dtype=jnp.float32,
    remat: bool = False,
):
    """TSception as a ``ModelDef`` for the generic training engine.

    ``remat=True`` recomputes the forward in backward (``jax.checkpoint``)
    — TSception's multi-scale temporal conv activations are ~25x larger
    than FAST's zone-head ones, so stacked training at the real geometry
    needs this lever (measured 33.5 GB vs the chip's 15.75 GB without)."""
    from ..train.engine import ModelDef

    # meta depends only on (n_channels, sfreq) + the init defaults, so
    # compute it once here — apply works before/without init (e.g. on
    # loaded checkpoints) with a single source of truth for the shapes
    # and no throwaway parameter allocation.
    meta = tsception_meta(n_channels, sfreq)

    def init(key):
        params, state, _ = tsception_init(
            key, n_channels, n_samples, n_classes, sfreq
        )
        return params, state

    def apply(params, state, x, *, train=False, rng=None, sample_weight=None):
        def fwd(p, s, xx, rr, sw):
            return tsception_apply(
                p, s, xx.astype(compute_dtype), meta,
                n_classes=n_classes, train=train, rng=rr, sample_weight=sw,
            )

        if remat:
            fwd = jax.checkpoint(fwd)
        return fwd(params, state, x, rng, sample_weight)

    return ModelDef(init=init, apply=apply)
