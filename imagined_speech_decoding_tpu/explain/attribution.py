"""Gradient-based attributions: integrated / expected gradients.

TPU-native replacement for the reference's ``shap.GradientExplainer``
(``scripts/explain_fast.py:75-123``). GradientExplainer implements
*expected gradients* — gradients at inputs interpolated toward random
background samples, averaged. Here that is a direct, fully batched
``jax.grad`` computation under one jit: no Python loop over samples, no
host round-trips per interpolation step.

Attribution contract matches SHAP's: per-input-element scores of shape
``(B, C, T)`` for a chosen class (or the predicted class), signed, and
(for integrated gradients) satisfying completeness up to numerical
error: ``sum(attr) ≈ f(x) - f(baseline)``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _class_score(apply_fn: Callable, params, state, x: jnp.ndarray, target: jnp.ndarray):
    """Scalar per-sample score: logit of the target class."""
    logits, _ = apply_fn(params, state, x, train=False, rng=None)
    return jnp.take_along_axis(logits, target[:, None], axis=-1)[:, 0]


def integrated_gradients(
    apply_fn: Callable,
    params,
    state,
    x: jnp.ndarray,  # (B, C, T)
    target: jnp.ndarray,  # (B,) class indices
    baseline: Optional[jnp.ndarray] = None,  # (C, T) or (B, C, T); default zeros
    n_steps: int = 32,
) -> jnp.ndarray:
    """Integrated gradients along the straight path from baseline to x."""
    if baseline is None:
        baseline = jnp.zeros_like(x)
    baseline = jnp.broadcast_to(baseline, x.shape)
    alphas = (jnp.arange(n_steps) + 0.5) / n_steps  # midpoint rule

    def grad_at(alpha):
        xi = baseline + alpha * (x - baseline)
        g = jax.grad(lambda xx: jnp.sum(_class_score(apply_fn, params, state, xx, target)))(xi)
        return g

    grads = jax.lax.map(grad_at, alphas)  # (n_steps, B, C, T)
    return jnp.mean(grads, axis=0) * (x - baseline)


def expected_gradients(
    apply_fn: Callable,
    params,
    state,
    x: jnp.ndarray,  # (B, C, T)
    background: jnp.ndarray,  # (N_bg, C, T)
    target: jnp.ndarray,  # (B,)
    key: jax.Array,
    n_samples: int = 32,
) -> jnp.ndarray:
    """Expected gradients (= SHAP GradientExplainer): for each of
    ``n_samples`` draws, pick a random background trial and a random
    interpolation point, evaluate the gradient there, and average
    ``grad * (x - bg)``."""
    kb, ka = jax.random.split(key)
    n_bg = background.shape[0]
    bg_idx = jax.random.randint(kb, (n_samples, x.shape[0]), 0, n_bg)
    alphas = jax.random.uniform(ka, (n_samples, x.shape[0]))

    def one(carry, inp):
        bidx, alpha = inp
        bg = background[bidx]  # (B, C, T)
        xi = bg + alpha[:, None, None] * (x - bg)
        g = jax.grad(lambda xx: jnp.sum(_class_score(apply_fn, params, state, xx, target)))(xi)
        return carry + g * (x - bg), None

    total, _ = jax.lax.scan(one, jnp.zeros_like(x), (bg_idx, alphas))
    return total / n_samples


def attribution_for_predictions(
    apply_fn: Callable,
    params,
    state,
    x: jnp.ndarray,
    background: jnp.ndarray,
    key: jax.Array,
    n_samples: int = 32,
):
    """Attribution w.r.t. each sample's *predicted* class + the predictions.

    The reference explains per-sample SHAP values against the model's
    output (``scripts/explain_fast.py:93-117`` normalizes multi-output
    SHAP to the relevant class); this computes the same quantity
    directly. Returns ``(attr (B, C, T), preds (B,))``.
    """
    logits, _ = apply_fn(params, state, x, train=False, rng=None)
    preds = jnp.argmax(logits, axis=-1)
    attr = expected_gradients(
        apply_fn, params, state, x, background, preds, key, n_samples
    )
    return attr, preds


def zone_importance(attr: jnp.ndarray, zone_indices: np.ndarray, zone_mask: np.ndarray):
    """Net per-zone influence: MEAN of attributions over each zone's
    channels and all timepoints (reference ``plot_zone_importance``
    computes ``np.mean(s_vals[zone_indices])``,
    ``scripts/explain_fast.py:362-369`` — a sum would skew zones by
    their channel count, 4..15). ``attr (B, C, T)`` → ``(B, Z)``."""
    per_channel = attr.mean(axis=-1)  # (B, C)
    z, cmax = zone_indices.shape
    gathered = per_channel[:, zone_indices.reshape(-1)].reshape(-1, z, cmax)
    mask = jnp.asarray(zone_mask, attr.dtype)
    return (gathered * mask).sum(axis=-1) / mask.sum(axis=-1)


def zone_time_matrix(
    attr_ct: np.ndarray, zone_indices: np.ndarray, zone_mask: np.ndarray
) -> np.ndarray:
    """Zone × time matrix: MEAN of a ``(C, T)`` attribution map over
    each zone's channels (reference ``compute_zone_time_matrix``,
    ``scripts/global_shap_analysis.py:231-258`` — a sum would skew
    zones by their channel count, 4..15, on the shared symmetric color
    scale). Returns ``(Z, T)``."""
    attr_ct = np.asarray(attr_ct)
    return np.stack([
        attr_ct[zone_indices[z][zone_mask[z]]].mean(0)
        for z in range(len(zone_indices))
    ])
