"""Classification metrics as pure, weighted, jit-safe functions.

Replaces torchmetrics Accuracy / macro-F1 (reference ``src/fast/train/
trainer.py:41-46``) and the sklearn aggregation in ``scripts/
benchmark.py:55-58``. All metrics take an optional per-sample weight
vector so the statically-shaped ragged final batch (see
``data.arrays``) aggregates exactly like a host loop over uneven
batches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Weighted-mean softmax cross-entropy (f32 accumulate)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if weights is None:
        return jnp.mean(nll)
    w = weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def accuracy(
    logits: jnp.ndarray, labels: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if weights is None:
        return jnp.mean(correct)
    w = weights.astype(jnp.float32)
    return jnp.sum(correct * w) / jnp.maximum(jnp.sum(w), 1.0)


def confusion_matrix(
    logits_or_preds: jnp.ndarray,
    labels: jnp.ndarray,
    n_classes: int,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted confusion counts ``(true, pred) -> (K, K)``."""
    pred = (
        jnp.argmax(logits_or_preds, axis=-1)
        if logits_or_preds.ndim > labels.ndim
        else logits_or_preds
    )
    w = jnp.ones(labels.shape, jnp.float32) if weights is None else weights.astype(jnp.float32)
    oh_true = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    oh_pred = jax.nn.one_hot(pred, n_classes, dtype=jnp.float32)
    return jnp.einsum("nk,nj->kj", oh_true * w[:, None], oh_pred)


def f1_from_confusion(cm: jnp.ndarray, average: str = "macro") -> jnp.ndarray:
    """Macro (or per-class) F1 from a confusion matrix — sklearn semantics:
    classes with zero precision+recall contribute F1 = 0."""
    tp = jnp.diagonal(cm)
    support = cm.sum(axis=1)
    predicted = cm.sum(axis=0)
    prec = tp / jnp.maximum(predicted, 1e-12)
    rec = tp / jnp.maximum(support, 1e-12)
    f1 = 2 * prec * rec / jnp.maximum(prec + rec, 1e-12)
    if average == "macro":
        return jnp.mean(f1)
    if average == "none":
        return f1
    if average == "weighted":
        return jnp.sum(f1 * support) / jnp.maximum(support.sum(), 1e-12)
    raise ValueError(f"unknown average {average!r}")


def macro_f1(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    n_classes: int,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    return f1_from_confusion(confusion_matrix(logits, labels, n_classes, weights))


def precision_recall_from_confusion(cm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Macro precision and recall from confusion counts."""
    tp = jnp.diagonal(cm)
    prec = jnp.mean(tp / jnp.maximum(cm.sum(axis=0), 1e-12))
    rec = jnp.mean(tp / jnp.maximum(cm.sum(axis=1), 1e-12))
    return prec, rec


def ttest_vs_chance(accs: np.ndarray, chance: float = 0.2) -> Tuple[float, float]:
    """One-sample, one-sided t-test of per-subject accuracies vs chance
    (reference ``deprecated/model_benchmark.py:111-133``). Returns
    ``(t_stat, p_one_sided)``; host-side numpy/scipy."""
    from scipy import stats

    t, p_two = stats.ttest_1samp(np.asarray(accs, np.float64), chance)
    p_one = p_two / 2.0 if t > 0 else 1.0 - p_two / 2.0
    return float(t), float(p_one)
