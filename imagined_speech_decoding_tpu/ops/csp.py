"""Common Spatial Patterns (CSP) as batched, jittable linear algebra.

The reference's classical baseline uses ``mne.decoding.CSP(n_components=8,
log=True)`` inside an sklearn pipeline (``notebooks/svm_baseline.ipynb``
cell 9). Here CSP is a pure function of a trial tensor: class
covariances are one batched einsum, the generalized eigenproblem is
solved by whitening + ``eigh`` (deterministic up to sign; signs are
pinned by convention), and multiclass decomposes one-vs-rest.

Deterministic conventions:
  * filters ordered by descending eigenvalue distance from 0.5
    (most-discriminative first, alternating ends — the standard CSP
    ordering, equivalent to MNE's ``|λ - 0.5|`` sort);
  * each filter's largest-|coefficient| entry is made positive.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CSPModel(NamedTuple):
    filters: jnp.ndarray  # (n_components, C) spatial filters W
    patterns: jnp.ndarray  # (n_components, C) spatial patterns A = pinv(W)
    mean: jnp.ndarray  # (n_components,) feature standardization mean
    std: jnp.ndarray  # (n_components,) feature standardization std


def _class_covariances(x: jnp.ndarray, y: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """Per-class average spatial covariance, trace-normalized.

    ``x (N, C, T)``, ``y (N,)`` -> ``(K, C, C)``. Each trial covariance is
    normalized by its trace (scale-invariance, MNE ``norm_trace``-style
    robustness), then averaged within class with a one-hot weighting —
    fully batched, no data-dependent shapes.
    """
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    cov = jnp.einsum("nct,ndt->ncd", xc, xc) / x.shape[-1]
    tr = jnp.trace(cov, axis1=-2, axis2=-1)[:, None, None]
    cov = cov / jnp.maximum(tr, 1e-12)
    onehot = jax.nn.one_hot(y, n_classes, dtype=x.dtype)  # (N, K)
    counts = jnp.maximum(onehot.sum(0), 1.0)  # (K,)
    return jnp.einsum("nk,ncd->kcd", onehot, cov) / counts[:, None, None]


def _solve_csp_pair(c_a: jnp.ndarray, c_b: jnp.ndarray, reg: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the two-covariance CSP generalized eigenproblem.

    Returns (eigenvalues asc, filters-as-rows asc) of ``C_a v = λ (C_a+C_b) v``
    via whitening: ``M = (C_a + C_b)``, ``W = M^{-1/2}``, eigh of
    ``W C_a W``. ``reg`` is shrinkage toward the identity for
    conditioning (ill-posed tiny-sample covariances).
    """
    c = c_a + c_b
    dim = c.shape[-1]
    c = (1 - reg) * c + reg * jnp.trace(c) / dim * jnp.eye(dim, dtype=c.dtype)
    evals, evecs = jnp.linalg.eigh(c)
    evals = jnp.maximum(evals, 1e-12)
    whiten = evecs * jax.lax.rsqrt(evals)[None, :]  # (C, C): M^{-1/2} columns
    s = whiten.T @ c_a @ whiten
    lam, u = jnp.linalg.eigh((s + s.T) / 2)
    filters = (whiten @ u).T  # rows are filters, ascending λ
    return lam, filters


def _order_and_sign(lam: jnp.ndarray, filters: jnp.ndarray, n_components: int) -> jnp.ndarray:
    """Pick the ``n_components`` most discriminative filters, signs pinned."""
    order = jnp.argsort(-jnp.abs(lam - 0.5))
    sel = filters[order[:n_components]]
    # Sign convention: the max-|coef| entry of each filter is positive.
    amax = jnp.argmax(jnp.abs(sel), axis=1)
    signs = jnp.sign(sel[jnp.arange(sel.shape[0]), amax])
    return sel * jnp.where(signs == 0, 1.0, signs)[:, None]


def csp_fit(
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_classes: int,
    n_components: int = 8,
    reg: float = 1e-6,
) -> CSPModel:
    """Fit CSP filters from trials ``(N, C, T)`` and labels ``(N,)``.

    Two classes: the classic pairwise decomposition. More classes:
    one-vs-rest — ``n_components`` must divide evenly; each class
    contributes ``n_components // n_classes`` filters (standard OVR
    multiclass CSP; MNE uses approximate joint diagonalization instead —
    functionally comparable feature quality, deterministic here).
    """
    covs = _class_covariances(x, y, n_classes)

    if n_classes == 2:
        lam, filt = _solve_csp_pair(covs[0], covs[1], reg)
        w = _order_and_sign(lam, filt, n_components)
    else:
        if n_components % n_classes != 0:
            raise ValueError(
                f"n_components={n_components} must be divisible by n_classes={n_classes} for OVR CSP"
            )
        per = n_components // n_classes
        total = covs.sum(axis=0)
        ws = []
        for k in range(n_classes):
            lam, filt = _solve_csp_pair(covs[k], total - covs[k], reg)
            ws.append(_order_and_sign(lam, filt, per))
        w = jnp.concatenate(ws, axis=0)

    pat = jnp.linalg.pinv(w)  # (C, n_components)
    feats = _raw_features(x, w)
    return CSPModel(
        filters=w,
        patterns=pat.T,
        mean=feats.mean(axis=0),
        std=jnp.maximum(feats.std(axis=0), 1e-12),
    )


def _raw_features(x: jnp.ndarray, filters: jnp.ndarray) -> jnp.ndarray:
    """log-variance of the CSP projections: ``(N, C, T) -> (N, n_components)``."""
    proj = jnp.einsum("fc,nct->nft", filters, x)
    var = jnp.var(proj, axis=-1)
    return jnp.log(jnp.maximum(var, 1e-12))


def csp_transform(x: jnp.ndarray, model: CSPModel, standardize: bool = True) -> jnp.ndarray:
    """Project trials to standardized log-variance CSP features."""
    feats = _raw_features(x, model.filters)
    if standardize:
        feats = (feats - model.mean) / model.std
    return feats


def csp_fit_transform(
    x: jnp.ndarray, y: jnp.ndarray, n_classes: int, n_components: int = 8, reg: float = 1e-6
) -> Tuple[CSPModel, jnp.ndarray]:
    model = csp_fit(x, y, n_classes, n_components, reg)
    return model, csp_transform(x, model)
