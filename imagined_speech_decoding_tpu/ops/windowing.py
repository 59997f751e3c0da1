"""Windowing / epoching ops: sliding windows, baseline correction, padding.

The reference's sequence-scaling mechanism is ``x.unfold(-1, window_len,
slide_step)`` (``src/fast/models/fast.py:247``) — an 800-sample trial
becomes 5 overlapping 250-sample windows. Here that is a static gather
(XLA turns it into a copy-free strided view where possible), batched
over arbitrary leading dims, plus the standard epoching helpers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def num_windows(seq_len: int, window_len: int, step: int) -> int:
    """Token count of the sliding tokenizer (reference ``fast.py:232``)."""
    return (seq_len - window_len) // step + 1


def sliding_window(x: jnp.ndarray, window_len: int, step: int) -> jnp.ndarray:
    """``(..., T) -> (..., N, W)`` overlapping windows (torch ``unfold`` equiv).

    ``N = (T - window_len) // step + 1``; trailing samples that don't fill
    a window are dropped, matching ``Tensor.unfold`` semantics.
    """
    t = x.shape[-1]
    n = num_windows(t, window_len, step)
    if n <= 32:
        # N static contiguous slices, stacked. A fancy-index gather here
        # (x[..., idx]) lowers to a TPU gather — scalar-unit bound and
        # ~100x slower than pure copies that XLA fuses into consumers.
        return jnp.stack(
            [
                jax.lax.slice_in_dim(x, s * step, s * step + window_len, axis=-1)
                for s in range(n)
            ],
            axis=-2,
        )
    # Dense tokenization (small step_override -> hundreds of windows):
    # unrolled slices would balloon the HLO; one gather stays a single op.
    starts = np.arange(n)[:, None] * step
    offs = np.arange(window_len)[None, :]
    return x[..., jnp.asarray(starts + offs)]


def edge_pad(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Edge-pad the trailing axis to ``target_len`` (795 -> 800 parity,
    reference ``src/fast/data/preprocess.py:62``)."""
    t = x.shape[-1]
    if t >= target_len:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target_len - t)]
    return jnp.pad(x, pad, mode="edge")


def baseline_correct(x: jnp.ndarray, n_baseline: int) -> jnp.ndarray:
    """Subtract the mean of the first ``n_baseline`` samples per signal."""
    base = jnp.mean(x[..., :n_baseline], axis=-1, keepdims=True)
    return x - base


def epoch_continuous(
    x: jnp.ndarray,
    onsets: Sequence[int],
    n_samples: int,
) -> jnp.ndarray:
    """Cut epochs from a continuous recording ``(..., T)``.

    ``onsets`` are static sample indices; returns ``(..., E, n_samples)``.
    """
    onsets = np.asarray(onsets)
    idx = jnp.asarray(onsets[:, None] + np.arange(n_samples)[None, :])
    return x[..., idx]


def zone_gather(
    x: jnp.ndarray, indices: np.ndarray, mask: np.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather montage channels into the dense zone layout.

    ``x``: ``(..., C, T)``; ``indices``/``mask``: ``(Z, C_max)`` from
    ``data.constants.zone_layout``. Returns ``(x_zones, m)`` where
    ``x_zones`` is ``(..., Z, C_max, T)`` with padded slots zeroed and
    ``m`` is the float mask ``(Z, C_max)``.

    This is the batched replacement for the reference's per-zone ragged
    indexing ``x[:, self.index_dict[area]]`` (``fast.py:210``).
    """
    gathered = jnp.take(x, jnp.asarray(indices).reshape(-1), axis=-2)
    z, cmax = indices.shape
    gathered = gathered.reshape(x.shape[:-2] + (z, cmax, x.shape[-1]))
    m = jnp.asarray(mask, dtype=x.dtype)
    return gathered * m[..., :, :, None], m
