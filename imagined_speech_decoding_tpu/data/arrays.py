"""Device-resident corpus + jitted batching.

TPU replacement for the reference's ``BasicDataset`` + host DataLoader
workers (``src/fast/data/loaders.py:11-24``, ``scripts/train_fast.py:
104-111``): the whole corpus (15 x 350 x 64 x 800 f32 ~= 1.1 GB) fits in
HBM, so "data loading" is an index gather inside the jitted train step —
no host processes, no H2D copies in the hot loop.

Batching semantics match torch ``DataLoader(shuffle=True,
drop_last=False)``: every epoch is a fresh permutation split into
``ceil(N / B)`` batches; the ragged final batch is expressed with a
static shape plus a per-row weight mask (weight 0 on padded slots), so
weighted losses/metrics reproduce the uneven-batch averages exactly
while every compiled shape stays static.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def num_batches(n: int, batch_size: int) -> int:
    return -(-n // batch_size)


def shuffled_epoch_indices(
    key: jax.Array, n: int, batch_size: int
) -> Tuple[jax.Array, jax.Array]:
    """One epoch of shuffled batch indices with a validity mask.

    Returns ``(idx, w)`` where ``idx`` is int32 ``(n_steps, B)`` into the
    trial axis and ``w`` is float32 ``(n_steps, B)`` with 1.0 on real
    slots and 0.0 on the padding of the final ragged batch. Jit-safe:
    ``n`` and ``batch_size`` are static.
    """
    n_steps = num_batches(n, batch_size)
    pad = n_steps * batch_size - n
    perm = jax.random.permutation(key, n)
    idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)]).reshape(n_steps, batch_size)
    w = (jnp.arange(n_steps * batch_size) < n).astype(jnp.float32).reshape(n_steps, batch_size)
    return idx.astype(jnp.int32), w


def sequential_batch_indices(n: int, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic (eval-order) batch indices with a validity mask."""
    n_steps = num_batches(n, batch_size)
    pad = n_steps * batch_size - n
    idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)]).reshape(n_steps, batch_size)
    w = (np.arange(n_steps * batch_size) < n).astype(np.float32).reshape(n_steps, batch_size)
    return idx.astype(np.int32), w


def flatten_subjects(x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Collapse a 4-D ``(S, N, C, T)`` corpus to ``(S*N, C, T)``.

    Mirrors ``BasicDataset``'s auto-flattening of 4-D inputs
    (``src/fast/data/loaders.py:14-16``).
    """
    if x.ndim == 4:
        x = x.reshape((-1,) + x.shape[2:])
        y = np.reshape(y, (-1,))
    return x, y


def to_device(x: np.ndarray, dtype=None, sharding=None) -> jax.Array:
    """Place an array on device (optionally sharded / cast)."""
    arr = jnp.asarray(x, dtype=dtype)
    if sharding is not None:
        arr = jax.device_put(arr, sharding)
    return arr
