"""LOSO (leave-one-subject-out) cross-subject pretraining + warm-start.

Capability parity with the reference's deprecated-generation pretraining
(``deprecated/BCIC2020Track3_train.py:158-249``): for each target
subject, pool the other 14 subjects' trials, hold out a stratified 10%
validation split, train, and keep the best-val checkpoint
(``Pretrain_excludes_sub{i}``); finetuning can warm-start from it
(``:284-286``). The reference's skip-if-checkpoint-exists idempotency
(``:163-165``) is preserved.

TPU re-design: all 15 LOSO exclusions train *simultaneously* as one
stacked model axis — the same megabatched engine as the CV path; each
model's train/val index vectors simply exclude its target subject.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.arrays import to_device
from ..utils import green
from .checkpoint import load_state_dict, save_state_dict, select_model
from .engine import FitResult, ModelDef, fit_many_segmented, make_fit
from .cv import stacked_init


def build_loso_index_stack(
    y: np.ndarray,  # (S, N) labels — needed for the stratified val split
    val_frac: float = 0.1,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-target-subject train/val global index arrays.

    For target subject ``s``, pool all other subjects' trials and carve a
    stratified ``val_frac`` validation split (sklearn
    ``train_test_split(stratify=...)``, matching the reference's 90/10
    split at ``deprecated/BCIC2020Track3_train.py:183-186``).
    Returns ``(train_idx (S, n_tr), val_idx (S, n_val))`` into the
    flattened ``(S*N)`` trial axis.
    """
    from sklearn.model_selection import train_test_split

    s_count, n = y.shape
    train_rows, val_rows = [], []
    for s in range(s_count):
        pool = np.concatenate(
            [np.arange(o * n, (o + 1) * n) for o in range(s_count) if o != s]
        )
        labels = y.reshape(-1)[pool]
        # stratified split needs at least one val sample per class
        n_val = max(int(round(val_frac * len(pool))), len(np.unique(labels)))
        tr, va = train_test_split(
            pool, test_size=n_val, random_state=seed, stratify=labels
        )
        train_rows.append(np.sort(tr))
        val_rows.append(np.sort(va))
    return np.stack(train_rows), np.stack(val_rows)


def _ckpt_path(save_dir: str, sid: str) -> str:
    return os.path.join(save_dir, f"Pretrain_excludes_sub{sid}.npz")


def pretrain_loso(
    model: ModelDef,
    X: np.ndarray,  # (S, N, C, T)
    Y: np.ndarray,  # (S, N)
    subjects: List[str],
    n_classes: int,
    save_dir: str,
    epochs: int = 100,
    batch_size: int = 64,
    learning_rate: float = 5e-4,
    warmup_epochs: int = 10,
    seed: int = 42,
    data_dtype=None,
    verbose: bool = True,
    mesh_axis: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    return_result: bool = False,
) -> List:
    """Train all LOSO-pretrained models at once; save best-val weights.

    Idempotent: if every per-subject checkpoint already exists, they are
    loaded and returned without training (reference ``:163-165``).
    Returns the list of best param pytrees, one per excluded subject.
    ``return_result=True`` returns ``(best_list, FitResult)`` instead —
    the full stacked history/best-acc for observability checks (e.g.
    the multichip dryrun's sharded==unsharded comparison; not available
    on the skip-if-exists fast path, which returns ``(best, None)``).
    """
    os.makedirs(save_dir, exist_ok=True)
    s_count = len(subjects)
    template, _ = model.init(jax.random.PRNGKey(0))

    if all(os.path.exists(_ckpt_path(save_dir, sid)) for sid in subjects):
        if verbose:
            print(green(f"LOSO: all {s_count} checkpoints exist — skipping pretraining"))
        loaded = [load_state_dict(_ckpt_path(save_dir, sid), template) for sid in subjects]
        return (loaded, None) if return_result else loaded

    train_idx, val_idx = build_loso_index_stack(Y, val_frac=0.1, seed=seed)
    n_train, n_val = train_idx.shape[1], val_idx.shape[1]

    x_flat = to_device(X.reshape((-1,) + X.shape[2:]), dtype=data_dtype)
    y_flat = to_device(Y.reshape(-1).astype(np.int32))

    params0, state0 = stacked_init(model, jax.random.PRNGKey(seed), s_count)
    # Mesh strategy (same semantics as train_per_subject_cv): 'model'
    # shards the 15-exclusion sweep (BASELINE config #5: LOSO sweep
    # parallel over v5e-8), 'data' shards each model's batch with an
    # automatic gradient all-reduce, '2d' does both.
    from ..parallel.mesh import mesh_strategy, shard_model_stack

    batch_sharding, stack_axis, stack_mesh = mesh_strategy(mesh_axis)
    from .cv import _segment_length

    seg = _segment_length(epochs, 25)
    fit = make_fit(
        model.apply, n_classes, epochs=seg, batch_size=batch_size,
        n_train=n_train, n_val=n_val, learning_rate=learning_rate,
        warmup_epochs=warmup_epochs, data_dtype=data_dtype, total_epochs=epochs,
        batch_sharding=batch_sharding,
    )
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), s_count)
    tidx_d, vidx_d = jnp.asarray(train_idx), jnp.asarray(val_idx)
    m_padded = s_count
    if stack_axis is not None:
        (keys, params0, state0, tidx_d, vidx_d), (x_flat, y_flat), m_padded = (
            shard_model_stack(
                stack_axis, s_count,
                [keys, params0, state0, tidx_d, vidx_d],
                [x_flat, y_flat],
                mesh=stack_mesh,
            )
        )
    res: FitResult = jax.block_until_ready(
        fit_many_segmented(
            fit, keys, params0, state0,
            tidx_d, vidx_d, x_flat, y_flat,
            total_epochs=epochs,
            checkpoint_dir=checkpoint_dir, resume=resume,
        )
    )
    if m_padded != s_count:
        res = jax.tree.map(lambda v: v[:s_count], res)

    best = []
    for si, sid in enumerate(subjects):
        p = select_model(res.best_params, si)
        save_state_dict(_ckpt_path(save_dir, sid), p)
        best.append(p)
        if verbose:
            acc = float(np.asarray(res.best_val_acc)[si])
            print(f"LOSO pretrain (excl. {sid}): best val_acc={green(f'{acc:.4f}')}")
    return (best, res) if return_result else best


def stack_pretrained_for_cv(
    pretrained: List, n_folds: int
):
    """Replicate each subject's pretrained params across its folds so the
    CV engine can warm-start: ``[S params] -> stacked (S*K) params``."""
    expanded = []
    for p in pretrained:
        expanded.extend([p] * n_folds)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *expanded)
