"""Per-subject K-fold cross-validation — the fold/subject-vmapped engine.

TPU re-design of ``finetune_per_subject_cv`` (``scripts/train_fast.py:
68-265``): the reference trains 15 subjects x 5 folds x 200 epochs
*sequentially* (75,000 optimizer steps of a ~0.2 M-param model, each
step dominated by Python/Lightning overhead). Here every (subject, fold)
pair is one slice of a stacked model axis and ALL of them train
simultaneously inside one jitted program:

  * fold splits come from sklearn ``KFold(shuffle=True, random_state=
    seed)`` — split-for-split identical to the reference (``train_fast
    .py:94,100``);
  * the corpus is one flat device array; each model addresses its fold
    through global index vectors;
  * after training, best-fold selection per subject (max best-val-acc
    over folds, reference ``:182-185``), official-test evaluation of the
    selected model, and the full reference artifact tree.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import FASTConfig, TrainConfig
from ..data.arrays import to_device
from ..utils import green
from . import artifacts
from .checkpoint import save_model_npz, select_model
from .engine import FitResult, ModelDef, fit_many, fit_many_segmented, make_fit, predict
from .metrics import confusion_matrix, f1_from_confusion


def kfold_indices(
    n: int, n_folds: int, seed: int, shuffle: bool = True
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """sklearn ``KFold`` splits — identical to the reference's folds."""
    from sklearn.model_selection import KFold

    kf = KFold(n_splits=n_folds, shuffle=shuffle, random_state=seed if shuffle else None)
    return [(tr, va) for tr, va in kf.split(np.arange(n))]


def build_cv_index_stack(
    n_subjects: int, n_trials: int, n_folds: int, seed: int, shuffle: bool = True
) -> Tuple[np.ndarray, np.ndarray, List[Tuple[int, int]]]:
    """Global train/val index arrays for the (subject x fold) model stack.

    Returns ``(train_idx (M, n_train), val_idx (M, n_val), meta)`` where
    ``M = n_subjects * n_folds`` and ``meta[m] = (subject_i, fold_k)``.
    Indices address the flattened ``(S * n_trials)`` trial axis.
    Requires uniform folds (``n_trials % n_folds == 0`` — true for the
    reference dataset: 350 = 5 x 70).
    """
    if n_trials % n_folds != 0:
        raise ValueError(
            f"n_trials={n_trials} not divisible by n_folds={n_folds}; "
            "ragged folds are not supported by the stacked engine"
        )
    train_rows, val_rows, meta = [], [], []
    for s in range(n_subjects):
        folds = kfold_indices(n_trials, n_folds, seed, shuffle)
        for k, (tr, va) in enumerate(folds):
            train_rows.append(s * n_trials + tr)
            val_rows.append(s * n_trials + va)
            meta.append((s, k))
    return np.stack(train_rows), np.stack(val_rows), meta


def _segment_length(total_epochs: int, preferred: int) -> int:
    """Segment length for ``fit_many_segmented``: the largest divisor of
    ``total_epochs`` that is ≤ ``preferred``, so no segment runs surplus
    (frozen, see ``make_fit``) epochs past the budget. Falls back to
    ``preferred`` (exactness is still guaranteed by the engine's
    epoch-budget freeze; a non-divisor only wastes the surplus compute)
    when the largest divisor would make segments tiny."""
    total = max(int(total_epochs), 1)
    preferred = max(min(preferred, total), 1)
    best = max((d for d in range(1, preferred + 1) if total % d == 0), default=1)
    return best if best >= max(preferred // 2, 1) else preferred


def stacked_init(
    model: ModelDef, key: jax.Array, n_models: int, *, total: Optional[int] = None,
    offset: int = 0,
):
    """Initialize a stack of independent models (leading model axis).

    ``total``/``offset`` select a contiguous block out of the key stream
    a ``total``-model run would draw — so grouped execution (see
    ``train_per_subject_cv(subject_group_size=...)``) reproduces the
    exact per-model keys of the ungrouped run."""
    keys = jax.random.split(key, total or n_models)[offset : offset + n_models]
    return jax.vmap(model.init)(keys)


@dataclass
class CVRunResult:
    summary: pd.DataFrame  # Subject, Best_Val_Acc, Test_Acc, Test_F1
    fit: FitResult  # stacked over (S*K) models
    meta: List[Tuple[int, int]]
    best_fold_per_subject: Dict[str, int]


def train_per_subject_cv(
    model: ModelDef,
    tc: TrainConfig,
    X: np.ndarray,  # (S, N, C, T) train+val pool per subject
    Y: np.ndarray,  # (S, N)
    subjects: Sequence[str],
    n_classes: int,
    test_per_subject: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]] = None,
    save_dir: Optional[str] = None,
    data_dtype=None,
    warm_start: Optional[Tuple] = None,  # (params0, state0) stacked over S*K
    epochs_per_segment: int = 25,
    verbose: bool = True,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    mesh_axis: Optional[str] = None,
    subject_group_size: Optional[int] = None,
    checkpoint_every: int = 1,
    model_seed: Optional[int] = None,
    _key_block: Optional[Tuple[int, int]] = None,
) -> CVRunResult:
    """Run the full per-subject CV: train S*K models at once, select the
    best fold per subject, evaluate on the official test set, and write
    the reference artifact tree under ``save_dir``.

    ``subject_group_size``: train the subjects in sequential groups of
    at most this many (each group still trains its folds stacked). The
    memory lever for models whose activations are too large to stack
    all S*K instances in HBM at once (e.g. TSception at the real
    geometry). Fold splits and per-model init/fit keys are indexed by
    GLOBAL model position (``_key_block``), so the grouped run draws
    the identical RNG streams as the ungrouped one.

    ``model_seed``: seed for the per-model RNG streams (weight init +
    in-fit shuffling/dropout). Defaults to ``tc.seed``. The fold splits
    ALWAYS come from ``tc.seed`` — so seed-ensemble members
    (``train.ensemble``) share identical folds while drawing
    independent weights and batch orders.
    """
    s_count, n_trials = X.shape[:2]
    assert s_count == len(subjects)

    if subject_group_size and s_count > subject_group_size:
        return _train_grouped(
            model, tc, X, Y, subjects, n_classes, test_per_subject, save_dir,
            data_dtype, warm_start, epochs_per_segment, verbose,
            checkpoint_dir, resume, mesh_axis, subject_group_size,
            checkpoint_every, model_seed,
        )
    k = tc.n_folds
    m_count = s_count * k

    x_flat = to_device(X.reshape((-1,) + X.shape[2:]), dtype=data_dtype)
    y_flat = to_device(Y.reshape(-1).astype(np.int32))

    train_idx, val_idx, meta = build_cv_index_stack(
        s_count, n_trials, k, tc.seed, tc.shuffle_folds
    )
    n_train, n_val = train_idx.shape[1], val_idx.shape[1]

    key_off, key_total = _key_block if _key_block else (0, m_count)
    m_seed = tc.seed if model_seed is None else model_seed
    if warm_start is not None:
        params0, state0 = warm_start  # e.g. LOSO-pretrained (see train.loso)
    else:
        params0, state0 = stacked_init(
            model, jax.random.PRNGKey(m_seed), m_count,
            total=key_total, offset=key_off,
        )
    # Mesh strategies (SURVEY §2.5):
    #   'model' — shard the (subject x fold) stack; each chip trains its
    #     slice with zero collectives (the SPMD replacement for the
    #     reference's process-per-GPU subject sharding,
    #     deprecated/BCIC2020Track3_run.sh:6-8);
    #   'data'  — replicate the stack, shard every model's batch via a
    #     GSPMD constraint (XLA inserts the gradient all-reduce);
    #   '2d'    — both at once over a ('model', 'data') mesh.
    # Non-divisible stacks are padded with replicas and sliced back.
    from ..parallel.mesh import mesh_strategy

    batch_sharding, shard_stack_axis, stack_mesh = mesh_strategy(mesh_axis)

    # Segmented execution: one compiled `seg`-epoch program invoked
    # repeatedly (long single-program scans have crashed the TPU runtime;
    # segments also give natural resume points).
    seg = _segment_length(tc.max_epochs, epochs_per_segment)
    val_every = getattr(tc, "val_every", 1) or 1
    if val_every > 1:
        # Segments must hold whole val blocks (make_fit requires
        # epochs % val_every == 0); round the segment down to a
        # multiple, up to one block minimum.
        seg = max((seg // val_every) * val_every, val_every)
    fit = make_fit(
        model.apply,
        n_classes,
        epochs=seg,
        batch_size=tc.batch_size,
        n_train=n_train,
        n_val=n_val,
        learning_rate=tc.learning_rate,
        warmup_epochs=tc.warmup_epochs,
        final_scale=tc.final_lr_scale,
        weight_decay=tc.weight_decay,
        data_dtype=data_dtype,
        total_epochs=tc.max_epochs,
        batch_sharding=batch_sharding,
        val_every=val_every,
    )
    fit_keys = jax.random.split(jax.random.PRNGKey(m_seed + 1), key_total)[
        key_off : key_off + m_count
    ]

    tidx_d, vidx_d = jnp.asarray(train_idx), jnp.asarray(val_idx)
    m_padded = m_count
    if shard_stack_axis is not None:
        from ..parallel.mesh import shard_model_stack

        (fit_keys, params0, state0, tidx_d, vidx_d), (x_flat, y_flat), m_padded = (
            shard_model_stack(
                shard_stack_axis, m_count,
                [fit_keys, params0, state0, tidx_d, vidx_d],
                [x_flat, y_flat],
                mesh=stack_mesh,
            )
        )

    def progress(done_epochs, hist):
        if verbose:
            # slice off mesh-padding replicas so the live mean is unbiased
            va = float(np.mean(np.asarray(hist["val_acc"][:m_count, -1])))
            print(f"  epoch {done_epochs}/{tc.max_epochs}: mean val_acc {va:.4f}")

    t_fit0 = time.perf_counter()
    res: FitResult = jax.block_until_ready(
        fit_many_segmented(
            fit, fit_keys, params0, state0,
            tidx_d, vidx_d, x_flat, y_flat,
            total_epochs=tc.max_epochs, progress=progress,
            checkpoint_dir=checkpoint_dir, resume=resume,
            checkpoint_every=checkpoint_every,
        )
    )
    t_fit = time.perf_counter() - t_fit0
    if m_padded != m_count:  # drop the mesh-padding replicas
        res = jax.tree.map(lambda v: v[:m_count], res)

    t_art0 = time.perf_counter()
    best_val = np.asarray(res.best_val_acc)  # (M,)
    history = {h: np.asarray(v) for h, v in res.history.items()}  # (M, E)

    subject_rows = []
    global_pred, global_true = [], []
    best_fold_per_subject: Dict[str, int] = {}

    # Curve rendering is the artifact phase's dominant host cost (75
    # figures ≈ 33 s serial); plot_learning_curves is OO-API
    # thread-safe, so render concurrently while the loop proceeds with
    # device evals. Measured neutral on the 1-core bench container
    # (GIL timesharing) — the overlap pays on any multi-core host.
    # Futures are joined before returning so failures surface, not
    # vanish.
    from concurrent.futures import ThreadPoolExecutor

    plot_pool = ThreadPoolExecutor(max_workers=8) if save_dir else None
    plot_futures = []

    try:
        for si, sid in enumerate(subjects):
            fold_ms = [si * k + ki for ki in range(k)]
            fold_accs = best_val[fold_ms]
            best_k = int(np.argmax(fold_accs))
            best_m = fold_ms[best_k]
            best_fold_per_subject[sid] = best_k

            if save_dir:
                sub_dir = os.path.join(save_dir, f"sub-{sid}")
                for ki, mi in enumerate(fold_ms):
                    h = {name: history[name][mi] for name in ("loss", "acc", "val_loss", "val_acc")}
                    artifacts.save_history_csv(os.path.join(sub_dir, f"fold-{ki}_history.csv"), h)
                    plot_futures.append(plot_pool.submit(
                        artifacts.plot_learning_curves,
                        os.path.join(sub_dir, f"fold-{ki}_curves.png"), h,
                        f"Subject {sid} Fold {ki + 1}",
                    ))
                pd.DataFrame(
                    {"Fold": list(range(k)), "Best_Val_Acc": fold_accs}
                ).to_csv(os.path.join(sub_dir, "fold_metrics.csv"), index=False)

            best_params = select_model(res.best_params, best_m)
            best_mstate = select_model(res.best_model_state, best_m)
            if save_dir:
                # params + mutable state (BN running stats) — like a torch
                # state_dict, whose buffers ride along with the weights.
                save_model_npz(
                    os.path.join(save_dir, f"sub-{sid}", "best_subject.npz"),
                    best_params, best_mstate,
                )

            test_acc, test_f1 = np.nan, np.nan
            if test_per_subject and sid in test_per_subject:
                x_test, y_test = test_per_subject[sid]
                y_pred = predict(model.apply, best_params, best_mstate, jnp.asarray(x_test), tc.batch_size)
                cm = confusion_matrix(jnp.asarray(y_pred), jnp.asarray(y_test.astype(np.int32)), n_classes)
                test_acc = float(np.trace(np.asarray(cm)) / max(len(y_test), 1))
                test_f1 = float(f1_from_confusion(cm))
                global_pred.append(y_pred)
                global_true.append(y_test.astype(int))
                if save_dir:
                    artifacts.save_predictions_csv(
                        os.path.join(save_dir, f"sub-{sid}", "test_predictions.csv"),
                        y_pred, y_test.astype(int),
                    )
            if verbose:
                print(
                    f"Subject {sid}: best fold {best_k + 1} val_acc={fold_accs[best_k]:.4f}"
                    + (f" | test acc={green(f'{test_acc:.4f}')} f1={test_f1:.4f}"
                       if not np.isnan(test_acc) else "")
                )

            subject_rows.append([sid, float(fold_accs[best_k]), test_acc, test_f1])

        for f in plot_futures:
            f.result()  # propagate any render failure
    finally:
        # On an exception mid-loop (e.g. a device eval failing),
        # cancel queued renders and join running ones so worker
        # threads don't bury the original traceback behind
        # concurrent matplotlib work.
        if plot_pool is not None:
            plot_pool.shutdown(wait=True, cancel_futures=True)

    summary = pd.DataFrame(
        subject_rows, columns=["Subject", "Best_Val_Acc", "Test_Acc", "Test_F1"]
    )

    if verbose:
        print(
            f"  phases: fit {t_fit:.1f}s | per-subject artifacts+eval "
            f"{time.perf_counter() - t_art0:.1f}s"
        )
    if save_dir:
        summary.to_csv(os.path.join(save_dir, "summary_per_subject.csv"), index=False)
        if global_pred:
            artifacts.save_predictions_csv(
                os.path.join(save_dir, "global_test_predictions.csv"),
                np.concatenate(global_pred), np.concatenate(global_true),
            )
        if not summary.empty:
            artifacts.plot_subject_accuracy_bar(
                os.path.join(save_dir, "global_subject_accuracy.png"),
                summary["Subject"].tolist(), summary["Test_Acc"].tolist(),
            )

    return CVRunResult(
        summary=summary, fit=res, meta=meta, best_fold_per_subject=best_fold_per_subject
    )


def _train_grouped(
    model, tc, X, Y, subjects, n_classes, test_per_subject, save_dir,
    data_dtype, warm_start, epochs_per_segment, verbose,
    checkpoint_dir, resume, mesh_axis, group: int, checkpoint_every: int = 1,
    model_seed: Optional[int] = None,
) -> CVRunResult:
    """Sequential subject-group driver for ``train_per_subject_cv`` (see
    its ``subject_group_size``): each group runs the stacked engine over
    its own S_g*K models; per-subject artifacts land in the shared tree
    and the global artifacts are rewritten from the merged summary."""
    k = tc.n_folds
    s_total = len(subjects)
    summaries, fits, best_folds = [], [], {}
    for g0 in range(0, s_total, group):
        gsl = slice(g0, g0 + group)
        ws = None
        if warm_start is not None:
            ws = tuple(
                jax.tree.map(lambda v: v[g0 * k : (g0 + group) * k], part)
                for part in warm_start
            )
        res = train_per_subject_cv(
            model, tc, X[gsl], Y[gsl], subjects[gsl], n_classes,
            test_per_subject=test_per_subject, save_dir=save_dir,
            data_dtype=data_dtype, warm_start=ws,
            epochs_per_segment=epochs_per_segment, verbose=verbose,
            checkpoint_dir=(
                os.path.join(checkpoint_dir, f"group-{g0 // group}")
                if checkpoint_dir else None
            ),
            resume=resume, mesh_axis=mesh_axis,
            checkpoint_every=checkpoint_every, model_seed=model_seed,
            # global key indexing: same per-model keys as the ungrouped run
            _key_block=(g0 * k, s_total * k),
        )
        summaries.append(res.summary)
        fits.append(res.fit)
        best_folds.update(res.best_fold_per_subject)

    # meta over the CONCATENATED stack (group-local metas carry local
    # subject indices and must not be returned as-is)
    meta = [(si, ki) for si in range(s_total) for ki in range(k)]
    summary = pd.concat(summaries, ignore_index=True)
    fit = jax.tree.map(lambda *vs: np.concatenate([np.asarray(v) for v in vs]), *fits)
    if save_dir:
        summary.to_csv(os.path.join(save_dir, "summary_per_subject.csv"), index=False)
        if not summary.empty:
            artifacts.plot_subject_accuracy_bar(
                os.path.join(save_dir, "global_subject_accuracy.png"),
                summary["Subject"].tolist(), summary["Test_Acc"].tolist(),
            )
        # global predictions: concatenate the per-subject CSVs the group
        # runs just wrote (each group's own global file covered only its
        # subjects). Only subjects with test data in THIS run are read —
        # a stale CSV left in the tree by an earlier run must not leak
        # into the merged global artifact.
        preds, trues = [], []
        for sid in subjects:
            if not (test_per_subject and sid in test_per_subject):
                continue
            p = os.path.join(save_dir, f"sub-{sid}", "test_predictions.csv")
            if os.path.exists(p):
                y_pred, y_true = artifacts.load_predictions_csv(p)
                preds.append(y_pred)
                trues.append(y_true)
        if preds:
            artifacts.save_predictions_csv(
                os.path.join(save_dir, "global_test_predictions.csv"),
                np.concatenate(preds), np.concatenate(trues),
            )
    return CVRunResult(
        summary=summary, fit=fit, meta=meta, best_fold_per_subject=best_folds
    )
