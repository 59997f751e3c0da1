"""Seed-ensemble training: posterior soft-voting over independent CV runs.

Beyond-reference accuracy lever. The reference pipeline selects ONE
best-fold model per subject and argmaxes its logits on the official test
set (``scripts/train_fast.py:182-201``); at its tiny model scale
(~0.2 M params, 280-trial training sets) run-to-run weight-init variance
is a large fraction of the test-accuracy variance, so averaging the
class posteriors of several independently seeded runs is a cheap,
well-understood accuracy gain. The TPU engine makes it nearly free to
*orchestrate*: each member is one stacked (subject x fold) ``train_per_
subject_cv`` program, so an E-member ensemble is E invocations of a
single already-compiled fit (the compile is paid once — every member
reuses the jit cache).

Design invariants:

  * **Identical folds across members.** Fold splits always derive from
    ``tc.seed`` (see ``train_per_subject_cv(model_seed=...)``); only
    weight init, dropout masks, and in-fit batch shuffling differ. A
    member's best-fold choice may legitimately differ — each member
    votes with its own best model per subject.
  * **Member 0 IS the single run.** ``member_seed(seed, 0) == seed``, so
    ``member-0/``'s artifact tree is bit-identical to a plain
    ``train_per_subject_cv`` run (tested in ``tests/test_ensemble.py``).
  * **Soft voting in f32.** Posteriors from :func:`engine.predict_proba`
    (f32 softmax over the model's logits) are averaged across members
    before the argmax — ties broken identically to numpy argmax.

Artifact layout under ``save_dir``: the reference tree (per-subject
``test_predictions.csv``, ``summary_per_subject.csv``,
``global_test_predictions.csv``, accuracy bar) holds the ENSEMBLE
decision at the root — so ``cli/benchmark.py`` and every other
reference-layout consumer reads the ensemble exactly like a single
model — with each member's own full tree under ``member-{e}/``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import TrainConfig
from ..utils import green
from . import artifacts
from .checkpoint import select_model
from .cv import CVRunResult, train_per_subject_cv
from .engine import ModelDef, predict_proba
from .metrics import confusion_matrix, f1_from_confusion


def member_seed(base_seed: int, member: int) -> int:
    """Per-member model seed. Member 0 keeps ``base_seed`` unchanged so a
    1-member ensemble reproduces the plain single run exactly; later
    members stride by a prime far larger than any plausible seed-sweep
    spacing, so member streams never collide with each other or with
    neighbouring base seeds."""
    return base_seed + 7919 * member


@dataclass
class EnsembleResult:
    summary: pd.DataFrame  # Subject, Best_Val_Acc, Test_Acc, Test_F1, Member_Mean_Test_Acc
    members: List[CVRunResult]
    proba_per_subject: Dict[str, np.ndarray]  # sid -> (n_test, n_classes) mean posterior


def train_seed_ensemble(
    model: ModelDef,
    tc: TrainConfig,
    X: np.ndarray,
    Y: np.ndarray,
    subjects: Sequence[str],
    n_classes: int,
    test_per_subject: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]] = None,
    save_dir: Optional[str] = None,
    n_members: int = 3,
    checkpoint_dir: Optional[str] = None,
    verbose: bool = True,
    **cv_kwargs,
) -> EnsembleResult:
    """Train ``n_members`` independent per-subject CV runs and soft-vote.

    ``cv_kwargs`` pass through to :func:`train_per_subject_cv`
    (``mesh_axis``, ``subject_group_size``, ``resume``, ...);
    ``save_dir``/``checkpoint_dir`` are namespaced per member here so
    resume state and artifacts never collide across members.
    """
    if n_members < 1:
        raise ValueError(f"n_members must be >= 1, got {n_members}")
    members: List[CVRunResult] = []
    for e in range(n_members):
        if verbose:
            print(f"=== ensemble member {e + 1}/{n_members} "
                  f"(model_seed {member_seed(tc.seed, e)}) ===")
        members.append(train_per_subject_cv(
            model, tc, X, Y, subjects, n_classes,
            test_per_subject=test_per_subject,
            save_dir=os.path.join(save_dir, f"member-{e}") if save_dir else None,
            checkpoint_dir=(
                os.path.join(checkpoint_dir, f"member-{e}") if checkpoint_dir else None
            ),
            verbose=verbose,
            model_seed=member_seed(tc.seed, e),
            **cv_kwargs,
        ))

    k = tc.n_folds
    rows = []
    proba_per_subject: Dict[str, np.ndarray] = {}
    global_pred, global_true = [], []
    for si, sid in enumerate(subjects):
        # mean over members of each member's own best-fold val accuracy
        best_val = float(np.mean([
            np.asarray(m.fit.best_val_acc)[si * k + m.best_fold_per_subject[sid]]
            for m in members
        ]))
        test_acc, test_f1 = np.nan, np.nan
        member_accs: List[float] = []
        if test_per_subject and sid in test_per_subject:
            x_test, y_test = test_per_subject[sid]
            y_true = y_test.astype(int)
            x_dev = jnp.asarray(x_test)
            probs = []
            for m in members:
                best_m = si * k + m.best_fold_per_subject[sid]
                p = predict_proba(
                    model.apply,
                    select_model(m.fit.best_params, best_m),
                    select_model(m.fit.best_model_state, best_m),
                    x_dev, tc.batch_size,
                )
                probs.append(p)
                member_accs.append(float(np.mean(p.argmax(-1) == y_true)))
            mean_proba = np.mean(np.stack(probs), axis=0)
            proba_per_subject[sid] = mean_proba
            y_pred = mean_proba.argmax(-1)
            cm = np.asarray(confusion_matrix(
                jnp.asarray(y_pred), jnp.asarray(y_true.astype(np.int32)), n_classes
            ))
            test_acc = float(np.trace(cm) / max(len(y_true), 1))
            test_f1 = float(f1_from_confusion(jnp.asarray(cm)))
            global_pred.append(y_pred)
            global_true.append(y_true)
            if save_dir:
                artifacts.save_predictions_csv(
                    os.path.join(save_dir, f"sub-{sid}", "test_predictions.csv"),
                    y_pred, y_true,
                )
        if verbose and not np.isnan(test_acc):
            print(
                f"Subject {sid}: ensemble test acc={green(f'{test_acc:.4f}')} "
                f"f1={test_f1:.4f} (members: "
                + " ".join(f"{a:.4f}" for a in member_accs) + ")"
            )
        rows.append([
            sid, best_val, test_acc, test_f1,
            float(np.mean(member_accs)) if member_accs else np.nan,
        ])

    summary = pd.DataFrame(rows, columns=[
        "Subject", "Best_Val_Acc", "Test_Acc", "Test_F1", "Member_Mean_Test_Acc",
    ])
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
    if verbose and global_pred:
        ens = float(np.mean(summary["Test_Acc"].dropna()))
        mem = float(np.mean(summary["Member_Mean_Test_Acc"].dropna()))
        print(f"ensemble mean test acc {ens:.4f} vs member mean {mem:.4f} "
              f"({n_members} members)")
    return EnsembleResult(
        summary=summary, members=members, proba_per_subject=proba_per_subject
    )
