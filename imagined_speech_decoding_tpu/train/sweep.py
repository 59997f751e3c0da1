"""Hyperparameter search as ONE compiled program.

The reference has no sweep machinery at all — exploring a learning rate
or weight-decay change means editing ``configs/default.yaml`` /
CLI flags (``/root/reference/scripts/train_fast.py:269-289``) and
re-running the whole sequential campaign once per setting. On TPU the
natural shape is the same megabatching trick the CV engine uses for
(subject × fold): make lr/wd *runtime* tensors (``make_fit(sweep=True)``
— exact, see its docstring) and ``vmap`` the full training run over a
(config × fold) model axis. A 12-point grid × 5 folds trains as 60
simultaneous models for roughly the price of one config, because the
~0.2 M-param model is nowhere near saturating the chip at small stacks
(docs/PERFORMANCE.md: throughput is flat in stack size).

Controlled comparison: every config shares the SAME fold splits, the
SAME per-fold init params, and the SAME per-fold shuffle/dropout key
stream — the only thing that differs across grid rows is the optimizer
math, so accuracy differences are attributable to the hyperparameters
alone (the reference cannot do this across separate runs that re-seed
globally).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .engine import FitResult, ModelDef, make_fit


def hyper_grid(
    lr_scales: Sequence[float],
    wd_scales: Sequence[float],
    warmup_epochs_list: Optional[Sequence[int]] = None,
    *,
    lr_tables: Optional[np.ndarray] = None,
) -> Tuple[Dict[str, jnp.ndarray], List[Tuple]]:
    """Cross product of runtime hyperparameters as stacked hyper arrays.

    Without ``warmup_epochs_list``: ``({'lr_scale': (H,), 'wd_scale':
    (H,)}, meta)`` with ``meta[h] = (lr_scale, wd_scale)`` in row-major
    (lr-outer) order. With it, the grid gains a third (innermost) warmup
    axis, ``meta[h] = (lr_scale, wd_scale, warmup_epochs)``, and
    ``hyper['lr_table']`` carries each row's absolute per-step lr table
    (``lr_tables[w_index]``, shape ``(n_warmups, total_steps)``, built
    by the caller for its epoch/step geometry).
    """
    if warmup_epochs_list is None:
        meta = [(float(a), float(b)) for a in lr_scales for b in wd_scales]
        return {
            "lr_scale": jnp.asarray([m[0] for m in meta], jnp.float32),
            "wd_scale": jnp.asarray([m[1] for m in meta], jnp.float32),
        }, meta
    if lr_tables is None or len(lr_tables) != len(warmup_epochs_list):
        raise ValueError("warmup sweep needs one lr_table row per warmup value")
    meta = [
        (float(a), float(b), int(w))
        for a in lr_scales
        for b in wd_scales
        for w in warmup_epochs_list
    ]
    w_index = {int(w): i for i, w in enumerate(warmup_epochs_list)}
    return {
        "lr_scale": jnp.asarray([m[0] for m in meta], jnp.float32),
        "wd_scale": jnp.asarray([m[1] for m in meta], jnp.float32),
        "lr_table": jnp.asarray(
            np.stack([lr_tables[w_index[m[2]]] for m in meta]), jnp.float32
        ),
    }, meta


def sweep_many(
    fit_fn, hyper, keys, params0, state0, train_idx, val_idx, X, Y
) -> FitResult:
    """``fit_many`` for sweep-mode fits: vmap over (hyper, model) axis 0
    with the corpus broadcast. ``hyper`` leaves, ``keys``, params/state
    stacks and index arrays all share leading axis M."""
    return jax.vmap(fit_fn, in_axes=(0, 0, 0, 0, 0, 0, None, None))(
        hyper, keys, params0, state0, train_idx, val_idx, X, Y
    )


def _tile_models(tree, reps: int):
    """Repeat a stacked pytree's model axis ``reps`` times (config axis
    outer, so row ``h * F + f`` is config h, fold f)."""
    return jax.tree.map(
        lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), tree
    )


@dataclass
class SweepReport:
    """Result of :func:`cv_sweep` over an (lr × wd [× warmup]) grid with
    K folds."""

    lr: np.ndarray  # (H,) absolute learning rates
    wd: np.ndarray  # (H,) absolute weight decays
    fold_val_acc: np.ndarray  # (H, F) best val acc per fold
    mean_val_acc: np.ndarray  # (H,)
    std_val_acc: np.ndarray  # (H,)
    best_index: int  # argmax of mean_val_acc
    history: Dict[str, np.ndarray]  # each (H, F, E)
    meta: List[Tuple]  # (lr_scale, wd_scale[, warmup_epochs]) per row
    warmup: Optional[np.ndarray] = None  # (H,) warmup epochs, if swept

    @property
    def best(self) -> Dict[str, float]:
        h = self.best_index
        out = {
            "learning_rate": float(self.lr[h]),
            "weight_decay": float(self.wd[h]),
            "mean_val_acc": float(self.mean_val_acc[h]),
            "std_val_acc": float(self.std_val_acc[h]),
        }
        if self.warmup is not None:
            out["warmup_epochs"] = int(self.warmup[h])
        return out

    def rows(self) -> List[Dict[str, float]]:
        """Flat per-config records (for CSV export)."""
        out = []
        for h in range(len(self.lr)):
            row = {
                "learning_rate": float(self.lr[h]),
                "weight_decay": float(self.wd[h]),
                "mean_val_acc": float(self.mean_val_acc[h]),
                "std_val_acc": float(self.std_val_acc[h]),
            }
            if self.warmup is not None:
                row["warmup_epochs"] = int(self.warmup[h])
            for f in range(self.fold_val_acc.shape[1]):
                row[f"fold{f}_val_acc"] = float(self.fold_val_acc[h, f])
            out.append(row)
        return out


def cv_sweep(
    model: ModelDef,
    n_classes: int,
    X,
    Y,
    *,
    n_trials: int,
    lr_scales: Sequence[float],
    wd_scales: Sequence[float] = (1.0,),
    n_folds: int = 5,
    epochs: int = 30,
    batch_size: int = 64,
    base_learning_rate: float = 5e-4,
    base_weight_decay: float = 0.01,
    warmup_epochs: int = 10,
    warmup_epochs_list: Optional[Sequence[int]] = None,
    final_lr_scale: float = 0.1,
    seed: int = 42,
    data_dtype=None,
    segment_epochs: Optional[int] = None,
) -> SweepReport:
    """K-fold CV over an (lr × wd [× warmup]) grid, all in one program.

    ``X (n_trials, C, T)`` / ``Y (n_trials,)`` is one subject's corpus
    on device; folds are the same sklearn KFold splits the CV driver
    uses (``cv.kfold_indices``). Absolute hyperparameters are
    ``base_* × scale``. ``warmup_epochs_list`` additionally sweeps the
    warmup LENGTH as a runtime input: each grid row carries its own
    absolute per-step lr table (``hyper['lr_table']``), exact by the
    same step-lr linearity as the scale sweep. ``segment_epochs`` runs
    the sweep through the segmented executor (long-scan safety;
    identical trajectories — the engine derives epoch keys from the
    global epoch counter) instead of one whole-run program.

    Runtime-sweepable through this engine: learning rate, weight decay,
    and the entire lr-schedule shape (warmup length, final scale, decay
    family — anything expressible as a per-step lr table). Recompile-
    bound (one XLA program per value): batch size, epochs, dropout
    rates, model architecture/head — their values are baked into the
    compiled graph's shapes or constants.
    """
    # Deferred: cv pulls pandas/artifacts, which plain engine users
    # (and `import ...train`) should not pay for.
    from .cv import build_cv_index_stack, stacked_init
    from .schedule import cosine_scheduler

    tr, va, _ = build_cv_index_stack(1, n_trials, n_folds, seed)
    n_train, n_val = tr.shape[1], va.shape[1]
    if warmup_epochs_list is None:
        hyper1, meta = hyper_grid(lr_scales, wd_scales)
        warmups = None
    else:
        from .engine import num_batches as _nb

        spe = _nb(n_train, batch_size)
        tables = np.stack([
            base_learning_rate
            * cosine_scheduler(1.0, final_lr_scale, epochs, spe, warmup_epochs=w)
            for w in warmup_epochs_list
        ])
        hyper1, meta = hyper_grid(
            lr_scales, wd_scales, warmup_epochs_list, lr_tables=tables
        )
        warmups = np.asarray([m[2] for m in meta])
    H, F = len(meta), n_folds

    # One init + one key stream per FOLD, shared across all configs.
    pf, sf = stacked_init(model, jax.random.PRNGKey(seed), F)
    params0, state0 = _tile_models(pf, H), _tile_models(sf, H)
    keys = _tile_models(jax.random.split(jax.random.PRNGKey(seed + 1), F), H)
    hyper = {k: jnp.repeat(v, F, axis=0) for k, v in hyper1.items()}
    tidx = jnp.asarray(np.tile(tr, (H, 1)))
    vidx = jnp.asarray(np.tile(va, (H, 1)))

    fit = make_fit(
        model.apply,
        n_classes,
        epochs=segment_epochs or epochs,
        batch_size=batch_size,
        n_train=n_train,
        n_val=n_val,
        learning_rate=base_learning_rate,
        weight_decay=base_weight_decay,
        warmup_epochs=warmup_epochs,
        data_dtype=data_dtype,
        total_epochs=epochs if segment_epochs else None,
        sweep=True,
    )
    if segment_epochs:
        from .engine import fit_many_segmented

        res = fit_many_segmented(
            fit, keys, params0, state0, tidx, vidx, X, Y,
            total_epochs=epochs, hyper=hyper,
        )
    else:
        run = jax.jit(lambda *a: sweep_many(fit, *a))
        res = run(hyper, keys, params0, state0, tidx, vidx, X, Y)

    acc = np.asarray(res.best_val_acc, np.float64).reshape(H, F)
    history = {
        k: np.asarray(v, np.float32).reshape(H, F, -1)
        for k, v in res.history.items()
    }
    mean = acc.mean(1)
    return SweepReport(
        lr=np.asarray([base_learning_rate * m[0] for m in meta]),
        wd=np.asarray([base_weight_decay * m[1] for m in meta]),
        fold_val_acc=acc,
        mean_val_acc=mean,
        std_val_acc=acc.std(1),
        best_index=int(np.argmax(mean)),
        history=history,
        meta=meta,
        warmup=warmups,
    )
