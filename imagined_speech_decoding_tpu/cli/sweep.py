"""Hyperparameter sweep CLI: an (lr × wd) grid × K folds in one program.

The reference explores hyperparameters by editing
``configs/default.yaml`` / CLI flags and re-running the sequential
campaign once per setting (``/root/reference/scripts/train_fast.py:
269-289`` merges YAML + argparse into one fixed config per run). Here
the whole grid trains simultaneously on one chip via runtime
hyperparameters (``train.sweep`` — see its module docstring for why
this is exact and controlled), and the driver writes:

    <out>/sweep_results.csv     one row per config: lr, wd, per-fold +
                                mean/std best val accuracy
    <out>/sweep_heatmap.png     lr × wd mean-val-acc matrix
    <out>/best.json             the winning configuration

Data: one subject from the raw dataset (``--subject`` + ``--data_folder``,
reference loader semantics) or ``--synthetic`` trials (no dataset
needed; used by tests).

Scope — what is runtime-sweepable vs recompile-bound:

  * RUNTIME (this CLI; one compiled program for the whole grid):
    learning rate (``--lr_scales``), weight decay (``--wd_scales``),
    and warmup length (``--warmup_grid``) — more generally any
    lr-schedule shape, since each grid row can carry its own per-step
    lr table (``train.sweep.hyper_grid(lr_tables=...)``); all exact by
    AdamW's linearity in the step lr.
  * RECOMPILE-BOUND (one XLA program per value; sweep them by looping
    this CLI): batch size and epochs (change the compiled scan shapes),
    dropout rates and head/architecture choice (baked into the traced
    graph). The reference's YAML exposes these too
    (``configs/default.yaml``) but pays a full sequential re-run per
    value either way.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="CV hyperparameter sweep (one compiled program)")
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--data_folder", type=str, default="BCIC2020Track3")
    p.add_argument("--subject", type=str, default="01")
    p.add_argument(
        "--lr_scales", type=str, default="0.25,0.5,1,2,4",
        help="comma-separated multipliers of the base learning rate",
    )
    p.add_argument(
        "--wd_scales", type=str, default="0,1,10",
        help="comma-separated multipliers of the base weight decay",
    )
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_folds", type=int, default=5)
    p.add_argument("--base_lr", type=float, default=5e-4)
    p.add_argument("--base_wd", type=float, default=0.01)
    p.add_argument("--warmup_epochs", type=int, default=10)
    p.add_argument(
        "--warmup_grid", type=str, default="",
        help="comma-separated warmup-epoch values to sweep as a third "
        "runtime grid axis (each row carries its own per-step lr table; "
        "empty = fixed --warmup_epochs)",
    )
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--precision", type=str, default="bf16", choices=["bf16", "f32"])
    p.add_argument(
        "--segment_epochs", type=int, default=0,
        help="run through the segmented executor in chunks of this many "
        "epochs (0 = one whole-run program)",
    )
    p.add_argument("--output_dir", type=str, default="results/sweep")
    p.add_argument("--synthetic", type=int, default=0, metavar="N_TRIALS",
                   help="use a synthetic corpus of N trials instead of the dataset")
    p.add_argument(
        "--no-strict", action="store_true",
        help="disable strict schema validation of raw dataset files "
        "(strict is the default: a present-but-deviating .mat/.xlsx "
        "fails loudly with the expected schema)",
    )
    return p


def _parse_scales(spec: str):
    vals = [float(v) for v in spec.split(",") if v.strip() != ""]
    if not vals:
        raise ValueError(f"empty scale list: {spec!r}")
    return vals


def save_artifacts(out_dir, report, lr_scales, wd_scales, warmup_grid=None):
    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "sweep_results.csv")
    pd.DataFrame(report.rows()).to_csv(csv_path, index=False)

    best_path = os.path.join(out_dir, "best.json")
    with open(best_path, "w") as f:
        json.dump(report.best, f, indent=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_w = len(warmup_grid) if warmup_grid else 1
    mat = np.asarray(report.mean_val_acc).reshape(
        len(lr_scales), len(wd_scales), n_w
    ).max(-1)  # best-over-warmup per (lr, wd) cell
    fig, ax = plt.subplots(figsize=(1.2 + 1.1 * len(wd_scales), 1.0 + 0.8 * len(lr_scales)))
    im = ax.imshow(mat, cmap="viridis")
    ax.set_xticks(range(len(wd_scales)), [f"{report.wd[j * n_w]:g}" for j in range(len(wd_scales))])
    ax.set_yticks(
        range(len(lr_scales)),
        [f"{report.lr[i * len(wd_scales) * n_w]:g}" for i in range(len(lr_scales))],
    )
    ax.set_xlabel("weight decay")
    ax.set_ylabel("learning rate")
    ax.set_title(
        "mean best val accuracy"
        + (f" (max over {n_w} warmups)" if n_w > 1 else "")
    )
    for i in range(mat.shape[0]):
        for j in range(mat.shape[1]):
            ax.text(j, i, f"{mat[i, j]:.3f}", ha="center", va="center",
                    color="w" if mat[i, j] < mat.max() * 0.85 else "k", fontsize=8)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    png_path = os.path.join(out_dir, "sweep_heatmap.png")
    fig.savefig(png_path, dpi=120)
    plt.close(fig)
    return csv_path, png_path, best_path


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    import jax.numpy as jnp
    import numpy as np

    from ..config import load_config
    from ..models.api import make_fast_model
    from ..train.sweep import cv_sweep

    lr_scales = _parse_scales(args.lr_scales)
    wd_scales = _parse_scales(args.wd_scales)
    warmup_grid = (
        [int(v) for v in args.warmup_grid.split(",") if v.strip() != ""]
        if args.warmup_grid else None
    )

    cfg = load_config(args.config if os.path.exists(args.config) else None, {})
    if args.synthetic:
        from ..data.synthetic import synthetic_trials

        mcfg = cfg.model
        x, y = synthetic_trials(
            args.seed, args.synthetic, mcfg.n_channels, mcfg.seq_len, mcfg.n_classes
        )
        label = f"synthetic-{args.synthetic}"
    else:
        from ..data import resolve_data_folder
        from ..data.ingest import load_subject_train_val

        mcfg = cfg.model
        x, y = load_subject_train_val(resolve_data_folder(args.data_folder), args.subject, strict=not getattr(args, "no_strict", False))
        label = f"sub-{args.subject}"

    n_trials = x.shape[0]
    if n_trials % args.n_folds:
        drop = n_trials % args.n_folds
        print(f"dropping {drop} trailing trials for uniform {args.n_folds}-fold splits")
        x, y = x[: n_trials - drop], y[: n_trials - drop]
        n_trials -= drop

    model = make_fast_model(
        mcfg, compute_dtype=jnp.bfloat16 if args.precision == "bf16" else None
    )
    X = jnp.asarray(np.asarray(x, np.float32))
    Y = jnp.asarray(np.asarray(y).astype(np.int32))

    h = len(lr_scales) * len(wd_scales) * (len(warmup_grid) if warmup_grid else 1)
    print(
        f"sweep [{label}]: {len(lr_scales)} lr x {len(wd_scales)} wd"
        + (f" x {len(warmup_grid)} warmup" if warmup_grid else "")
        + f" x {args.n_folds} folds = {h * args.n_folds} models, "
        f"{args.epochs} epochs"
    )
    report = cv_sweep(
        model,
        mcfg.n_classes,
        X,
        Y,
        n_trials=n_trials,
        lr_scales=lr_scales,
        wd_scales=wd_scales,
        n_folds=args.n_folds,
        epochs=args.epochs,
        batch_size=args.batch_size,
        base_learning_rate=args.base_lr,
        base_weight_decay=args.base_wd,
        warmup_epochs=args.warmup_epochs,
        warmup_epochs_list=warmup_grid,
        seed=args.seed,
        data_dtype=jnp.bfloat16 if args.precision == "bf16" else None,
        segment_epochs=args.segment_epochs or None,
    )

    csv_path, png_path, best_path = save_artifacts(
        args.output_dir, report, lr_scales, wd_scales, warmup_grid
    )
    b = report.best
    print(f"sweep artifacts: {csv_path}, {png_path}, {best_path}")
    print(
        f"best: lr={b['learning_rate']:g} wd={b['weight_decay']:g} "
        + (f"warmup={b['warmup_epochs']} " if "warmup_epochs" in b else "")
        + f"mean val_acc {b['mean_val_acc']:.4f} +/- {b['std_val_acc']:.4f}"
    )
    return report


if __name__ == "__main__":
    main()
