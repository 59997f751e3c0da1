"""Result artifacts: history CSVs, learning-curve plots, summaries.

Reproduces the reference result tree (``README.md:99-111``,
``scripts/train_fast.py:146-258``)::

    results/<run>/
      sub-XX/fold-k_history.csv     per-epoch loss/acc (train + val)
      sub-XX/fold-k_curves.png      loss + accuracy learning curves
      sub-XX/fold_metrics.csv       best val_acc per fold
      sub-XX/test_predictions.csv   Predicted,True rows on official test
      sub-XX/best_subject.npz       best-fold model weights
      summary_per_subject.csv       Subject, Best_Val_Acc, Test_Acc, Test_F1
      global_test_predictions.csv   all subjects' test predictions
      global_subject_accuracy.png   per-subject accuracy bar chart
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def save_history_csv(path: str, history: Dict[str, np.ndarray]) -> str:
    """Per-epoch history → CSV with an ``Epoch`` index column."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cols = {k: np.asarray(v) for k, v in history.items()}
    n = min(len(v) for v in cols.values())
    pd.DataFrame({k: v[:n] for k, v in cols.items()}).to_csv(path, index_label="Epoch")
    return path


def plot_learning_curves(path: str, history: Dict[str, np.ndarray], title: str = "") -> str:
    """Loss + accuracy side-by-side curves (reference
    ``scripts/train_fast.py:152-178``).

    Built with the object-oriented API (no pyplot global state) so
    calls are thread-safe — the CV driver renders the 75 per-fold
    figures of a full campaign concurrently (33 s serial on the
    measured host; rendering dominates the artifact phase otherwise).
    """
    from matplotlib.figure import Figure

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h = {k: np.asarray(v) for k, v in history.items()}
    fig = Figure(figsize=(10, 4))

    ax = fig.add_subplot(1, 2, 1)
    if "loss" in h:
        ax.plot(h["loss"], label="Train Loss", color="blue")
    if "val_loss" in h:
        ax.plot(h["val_loss"], label="Val Loss", color="orange", linestyle="--")
    ax.set_title(f"{title} Loss".strip())
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    ax.legend()
    ax.grid(True, alpha=0.3)

    ax = fig.add_subplot(1, 2, 2)
    if "acc" in h:
        ax.plot(h["acc"], label="Train Acc", color="green")
    if "val_acc" in h:
        ax.plot(h["val_acc"], label="Val Acc", color="red", linestyle="--")
    ax.set_title(f"{title} Accuracy".strip())
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Accuracy")
    ax.legend()
    ax.grid(True, alpha=0.3)

    fig.tight_layout()
    fig.savefig(path)
    return path


def plot_averaged_fold_curves(
    path: str, histories: Dict[str, np.ndarray], title: str = ""
) -> str:
    """Cross-fold averaged learning curves with a +/-1 std band
    (reference LOFO trainer, ``deprecated/BCIC2020Track3_train.py:
    350-386``). ``histories`` values are ``(n_folds, n_epochs)``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h = {k: np.asarray(v) for k, v in histories.items()}
    plt.figure(figsize=(10, 4))
    for i, (key, label) in enumerate(
        [(("loss", "val_loss"), "Loss"), (("acc", "val_acc"), "Accuracy")]
    ):
        plt.subplot(1, 2, i + 1)
        for name, color in zip(key, ("blue", "orange")):
            if name not in h:
                continue
            mean, std = h[name].mean(axis=0), h[name].std(axis=0)
            xs = np.arange(mean.shape[-1])
            plt.plot(xs, mean, label=f"{name} (mean)", color=color)
            plt.fill_between(xs, mean - std, mean + std, alpha=0.2, color=color)
        plt.title(f"{title} {label} (fold avg)".strip())
        plt.xlabel("Epoch")
        plt.legend()
        plt.grid(True, alpha=0.3)
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
    return path


def save_predictions_csv(path: str, y_pred: np.ndarray, y_true: np.ndarray) -> str:
    """``Predicted,True`` integer rows (reference ``np.savetxt`` format)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savetxt(
        path,
        np.array([y_pred, y_true]).T,
        delimiter=",",
        fmt="%d",
        header="Predicted,True",
    )
    return path


def load_predictions_csv(path: str):
    arr = np.loadtxt(path, delimiter=",", skiprows=1, dtype=int)
    arr = np.atleast_2d(arr)
    return arr[:, 0], arr[:, 1]


def plot_subject_accuracy_bar(
    path: str,
    subjects: Sequence[str],
    accuracies: Sequence[float],
    title: str = "Test Accuracy per Subject (Finetune CV)",
) -> str:
    """Per-subject bar chart with a mean line (reference
    ``scripts/train_fast.py:242-258``)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    accs = np.asarray(accuracies, dtype=float)
    plt.figure(figsize=(12, 6))
    bars = plt.bar(list(subjects), accs, color="skyblue", edgecolor="black")
    mean_acc = float(np.nanmean(accs)) if len(accs) else 0.0
    plt.axhline(y=mean_acc, color="red", linestyle="--", linewidth=2, label=f"Mean: {mean_acc:.4f}")
    for bar in bars:
        height = bar.get_height()
        plt.text(bar.get_x() + bar.get_width() / 2, height, f"{height:.2f}",
                 ha="center", va="bottom", fontsize=9)
    plt.title(title, fontsize=14)
    plt.xlabel("Subject ID", fontsize=12)
    plt.ylabel("Accuracy", fontsize=12)
    top = max(float(np.nanmax(accs)) if len(accs) else 0.0, mean_acc)
    plt.ylim(0, max(top * 1.15, 0.01))
    plt.legend()
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
    return path
