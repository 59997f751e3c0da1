"""Benchmark CLI: aggregate result trees into metric tables.

Parity with ``scripts/benchmark.py``: scans
``results/<model>/sub-*/test_predictions.csv`` (+ the global predictions
file), computes per-subject and global accuracy / macro-F1 / precision /
recall, writes ``<model>_Subject_Metrics.csv`` and ``Model_Summary.csv``,
and falls back to mean-of-subjects when the global file is missing
(``benchmark.py:84-89``). Adds the deprecated generation's statistical
significance test vs chance (``deprecated/model_benchmark.py:111-133``).
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd


def load_subject_predictions(results_dir: str, model: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """{subject: (pred, true)} from per-subject prediction CSVs."""
    from imagined_speech_decoding_tpu.train.artifacts import load_predictions_csv

    out = {}
    for sub_dir in sorted(glob.glob(os.path.join(results_dir, model, "sub-*"))):
        path = os.path.join(sub_dir, "test_predictions.csv")
        if os.path.exists(path):
            sid = os.path.basename(sub_dir).replace("sub-", "")
            out[sid] = load_predictions_csv(path)
    return out


def load_global_predictions(results_dir: str, model: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    from imagined_speech_decoding_tpu.train.artifacts import load_predictions_csv

    path = os.path.join(results_dir, model, "global_test_predictions.csv")
    return load_predictions_csv(path) if os.path.exists(path) else None


def _metrics(pred: np.ndarray, true: np.ndarray, n_classes: int) -> Dict[str, float]:
    import jax.numpy as jnp

    from imagined_speech_decoding_tpu.train.metrics import (
        confusion_matrix,
        f1_from_confusion,
        precision_recall_from_confusion,
    )

    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(true), n_classes)
    prec, rec = precision_recall_from_confusion(cm)
    return {
        "Accuracy": float(np.trace(np.asarray(cm)) / max(len(true), 1)),
        "F1": float(f1_from_confusion(cm)),
        "Precision": float(prec),
        "Recall": float(rec),
    }


def process_results(
    results_dir: str, model: str, n_classes: int = 5, chance: float = 0.2
) -> Tuple[pd.DataFrame, Dict[str, float]]:
    """Per-subject metric table + global summary dict for one model."""
    from imagined_speech_decoding_tpu.train.metrics import ttest_vs_chance

    per_subject = load_subject_predictions(results_dir, model)
    if not per_subject:
        raise FileNotFoundError(f"no predictions under {results_dir}/{model}/sub-*/")

    rows: List[Dict] = []
    for sid, (pred, true) in per_subject.items():
        rows.append({"Subject": sid, **_metrics(pred, true, n_classes)})
    df = pd.DataFrame(rows)

    glob_preds = load_global_predictions(results_dir, model)
    if glob_preds is not None:
        global_metrics = _metrics(glob_preds[0], glob_preds[1], n_classes)
    else:  # fall back to mean of subjects
        global_metrics = {
            k: float(df[k].mean()) for k in ("Accuracy", "F1", "Precision", "Recall")
        }

    accs = df["Accuracy"].to_numpy()
    t_stat, p_val = ttest_vs_chance(accs, chance) if len(accs) > 1 else (np.nan, np.nan)

    summary = {
        "Model": model,
        "Acc_Mean": float(accs.mean()),
        "Acc_Std": float(accs.std()),
        "F1_Mean": float(df["F1"].mean()),
        "F1_Std": float(df["F1"].std()),
        "Global_Acc": global_metrics["Accuracy"],
        "Global_F1": global_metrics["F1"],
        "Global_Precision": global_metrics["Precision"],
        "Global_Recall": global_metrics["Recall"],
        "TTest_vs_Chance": float(t_stat),
        "P_Value_OneSided": float(p_val),
    }
    return df, summary


def main(argv=None):
    p = argparse.ArgumentParser(description="Aggregate benchmark metrics")
    p.add_argument("--results_dir", type=str, default="results/finetune_official")
    p.add_argument("--models", type=str, nargs="*", default=None,
                   help="model subdirs to process (default: all)")
    p.add_argument("--n_classes", type=int, default=5)
    p.add_argument("--chance", type=float, default=0.2)
    args = p.parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()  # the t-test/metric math below runs jitted jnp code

    models = args.models or [
        os.path.basename(d)
        for d in sorted(glob.glob(os.path.join(args.results_dir, "*")))
        if os.path.isdir(d)
    ]
    summaries = []
    for model in models:
        try:
            df, summary = process_results(args.results_dir, model, args.n_classes, args.chance)
        except FileNotFoundError as e:
            print(f"[skip] {model}: {e}")
            continue
        out = os.path.join(args.results_dir, f"{model}_Subject_Metrics.csv")
        df.to_csv(out, index=False)
        print(f"{model}: mean acc {summary['Acc_Mean']:.4f} ± {summary['Acc_Std']:.4f} "
              f"(global {summary['Global_Acc']:.4f}, p={summary['P_Value_OneSided']:.2e})")
        summaries.append(summary)

    if summaries:
        pd.DataFrame(summaries).to_csv(
            os.path.join(args.results_dir, "Model_Summary.csv"), index=False
        )
        print(f"summary written: {args.results_dir}/Model_Summary.csv")
    return summaries


if __name__ == "__main__":
    main()
