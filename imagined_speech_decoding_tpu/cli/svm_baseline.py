"""CSP+SVM classical baseline CLI.

Parity with the reference's ``notebooks/svm_baseline.ipynb`` workflow as
a script: per subject, band-pass 4-40 Hz → CSP → StandardScaler-style
standardization → RBF-SVM; stratified K-fold CV accuracy on the
train+val pool, then a final fit on the full pool evaluated on the
official test set; per-subject metrics CSV + joblib model persistence.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def build_parser():
    p = argparse.ArgumentParser(description="CSP + SVM/LDA classical baseline")
    p.add_argument("--data_folder", type=str, default="BCIC2020Track3")
    p.add_argument("--excel_path", type=str, default=None)
    p.add_argument("--classifier", choices=["svm", "lda"], default="svm")
    p.add_argument("--n_components", type=int, default=10)
    p.add_argument("--l_freq", type=float, default=4.0)
    p.add_argument("--h_freq", type=float, default=40.0)
    p.add_argument("--filter_method", choices=["fir", "iir"], default="fir")
    p.add_argument("--filterbank", action="store_true",
                   help="use a 4-band filterbank CSP instead of one band")
    p.add_argument("--n_folds", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_dir", type=str, default="results/svm_baseline")
    p.add_argument("--synthetic", type=int, default=0, metavar="N_SUBJECTS")
    p.add_argument("--synthetic_trials", type=int, default=60)
    p.add_argument(
        "--no-strict", action="store_true",
        help="disable strict schema validation of raw dataset files "
        "(strict is the default: a present-but-deviating .mat/.xlsx "
        "fails loudly with the expected schema)",
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    from sklearn.model_selection import StratifiedKFold

    from imagined_speech_decoding_tpu.data import (
        SUBJECTS,
        load_subject_train_val,
        load_test_set_per_subject,
        resolve_data_folder,
        resolve_excel_path,
        synthetic_corpus,
    )
    from imagined_speech_decoding_tpu.models.classical import CSPClassifierPipeline

    if args.synthetic:
        subjects = [f"{i + 1:02d}" for i in range(args.synthetic)]
        X, Y = synthetic_corpus(2, args.synthetic, args.synthetic_trials, 64, 800)
        data = {sid: (X[i], Y[i]) for i, sid in enumerate(subjects)}
        test = {sid: (X[i][:15], Y[i][:15]) for i, sid in enumerate(subjects)}
    else:
        base = resolve_data_folder(args.data_folder)
        excel = resolve_excel_path(base, args.excel_path)
        test = load_test_set_per_subject(base, excel, strict=not getattr(args, "no_strict", False))
        data = {sid: load_subject_train_val(base, sid, strict=not getattr(args, "no_strict", False)) for sid in SUBJECTS}
        subjects = list(SUBJECTS)

    os.makedirs(args.output_dir, exist_ok=True)
    bands = [(4, 8), (8, 13), (13, 30), (30, 40)] if args.filterbank else None

    def make_pipe():
        return CSPClassifierPipeline(
            n_classes=5, l_freq=args.l_freq, h_freq=args.h_freq,
            filter_method=args.filter_method, bands=bands,
            n_components=args.n_components, classifier=args.classifier,
        )

    rows = []
    for sid in subjects:
        x, y = data[sid]
        skf = StratifiedKFold(n_splits=args.n_folds, shuffle=True, random_state=args.seed)
        cv_accs = []
        for tr, va in skf.split(x, y):
            pipe = make_pipe().fit(x[tr], y[tr])
            cv_accs.append(pipe.score(x[va], y[va]))

        pipe = make_pipe().fit(x, y)
        pipe.save(os.path.join(args.output_dir, f"sub-{sid}_pipeline.joblib"))
        test_acc = np.nan
        if sid in test:
            xt, yt = test[sid]
            y_pred = pipe.predict(xt)
            test_acc = float(np.mean(y_pred == np.asarray(yt)))
            # reference-layout predictions so cli/benchmark.py can
            # aggregate the classical baseline alongside the deep models
            from ..train.artifacts import save_predictions_csv

            save_predictions_csv(
                os.path.join(args.output_dir, f"sub-{sid}", "test_predictions.csv"),
                y_pred, np.asarray(yt).astype(int),
            )
        rows.append([sid, float(np.mean(cv_accs)), float(np.std(cv_accs)), test_acc])
        print(f"Subject {sid}: CV acc {np.mean(cv_accs):.4f} ± {np.std(cv_accs):.4f}"
              + (f" | test {test_acc:.4f}" if test_acc == test_acc else ""))

    df = pd.DataFrame(rows, columns=["Subject", "CV_Acc_Mean", "CV_Acc_Std", "Test_Acc"])
    df.to_csv(os.path.join(args.output_dir, "svm_baseline_summary.csv"), index=False)
    print(f"\nmean CV acc {df['CV_Acc_Mean'].mean():.4f} ± {df['CV_Acc_Mean'].std():.4f}; "
          f"mean test acc {df['Test_Acc'].mean():.4f}")
    return df


if __name__ == "__main__":
    main()
