"""TSception baseline CLI: per-subject LOFO 5-fold benchmark.

Parity with ``scripts/train_tsception.py:262-508``: per subject, KFold
(5, unshuffled) over the pooled trials; each fold holds an internal 15%
stratified validation split; fixed-epoch training (no early stopping);
best-fold model is re-evaluated on the official test set; per-fold
histories/curves and metric CSVs are written.

TPU re-design: the 5 folds of every subject train simultaneously
(stacked model axis), exactly like the FAST CV engine.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="TSception LOFO benchmark (TPU-native)")
    p.add_argument("--cache", type=str, default=None, help="per-subject HDF5 cache")
    p.add_argument("--test_cache", type=str, default=None, help="official-test HDF5 cache")
    p.add_argument("--data_folder", type=str, default="BCIC2020Track3")
    p.add_argument("--excel_path", type=str, default=None)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--subjects", type=str, default=None, help="e.g. 0-15 or 0,3,7")
    p.add_argument("--output_dir", type=str, default="results/Results_TSception_LOFO")
    p.add_argument("--synthetic", type=int, default=0, metavar="N_SUBJECTS")
    p.add_argument("--synthetic_trials", type=int, default=60)
    p.add_argument(
        "--augment", action="store_true",
        help="train-time noise + channel dropout inside the jitted train "
        "step (ops.augment under the engine's PRNG; eval untouched)",
    )
    p.add_argument("--noise_sigma", type=float, default=0.1)
    p.add_argument("--ch_drop", type=float, default=0.1)
    p.add_argument(
        "--subject_group", type=int, default=1,
        help="subjects trained per stacked group (TSception's activations "
        "are ~25x FAST's, so the full subject stack does not fit one "
        "chip's HBM; each group of subject_group*n_folds models trains "
        "at once — 1 fits the measured 15.75 GB chip at the real "
        "geometry; raise it on HBM-richer hardware)",
    )
    p.add_argument(
        "--no-strict", action="store_true",
        help="disable strict schema validation of raw dataset files "
        "(strict is the default: a present-but-deviating .mat/.xlsx "
        "fails loudly with the expected schema)",
    )
    return p


def _parse_subjects(spec: Optional[str], n: int):
    if not spec:
        return list(range(n))
    if "-" in spec:
        a, b = map(int, spec.split("-"))
        return list(range(a, min(b, n)))
    return [int(s) for s in spec.split(",")]


def load_data(args):
    from imagined_speech_decoding_tpu.data import (
        SUBJECTS,
        load_standardized_h5,
        load_subject_train_val,
        load_test_set_per_subject,
        resolve_data_folder,
        resolve_excel_path,
        synthetic_corpus,
    )

    if args.synthetic:
        s = args.synthetic
        subjects = [f"{i + 1:02d}" for i in range(s)]
        X, Y = synthetic_corpus(1, s, args.synthetic_trials, 64, 800)
        test = {sid: (X[i, :20], Y[i, :20]) for i, sid in enumerate(subjects)}
        return X, Y, subjects, test

    if args.cache:
        X, Y = load_standardized_h5(args.cache)
        subjects = list(SUBJECTS)[: X.shape[0]]
    else:
        base = resolve_data_folder(args.data_folder)
        xs, ys = [], []
        for sid in SUBJECTS:
            x, y = load_subject_train_val(base, sid, strict=not getattr(args, "no_strict", False))
            xs.append(x)
            ys.append(y)
        X, Y = np.stack(xs), np.stack(ys)
        subjects = list(SUBJECTS)

    if args.test_cache:
        XT, YT = load_standardized_h5(args.test_cache)
        test = {sid: (XT[i], YT[i]) for i, sid in enumerate(subjects)}
    elif not args.cache:
        base = resolve_data_folder(args.data_folder)
        excel = resolve_excel_path(base, args.excel_path)
        test = load_test_set_per_subject(base, excel, strict=not getattr(args, "no_strict", False))
    else:
        test = {}
    return X, Y, subjects, test


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    from imagined_speech_decoding_tpu.config import TrainConfig
    from imagined_speech_decoding_tpu.models.tsception import make_tsception_model
    from imagined_speech_decoding_tpu.train.cv import train_per_subject_cv
    from imagined_speech_decoding_tpu.utils import seed_all

    seed_all(args.seed)
    X, Y, subjects, test = load_data(args)
    sel = _parse_subjects(args.subjects, len(subjects))
    X, Y = X[sel], Y[sel]
    subjects = [subjects[i] for i in sel]
    test = {sid: test[sid] for sid in subjects if sid in test}

    n_ch, n_t = X.shape[2], X.shape[3]
    model = make_tsception_model(n_ch, n_t, n_classes=5, remat=True)
    if args.augment:
        from imagined_speech_decoding_tpu.models.api import make_augmented_model

        model = make_augmented_model(model, args.noise_sigma, args.ch_drop)
        print(f"augment: noise_sigma={args.noise_sigma} ch_drop={args.ch_drop} "
              "(train step only)")
    tc = TrainConfig(
        max_epochs=args.epochs, batch_size=args.batch_size,
        learning_rate=args.lr, warmup_epochs=0, final_lr_scale=1.0,
        weight_decay=0.0,  # reference uses plain Adam (train_tsception.py:257)
        seed=args.seed, n_folds=5, precision="f32",
    )
    os.makedirs(args.output_dir, exist_ok=True)
    result = train_per_subject_cv(
        model, tc, X, Y, subjects, n_classes=5,
        test_per_subject=test, save_dir=args.output_dir,
        subject_group_size=args.subject_group,
    )
    print(result.summary.to_string(index=False))
    mean_acc = result.summary["Test_Acc"].mean()
    print(f"\n=== BENCHMARK COMPLETE ===\nTSception mean accuracy: {mean_acc:.4f}")
    return result


if __name__ == "__main__":
    main()
