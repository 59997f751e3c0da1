"""Main training CLI: per-subject 5-fold CV finetune + official-test eval.

Command-line parity with the reference entry point
(``scripts/train_fast.py:268-312``): same flags, same YAML config
schema, same result-artifact tree. Differences:

  * all subject x fold models train simultaneously in one jitted program
    (see ``train.cv``) — there is no ``--gpu`` device pinning; use
    ``--synthetic`` to run the full pipeline without the private dataset;
  * ``--loso-pretrain`` enables the deprecated-generation cross-subject
    pretraining + warm-start (``deprecated/BCIC2020Track3_train.py:
    158-249``).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train FAST on BCI Competition 2020 Track #3 (TPU-native)"
    )
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--epochs", type=int, default=None, help="Max training epochs")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--n_folds", type=int, default=None)
    p.add_argument("--precision", type=str, default=None, choices=["bf16", "f32"])
    p.add_argument(
        "--val_every", type=int, default=None, metavar="K",
        help="run the validation pass every K-th epoch only (throughput "
             "mode; K>1 coarsens best-checkpoint granularity to K epochs; "
             "default 1 = reference per-epoch ModelCheckpoint parity)",
    )
    p.add_argument("--head", type=str, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument(
        "--hyperparams", type=str, default=None, metavar="BEST_JSON",
        help="best.json from isd-sweep: applies its learning_rate/"
        "weight_decay (explicit --learning_rate/--weight_decay flags win)",
    )
    p.add_argument("--data_folder", type=str, default="BCIC2020Track3")
    p.add_argument("--excel_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="results/finetune_official/FAST")
    p.add_argument("--loso-pretrain", action="store_true", dest="loso_pretrain")
    p.add_argument("--loso-epochs", type=int, default=100)
    p.add_argument("--remat", action="store_true", help="recompute head activations in bwd")
    p.add_argument(
        "--head_chunk", type=int, default=None, metavar="N_WINDOWS",
        help="micro-batch the zone-CNN head over trial chunks of <= N "
             "windows (bench production config: 256 with --remat — fits "
             "the 75-model stack in one chip's HBM)",
    )
    p.add_argument(
        "--resume", action="store_true",
        help="resume from the segment checkpoint under --output_dir",
    )
    p.add_argument(
        "--profile", type=str, default=None, metavar="LOGDIR",
        help="capture a jax.profiler device trace of the CV fit into "
             "LOGDIR (TensorBoard-loadable op timeline + HBM usage)",
    )
    p.add_argument(
        "--checkpoint_every", type=int, default=1, metavar="K",
        help="write the resume checkpoint every K segments (writes "
             "overlap compute on a background thread; raise K on slow "
             "disks to trade crash-resume granularity for wall time)",
    )
    p.add_argument(
        "--mesh", type=str, default="none", choices=["none", "model", "data", "2d"],
        help="device-mesh strategy: shard the (subject x fold) model stack "
             "('model'), shard every batch with gradient all-reduce ('data'), "
             "or both over a 2-D mesh ('2d')",
    )
    p.add_argument(
        "--augment", action="store_true",
        help="train-time noise + channel dropout inside the jitted train "
        "step (ops.augment under the engine's PRNG; eval untouched)",
    )
    p.add_argument("--noise_sigma", type=float, default=0.1,
                   help="augmentation noise scale (x per-trial signal std)")
    p.add_argument("--ch_drop", type=float, default=0.1,
                   help="augmentation per-channel dropout probability")
    p.add_argument(
        "--ensemble", type=int, default=1, metavar="N_MEMBERS",
        help="train an N-member seed ensemble (identical folds, "
             "independent weight init/batch order) and soft-vote the "
             "test posteriors; the root artifact tree holds the "
             "ensemble decision, each member's tree lands in member-e/",
    )
    p.add_argument(
        "--synthetic", type=int, default=0, metavar="N_SUBJECTS",
        help="run on synthetic data with N subjects (no dataset needed)",
    )
    p.add_argument("--synthetic_trials", type=int, default=60)
    p.add_argument(
        "--label_noise", type=float, default=0.0,
        help="synthetic mode: fraction of labels re-drawn uniformly "
             "(deterministic; keeps campaign accuracy off the ceiling)",
    )
    p.add_argument(
        "--no-strict", action="store_true",
        help="disable strict schema validation of raw dataset files "
        "(strict is the default: a present-but-deviating .mat/.xlsx "
        "fails loudly with the expected schema)",
    )
    return p


def build_overrides(args) -> dict:
    """Flat config overrides from CLI flags, closing the sweep loop:
    ``--hyperparams best.json`` (the winner file ``isd-sweep`` writes)
    applies its learning_rate/weight_decay, with explicit
    ``--learning_rate``/``--weight_decay`` flags taking precedence."""
    sweep_hp = {}
    if args.hyperparams:
        import json

        with open(args.hyperparams) as f:
            best = json.load(f)
        sweep_hp = {
            k: best[k]
            for k in ("learning_rate", "weight_decay", "warmup_epochs")
            if k in best
        }
        print(f"hyperparams from {args.hyperparams}: {sweep_hp}")

    return {
        k: v
        for k, v in {
            "max_epochs": args.epochs,
            "batch_size": args.batch_size,
            "seed": args.seed,
            "n_folds": args.n_folds,
            "precision": args.precision,
            "val_every": args.val_every,
            "head": args.head,
            "learning_rate": (
                args.learning_rate
                if args.learning_rate is not None
                else sweep_hp.get("learning_rate")
            ),
            "weight_decay": (
                args.weight_decay
                if args.weight_decay is not None
                else sweep_hp.get("weight_decay")
            ),
            "warmup_epochs": sweep_hp.get("warmup_epochs"),
        }.items()
        if v is not None
    }


def load_data(args):
    from imagined_speech_decoding_tpu.data import (
        SUBJECTS,
        load_subject_train_val,
        load_test_set_per_subject,
        resolve_data_folder,
        resolve_excel_path,
        synthetic_corpus,
    )

    if args.synthetic:
        s = args.synthetic
        subjects = [f"{i + 1:02d}" for i in range(s)]
        X, Y = synthetic_corpus(0, s, args.synthetic_trials, 64, 800)
        # getattr: sibling CLIs (train_baselines, train_tsception) share
        # this load_data with parsers that don't define --label_noise.
        if getattr(args, "label_noise", 0.0):
            # Deterministic (seed-fixed, precision-independent) label
            # flips: keeps campaign accuracy off the 1.0 ceiling so
            # e.g. the f32-vs-bf16 dtype-delta measurement compares
            # mid-band accuracies, not saturated ones.
            rng = np.random.default_rng(12345)
            flip = rng.random(Y.shape) < args.label_noise
            Y = np.where(flip, rng.integers(0, 5, Y.shape), Y).astype(Y.dtype)
        test = {
            sid: (X[i, : args.synthetic_trials // 3], Y[i, : args.synthetic_trials // 3])
            for i, sid in enumerate(subjects)
        }
        return X, Y, subjects, test

    base = resolve_data_folder(args.data_folder)
    excel = resolve_excel_path(base, args.excel_path)
    test = load_test_set_per_subject(base, excel, strict=not getattr(args, "no_strict", False))
    xs, ys = [], []
    for sid in SUBJECTS:
        x, y = load_subject_train_val(base, sid, strict=not getattr(args, "no_strict", False))
        xs.append(x)
        ys.append(y)
    return np.stack(xs), np.stack(ys), list(SUBJECTS), test


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.ensemble > 1 and args.loso_pretrain:
        # A shared warm start would collapse the members' init diversity
        # (the whole point of the seed ensemble). Fail at parse time —
        # the LOSO pretrain alone can cost hours of device time.
        parser.error("--ensemble is incompatible with --loso-pretrain")
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    from imagined_speech_decoding_tpu.config import load_config
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.train.cv import train_per_subject_cv
    from imagined_speech_decoding_tpu.utils import seed_all

    overrides = build_overrides(args)
    cfg = load_config(args.config if os.path.exists(args.config) else None, overrides)
    seed_all(cfg.train.seed)
    os.makedirs(args.output_dir, exist_ok=True)

    X, Y, subjects, test = load_data(args)
    model = make_fast_model(
        cfg.model, compute_dtype=cfg.train.compute_dtype, remat=args.remat,
        head_micro_batch=args.head_chunk,
    )
    if args.augment:
        from imagined_speech_decoding_tpu.models.api import make_augmented_model

        model = make_augmented_model(model, args.noise_sigma, args.ch_drop)
        print(f"augment: noise_sigma={args.noise_sigma} ch_drop={args.ch_drop} "
              "(train step only)")

    warm = None
    if args.loso_pretrain:
        from imagined_speech_decoding_tpu.train.cv import stacked_init
        from imagined_speech_decoding_tpu.train.loso import (
            pretrain_loso,
            stack_pretrained_for_cv,
        )

        pretrained = pretrain_loso(
            model, X, Y, subjects, cfg.model.n_classes,
            save_dir=os.path.join(args.output_dir, "loso_pretrain"),
            epochs=args.loso_epochs, batch_size=cfg.train.batch_size,
            learning_rate=cfg.train.learning_rate, seed=cfg.train.seed,
            mesh_axis=None if args.mesh == "none" else args.mesh,
            checkpoint_dir=os.path.join(args.output_dir, "loso_pretrain", "checkpoints"),
            resume=args.resume,
        )
        params0 = stack_pretrained_for_cv(pretrained, cfg.train.n_folds)
        _, state0 = stacked_init(
            model, __import__("jax").random.PRNGKey(cfg.train.seed),
            len(subjects) * cfg.train.n_folds,
        )
        warm = (params0, state0)

    import contextlib

    from imagined_speech_decoding_tpu.profiling import trace

    prof = trace(args.profile) if args.profile else contextlib.nullcontext()
    with prof:
        if args.ensemble > 1:
            if warm is not None:
                # a shared warm start would collapse the members' init
                # diversity — the whole point of the seed ensemble
                raise SystemExit("--ensemble is incompatible with --loso-pretrain")
            from imagined_speech_decoding_tpu.train.ensemble import train_seed_ensemble

            result = train_seed_ensemble(
                model, cfg.train, X, Y, subjects, cfg.model.n_classes,
                test_per_subject=test, save_dir=args.output_dir,
                n_members=args.ensemble,
                checkpoint_dir=os.path.join(args.output_dir, "checkpoints"),
                resume=args.resume,
                mesh_axis=None if args.mesh == "none" else args.mesh,
                checkpoint_every=args.checkpoint_every,
            )
        else:
            result = train_per_subject_cv(
                model, cfg.train, X, Y, subjects, cfg.model.n_classes,
                test_per_subject=test, save_dir=args.output_dir, warm_start=warm,
                checkpoint_dir=os.path.join(args.output_dir, "checkpoints"),
                resume=args.resume,
                mesh_axis=None if args.mesh == "none" else args.mesh,
                checkpoint_every=args.checkpoint_every,
            )
    if args.profile:
        print(f"device trace written to {args.profile} (TensorBoard: "
              f"`tensorboard --logdir {args.profile}`)")

    print("\n" + "=" * 60)
    print("FINETUNE COMPLETE")
    print(f"Summary saved to {args.output_dir}/summary_per_subject.csv")
    print(result.summary.to_string(index=False))
    print("=" * 60)
    return result


if __name__ == "__main__":
    main()
