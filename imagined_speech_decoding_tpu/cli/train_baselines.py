"""Baseline-pipeline training CLI: BASELINE.json configs #1 / #3 / #4.

One driver for the three non-FAST, non-CSP baseline configurations —
feature extraction, per-subject K-fold CV on the stacked engine, best
fold selection, official-test evaluation, and the reference artifact
tree (layout template ``scripts/train_fast.py:229-258``):

  isd-train-baselines --pipeline bandpower_mlp   # config #1
  isd-train-baselines --pipeline stft_eegnet     # config #3
  isd-train-baselines --pipeline cnn_bilstm --augment   # config #4

``--augment`` wires ``ops.augment`` (per-trial Gaussian noise + channel
dropout) into the jitted train step via the engine's PRNG; it is only
meaningful for raw-EEG-input pipelines and rejected otherwise.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    from imagined_speech_decoding_tpu.pipelines import PIPELINES

    p = argparse.ArgumentParser(
        description="Train baseline pipelines on BCI Competition 2020 Track #3 "
        "(TPU-native)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument(
        "--pipeline", type=str, required=True, choices=sorted(PIPELINES),
        help="; ".join(f"{k}: {v.description}" for k, v in sorted(PIPELINES.items())),
    )
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--epochs", type=int, default=None, help="Max training epochs")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--n_folds", type=int, default=None)
    p.add_argument("--precision", type=str, default=None, choices=["bf16", "f32"])
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument(
        "--augment", action="store_true",
        help="train-time noise + channel dropout inside the jitted train "
        "step (raw-EEG pipelines only; eval paths untouched)",
    )
    p.add_argument("--noise_sigma", type=float, default=0.1,
                   help="augmentation noise scale (x per-trial signal std)")
    p.add_argument("--ch_drop", type=float, default=0.1,
                   help="augmentation per-channel dropout probability")
    p.add_argument("--data_folder", type=str, default="BCIC2020Track3")
    p.add_argument("--excel_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, default=None,
                   help="default: results/finetune_official/<Pipeline>")
    p.add_argument("--resume", action="store_true",
                   help="resume from the segment checkpoint under --output_dir")
    p.add_argument(
        "--mesh", type=str, default="none", choices=["none", "model", "data", "2d"],
        help="device-mesh strategy (see isd-train-fast --help)",
    )
    p.add_argument(
        "--subject_group", type=int, default=None,
        help="subjects trained per stacked group (memory lever for models "
        "whose activations don't fit the full subject x fold stack in "
        "HBM — e.g. cnn_bilstm's conv frontend at the real geometry; "
        "grouped runs draw the identical RNG streams as ungrouped)",
    )
    p.add_argument("--synthetic", type=int, default=0, metavar="N_SUBJECTS",
                   help="run on synthetic data with N subjects (no dataset needed)")
    p.add_argument("--synthetic_trials", type=int, default=60)
    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)

    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    from imagined_speech_decoding_tpu.config import load_config
    from imagined_speech_decoding_tpu.models.api import make_augmented_model
    from imagined_speech_decoding_tpu.pipelines import PIPELINES, featurize_corpus
    from imagined_speech_decoding_tpu.train.cv import train_per_subject_cv
    from imagined_speech_decoding_tpu.utils import seed_all

    pipe = PIPELINES[args.pipeline]
    if args.augment and not pipe.augmentable:
        parser.error(
            f"--augment needs a raw-EEG-input pipeline; {pipe.name} trains "
            "on precomputed features (noise/channel-dropout semantics don't "
            "transfer to feature space)"
        )

    overrides = {
        k: v
        for k, v in {
            "max_epochs": args.epochs,
            "batch_size": args.batch_size,
            "seed": args.seed,
            "n_folds": args.n_folds,
            "precision": args.precision,
            "learning_rate": args.learning_rate,
            "weight_decay": args.weight_decay,
        }.items()
        if v is not None
    }
    cfg = load_config(args.config if os.path.exists(args.config) else None, overrides)
    seed_all(cfg.train.seed)

    out_dir = args.output_dir or os.path.join(
        "results", "finetune_official", pipe.name
    )
    os.makedirs(out_dir, exist_ok=True)

    from imagined_speech_decoding_tpu.cli.train_fast import load_data

    X, Y, subjects, test = load_data(args)
    n_channels, n_samples = X.shape[-2], X.shape[-1]

    print(f"pipeline {pipe.name}: {pipe.description}")
    Xf, testf = featurize_corpus(pipe, X, test)
    if pipe.featurize is not None:
        print(f"  features: {X.shape[2:]} -> {Xf.shape[2:]}")

    model = pipe.make_model(
        n_channels, n_samples, cfg.model.n_classes, cfg.train.compute_dtype
    )
    if args.augment:
        model = make_augmented_model(model, args.noise_sigma, args.ch_drop)
        print(f"  augment: noise_sigma={args.noise_sigma} ch_drop={args.ch_drop} "
              "(train step only)")

    result = train_per_subject_cv(
        model, cfg.train, Xf, Y, subjects, cfg.model.n_classes,
        test_per_subject=testf, save_dir=out_dir,
        checkpoint_dir=os.path.join(out_dir, "checkpoints"),
        resume=args.resume,
        mesh_axis=None if args.mesh == "none" else args.mesh,
        subject_group_size=args.subject_group,
    )

    print("\n" + "=" * 60)
    print(f"BASELINE PIPELINE COMPLETE ({pipe.name})")
    print(f"Summary saved to {out_dir}/summary_per_subject.csv")
    print(result.summary.to_string(index=False))
    print("=" * 60)
    return result


if __name__ == "__main__":
    main()
