"""Zero-shot cross-subject evaluation: the S_i -> S_j transfer matrix.

Reproduces the reference notebook's cross-subject generalization study
(``notebooks/imagined-speech-fast-itay.ipynb`` cells 30/43: FAST
S01->S02 ≈ 0.28, TSception S01->S02 = 0.24 — see BASELINE.md) as a
first-class capability: every per-subject model is evaluated on every
subject's test set in ONE jitted vmapped pass, and the full matrix is
written as CSV + heatmap.

Model sources: per-subject ``best_subject.npz`` checkpoints from
``cli.train_fast`` (``--results_dir``), or ``--synthetic N`` to train
quick models in-process (no dataset needed).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Zero-shot cross-subject transfer matrix")
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument(
        "--results_dir", type=str, default="results/finetune_official/FAST",
        help="dir with sub-*/best_subject.npz checkpoints",
    )
    p.add_argument("--data_folder", type=str, default="BCIC2020Track3")
    p.add_argument("--excel_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, default=None,
                   help="defaults to <results_dir>/zero_shot")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--synthetic", type=int, default=0, metavar="N_SUBJECTS")
    p.add_argument("--synthetic_trials", type=int, default=48)
    p.add_argument("--synthetic_epochs", type=int, default=6)
    p.add_argument(
        "--no-strict", action="store_true",
        help="disable strict schema validation of raw dataset files "
        "(strict is the default: a present-but-deviating .mat/.xlsx "
        "fails loudly with the expected schema)",
    )
    return p


def transfer_matrix(model, params_stack, state_stack, tests, batch_size=64):
    """``(S_models)`` stacked params x ``tests`` [(x, y) per subject] →
    accuracy matrix (S_models, S_subjects). One vmapped jitted forward
    per (target subject, batch chunk); the data axis broadcasts across
    models and ``batch_size`` bounds per-call activation memory."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def all_models_correct(params, state, x, y):
        def one(p, s):
            logits, _ = model.apply(p, s, x, train=False, rng=None)
            return jnp.sum((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))

        return jax.vmap(one)(params, state)  # (S,) correct counts

    accs = []
    for x_t, y_t in tests:
        x_t = np.asarray(x_t)
        y_t = np.asarray(y_t).astype(np.int32)
        n = x_t.shape[0]
        correct = 0.0
        for lo in range(0, n, batch_size):
            xb = jnp.asarray(x_t[lo : lo + batch_size])
            yb = jnp.asarray(y_t[lo : lo + batch_size])
            correct = correct + np.asarray(
                all_models_correct(params_stack, state_stack, xb, yb)
            )
        accs.append(correct / max(n, 1))
    return np.asarray(accs).T  # (S_models, S_targets)


def save_artifacts(out_dir, matrix, subjects):
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    df = pd.DataFrame(
        matrix,
        index=[f"model_S{s}" for s in subjects],
        columns=[f"test_S{s}" for s in subjects],
    )
    csv_path = os.path.join(out_dir, "zero_shot_matrix.csv")
    df.to_csv(csv_path)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 7))
    im = ax.imshow(matrix, vmin=0.0, vmax=1.0, cmap="viridis")
    ax.set_xticks(range(len(subjects)), [f"S{s}" for s in subjects], rotation=90)
    ax.set_yticks(range(len(subjects)), [f"S{s}" for s in subjects])
    ax.set_xlabel("test subject")
    ax.set_ylabel("trained-on subject")
    ax.set_title("Zero-shot cross-subject accuracy")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    png_path = os.path.join(out_dir, "zero_shot_matrix.png")
    fig.savefig(png_path, dpi=120)
    plt.close(fig)
    return csv_path, png_path


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    import jax

    from ..config import load_config
    from ..models.api import make_fast_model
    from ..train.checkpoint import load_model_npz
    from ..train.cv import stacked_init

    cfg = load_config(args.config if os.path.exists(args.config) else None, {})

    if args.synthetic:
        from ..data.synthetic import synthetic_corpus
        from ..train.engine import fit_many, make_fit

        s = args.synthetic
        subjects = [f"{i + 1:02d}" for i in range(s)]
        from ..config import FASTConfig

        mcfg = FASTConfig(
            electrodes=cfg.model.electrodes[:16],
            zone_dict=_subset_zones(cfg.model.zone_dict, cfg.model.electrodes[:16]),
            dim_cnn=8, dim_token=16, seq_len=400, window_len=250, slide_step=150,
            head="Conv4Layers", n_classes=cfg.model.n_classes,
            num_layers=2, num_heads=4, dropout=0.1,
        )
        model = make_fast_model(mcfg)
        nt = args.synthetic_trials
        X, Y = synthetic_corpus(0, s, nt, mcfg.n_channels, mcfg.seq_len)
        import jax.numpy as jnp

        n_train = nt * 3 // 4
        x_flat = jnp.asarray(X.reshape(-1, *X.shape[2:]))
        y_flat = jnp.asarray(Y.reshape(-1).astype(np.int32))
        tidx = jnp.asarray(
            np.stack([i * nt + np.arange(n_train) for i in range(s)])
        )
        vidx = jnp.asarray(
            np.stack([i * nt + np.arange(n_train, nt) for i in range(s)])
        )
        params0, state0 = stacked_init(model, jax.random.PRNGKey(0), s)
        fit = make_fit(
            model.apply, mcfg.n_classes, epochs=args.synthetic_epochs, batch_size=16,
            n_train=n_train, n_val=nt - n_train, warmup_epochs=1,
        )
        keys = jax.random.split(jax.random.PRNGKey(1), s)
        res = jax.jit(lambda *a: fit_many(fit, *a))(
            keys, params0, state0, tidx, vidx, x_flat, y_flat
        )
        params_stack, state_stack = res.best_params, res.best_model_state
        tests = [(X[i, n_train:], Y[i, n_train:]) for i in range(s)]
        out_dir = args.output_dir or "results/zero_shot_synthetic"
    else:
        from ..data import (
            SUBJECTS,
            load_test_set_per_subject,
            resolve_data_folder,
            resolve_excel_path,
        )

        model = make_fast_model(cfg.model)
        base = resolve_data_folder(args.data_folder)
        excel = resolve_excel_path(base, args.excel_path)
        per_subject = load_test_set_per_subject(base, excel, strict=not getattr(args, "no_strict", False))
        subjects = [s for s in SUBJECTS if s in per_subject]
        template_p, template_s = model.init(jax.random.PRNGKey(0))
        ps, ss = [], []
        for sid in subjects:
            path = os.path.join(args.results_dir, f"sub-{sid}", "best_subject.npz")
            p, s, had_state = load_model_npz(path, template_p, template_s)
            if not had_state and jax.tree.leaves(template_s):
                print(
                    f"WARNING: {path} is a legacy params-only checkpoint but the "
                    f"{cfg.model.head} head is stateful — evaluating with INIT "
                    "batch-norm statistics (retrain to persist state)."
                )
            ps.append(p)
            ss.append(s)
        params_stack = jax.tree.map(lambda *x: jax.numpy.stack(x), *ps)
        state_stack = (
            jax.tree.map(lambda *x: jax.numpy.stack(x), *ss)
            if jax.tree.leaves(template_s) else template_s
        )
        tests = [per_subject[sid] for sid in subjects]
        out_dir = args.output_dir or os.path.join(args.results_dir, "zero_shot")

    matrix = transfer_matrix(
        model, params_stack, state_stack, tests, args.batch_size
    )
    csv_path, png_path = save_artifacts(out_dir, matrix, subjects)

    diag = np.diag(matrix)
    off = matrix[~np.eye(len(subjects), dtype=bool)]
    print(f"Zero-shot matrix saved: {csv_path}, {png_path}")
    print(f"within-subject (diag) mean acc: {diag.mean():.4f}")
    print(f"cross-subject (off-diag) mean acc: {off.mean():.4f}")
    return matrix


def _subset_zones(zone_dict, electrodes):
    """Restrict a zone atlas to a subset montage (synthetic demo)."""
    es = set(electrodes)
    out = {}
    for z, chs in zone_dict.items():
        kept = tuple(c for c in chs if c in es)
        if kept:
            out[z] = kept
    return out


if __name__ == "__main__":
    main()
