"""Measure train-throughput / HBM footprint of Conv4Layers tail
formulations at the bench geometry (75-model stacked CV engine).

Usage:
    python experiments/tails_sweep.py --tails conv --chunk 256
    python experiments/tails_sweep.py --tails conv2 --chunk 256 --analyze-only

Prints one JSON line per run. Used to decide the production default
(see docs/PERFORMANCE.md "The head: what was tried, what won").
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tails", default=None, help="ISD_CONV4_TAILS value (unset = default)")
    ap.add_argument("--first", default=None, help="ISD_CONV4_FIRST value")
    ap.add_argument(
        "--eval-tails", default=None,
        help="ISD_CONV4_TAILS_EVAL value (inference/validation formulation only)",
    )
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--models", type=int, default=75)
    ap.add_argument("--remat-save", default=None, help="ISD_REMAT_SAVE value")
    ap.add_argument("--no-remat", action="store_true", help="disable head remat entirely")
    ap.add_argument("--analyze-only", action="store_true", help="AOT memory analysis, no run")
    ap.add_argument("--profile", default=None, help="write a jax.profiler trace to this dir")
    args = ap.parse_args()

    if args.tails is not None:
        os.environ["ISD_CONV4_TAILS"] = args.tails
    if args.first is not None:
        os.environ["ISD_CONV4_FIRST"] = args.first
    if args.eval_tails is not None:
        os.environ["ISD_CONV4_TAILS_EVAL"] = args.eval_tails
    if args.remat_save is not None:
        os.environ["ISD_REMAT_SAVE"] = args.remat_save

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagined_speech_decoding_tpu._hostid import enable_persistent_cache
    from imagined_speech_decoding_tpu.config import FASTConfig
    from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials_device
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.train.cv import build_cv_index_stack, stacked_init
    from imagined_speech_decoding_tpu.train.engine import fit_many, make_fit

    enable_persistent_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    N_SUBJECTS, N_TRIALS, N_FOLDS, BATCH = 15, 350, 5, 64
    cfg = FASTConfig.default()
    dt = jnp.bfloat16
    model = make_fast_model(
        cfg, compute_dtype=dt, remat=not args.no_remat, head_micro_batch=args.chunk
    )

    x_flat, y_flat = jax.jit(
        lambda k: synthetic_trials_device(
            k, N_SUBJECTS * N_TRIALS, cfg.n_channels, cfg.seq_len, cfg.n_classes
        )
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(x_flat)

    m_count = args.models
    train_idx, val_idx, _ = build_cv_index_stack(N_SUBJECTS, N_TRIALS, N_FOLDS, seed=42)
    train_idx, val_idx = train_idx[:m_count], val_idx[:m_count]
    n_train, n_val = train_idx.shape[1], val_idx.shape[1]

    params0, state0 = stacked_init(model, jax.random.PRNGKey(0), m_count)
    keys = jax.random.split(jax.random.PRNGKey(1), m_count)
    tidx, vidx = jnp.asarray(train_idx), jnp.asarray(val_idx)

    fit = make_fit(
        model.apply, cfg.n_classes, epochs=args.epochs, batch_size=BATCH,
        n_train=n_train, n_val=n_val, learning_rate=5e-4,
        warmup_epochs=min(10, args.epochs), data_dtype=dt,
    )
    run = jax.jit(lambda *a: fit_many(fit, *a))
    fargs = (keys, params0, state0, tidx, vidx, x_flat, y_flat)

    out = {
        "tails": os.environ.get("ISD_CONV4_TAILS", "<default>"),
        "eval_tails": os.environ.get("ISD_CONV4_TAILS_EVAL", "<default>"),
        "first": os.environ.get("ISD_CONV4_FIRST", "<default>"),
        "remat_save": os.environ.get("ISD_REMAT_SAVE", ""),
        "remat": not args.no_remat,
        "chunk": args.chunk,
        "models": m_count,
        "epochs": args.epochs,
    }

    if args.analyze_only:
        t0 = time.perf_counter()
        compiled = run.lower(*fargs).compile()
        ma = compiled.memory_analysis()
        out["compile_s"] = round(time.perf_counter() - t0, 1)
        if ma is not None:
            for k in (
                "temp_size_in_bytes", "argument_size_in_bytes",
                "output_size_in_bytes", "generated_code_size_in_bytes",
            ):
                v = getattr(ma, k, None)
                if v is not None:
                    out[k.replace("_in_bytes", "_gb")] = round(v / 2**30, 2)
        print(json.dumps(out))
        return

    t0 = time.perf_counter()
    warm = run(*fargs)
    float(jnp.sum(warm.best_val_acc))
    out["compile_first_run_s"] = round(time.perf_counter() - t0, 1)

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        res = run(*fargs)
        float(jnp.sum(res.best_val_acc))
        times.append(time.perf_counter() - t0)
    t_train = min(times)

    if args.profile:
        with jax.profiler.trace(args.profile):
            res = run(*fargs)
            float(jnp.sum(res.best_val_acc))

    train_windows = m_count * args.epochs * (n_train + n_val) * cfg.n_tokens
    trainpass = m_count * args.epochs * n_train * cfg.n_tokens
    out["train_s"] = round(t_train, 3)
    out["windows_per_s"] = round(train_windows / t_train, 1)
    out["trainpass_windows_per_s"] = round(trainpass / t_train, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
