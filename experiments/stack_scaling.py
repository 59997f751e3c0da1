"""Stack-size scaling with a bf16-resident corpus (VERDICT r2 item 5).

Round 2's scaling study (docs/PERFORMANCE.md "Stack-size / chunk-size
scaling study") measured throughput flat from 75 -> 90 models and OOM at
100 (15.87 / 15.75 GB, short by 128 MB) with the corpus resident in f32
(1.07 GB). Holding the corpus in bf16 frees ~0.5 GB — enough on paper
to fit the 100-model stack — so the "flat beyond 75" claim can be
closed with a measured point instead of an extrapolation from +20%.

Usage (on the TPU host):

    python experiments/stack_scaling.py --models 75 100 --corpus-dtype bf16
    python experiments/stack_scaling.py --models 75 --corpus-dtype f32  # r2 basis

Prints one JSON line per (models, dtype) point: windows/s, fit time, or
the OOM error string. Model compute is bf16 either way (the production
policy); only the RESIDENT corpus dtype changes — gathers then cast
per batch, losses/metrics accumulate in f32 as always.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from imagined_speech_decoding_tpu._hostid import enable_persistent_cache

enable_persistent_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SUBJECTS, N_TRIALS, N_FOLDS = 15, 350, 5
EPOCHS, BATCH = 4, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_point(n_models: int, x_flat, y_flat, cfg, model, segmented: bool = False):
    from imagined_speech_decoding_tpu.profiling import sync_scalar
    from imagined_speech_decoding_tpu.train.cv import build_cv_index_stack, stacked_init
    from imagined_speech_decoding_tpu.train.engine import (
        fit_many,
        fit_many_segmented,
        make_fit,
    )

    # n_models beyond S*K reuses fold rows cyclically (the memory/compute
    # shape is what matters here, not fold semantics)
    tr, va, _ = build_cv_index_stack(N_SUBJECTS, N_TRIALS, N_FOLDS, seed=42)
    rows = np.arange(n_models) % (N_SUBJECTS * N_FOLDS)
    tidx, vidx = jnp.asarray(tr[rows]), jnp.asarray(va[rows])
    n_train, n_val = tr.shape[1], va.shape[1]

    params0, state0 = stacked_init(model, jax.random.PRNGKey(0), n_models)
    keys = jax.random.split(jax.random.PRNGKey(1), n_models)
    fit = make_fit(
        model.apply, cfg.n_classes, epochs=EPOCHS, batch_size=BATCH,
        n_train=n_train, n_val=n_val, learning_rate=5e-4,
        warmup_epochs=min(10, EPOCHS), data_dtype=jnp.bfloat16,
    )
    if segmented:
        # The donation lever lives in the segmented executor's jit
        # (ISD_DONATE); 2-epoch segments, same total epochs.
        fit = make_fit(
            model.apply, cfg.n_classes, epochs=2, batch_size=BATCH,
            n_train=n_train, n_val=n_val, learning_rate=5e-4,
            warmup_epochs=min(10, EPOCHS), data_dtype=jnp.bfloat16,
            total_epochs=EPOCHS,
        )
        # NOTE: each fit_many_segmented call rebuilds its jit wrappers,
        # so the timed run pays a ~2 s re-trace the fit_many arm does
        # not — segmented windows/s is slightly understated; the arm's
        # purpose here is the MEMORY question (does donation fit?), and
        # its timing claims come from experiments/r4_levers.py which
        # times steady-state segments within one call.
        run = lambda *a: fit_many_segmented(fit, *a, total_epochs=EPOCHS)
    else:
        run = jax.jit(lambda *a: fit_many(fit, *a))
    t0 = time.perf_counter()
    warm = run(keys, params0, state0, tidx, vidx, x_flat, y_flat)
    float(jnp.sum(warm.best_val_acc))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run(keys, params0, state0, tidx, vidx, x_flat, y_flat)
    float(jnp.sum(res.best_val_acc))
    dt = time.perf_counter() - t0
    windows = n_models * EPOCHS * (n_train + n_val) * cfg.n_tokens
    return {
        "models": n_models,
        "segmented_donate": segmented,
        "corpus_dtype": str(jnp.dtype(x_flat.dtype).name),
        "fit_s": round(dt, 3),
        "windows_per_s": round(windows / max(dt, 1e-9), 1),
        "compile_s": round(compile_s, 2),
        "mean_best_val_acc": round(float(np.mean(np.asarray(res.best_val_acc))), 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", type=int, nargs="+", default=[75, 100])
    p.add_argument("--corpus-dtype", type=str, default="bf16", choices=["bf16", "f32"])
    p.add_argument(
        "--chunk", type=int, default=256,
        help="head_micro_batch window budget; 0 = unchunked (the r5 dense "
        "default — r4 freed the memory that forced chunking)",
    )
    p.add_argument(
        "--donate", action="store_true",
        help="ISD_DONATE=1 + segmented executor: donate the segment carry "
        "(the near-ceiling memory lever) instead of the whole-run fit",
    )
    args = p.parse_args()
    if args.donate:
        os.environ["ISD_DONATE"] = "1"

    from imagined_speech_decoding_tpu.config import FASTConfig
    from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials_device
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.profiling import sync_scalar

    log("device:", jax.devices()[0])
    cfg = FASTConfig.default()
    model = make_fast_model(
        cfg, compute_dtype=jnp.bfloat16, remat=True,
        head_micro_batch=args.chunk or None,
    )
    dt = jnp.bfloat16 if args.corpus_dtype == "bf16" else jnp.float32
    # Chunked generation (synthetic_trials_device_chunked docstring has
    # the service-variance rationale), converting INSIDE each chunk
    # program via dtype= so HBM never holds an f32 copy of the full
    # corpus (a stray f32 reference here is -1.07 GB of the headroom the
    # experiment exists to measure).
    from imagined_speech_decoding_tpu.data.synthetic import (
        synthetic_trials_device_chunked,
    )

    x_flat, y_flat = synthetic_trials_device_chunked(
        jax.random.PRNGKey(0), N_SUBJECTS * N_TRIALS, cfg.n_channels,
        cfg.seq_len, cfg.n_classes, n_chunks=6, dtype=dt,
    )

    for m in args.models:
        try:
            out = run_point(m, x_flat, y_flat, cfg, model, segmented=args.donate)
        except Exception as e:  # noqa: BLE001 — OOM is a data point here
            out = {
                "models": m,
                "corpus_dtype": args.corpus_dtype,
                "error": f"{type(e).__name__}: {str(e)[:12000]}",
            }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
