"""Round-4 performance levers, measured at the production geometry.

VERDICT r3 items 3 and 4 — the last unmeasured formulations/knobs:

1. ``dense`` de-grouped tails (``ISD_CONV4_TAILS=dense``): block-diagonal
   dense conv — Z x the FLOPs to buy full 128-lane MXU occupancy and a
   (Z*I*K)-deep contraction (the occupancy attack on the 7.1% MFU
   ceiling analyzed in docs/PERFORMANCE.md). Also re-checked with the
   first conv as a native conv (``ISD_CONV4_FIRST=conv``).
2. ``make_fit(val_every=k)``: skip the per-epoch validation pass
   (~20% of step time at this geometry) on k-1 of every k epochs.
3. Segment-carry donation (``donate_argnums`` on the segmented
   executor's jit, new this round): A/B via ``ISD_NO_DONATE=1``.

Usage (TPU host)::

    python experiments/r4_levers.py                 # all variants
    python experiments/r4_levers.py --only dense    # substring filter

Prints one JSON line per variant. Whole-run variants use the same
75-model / 4-epoch / bf16 / remat / 256-window-chunk timed fit as
bench.py; segmented variants run 2-epoch segments to steady state.
Each variant runs in a fresh jit (env knobs are read at trace time).
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
MODELS, EPOCHS, BATCH = 75, 4, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_stack(cfg, model):
    from imagined_speech_decoding_tpu.train.cv import build_cv_index_stack, stacked_init

    tr, va, _ = build_cv_index_stack(N_SUBJECTS, N_TRIALS, N_FOLDS, seed=42)
    tidx, vidx = jnp.asarray(tr), jnp.asarray(va)
    params0, state0 = stacked_init(model, jax.random.PRNGKey(0), MODELS)
    keys = jax.random.split(jax.random.PRNGKey(1), MODELS)
    return keys, params0, state0, tidx, vidx, tr.shape[1], va.shape[1]


def timed_whole_run(model, cfg, stack, x, y, *, val_every=1, epochs=EPOCHS):
    from imagined_speech_decoding_tpu.train.engine import fit_many, make_fit

    keys, params0, state0, tidx, vidx, n_train, n_val = stack
    fit = make_fit(
        model.apply, cfg.n_classes, epochs=epochs, batch_size=BATCH,
        n_train=n_train, n_val=n_val, learning_rate=5e-4,
        warmup_epochs=min(10, epochs), data_dtype=jnp.bfloat16,
        val_every=val_every,
    )
    run = jax.jit(lambda *a: fit_many(fit, *a))
    t0 = time.perf_counter()
    warm = run(keys, params0, state0, tidx, vidx, x, y)
    float(jnp.sum(warm.best_val_acc))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run(keys, params0, state0, tidx, vidx, x, y)
    float(jnp.sum(res.best_val_acc))
    dt = time.perf_counter() - t0
    n_vals = epochs // val_every
    w_incl = MODELS * cfg.n_tokens * (epochs * n_train + n_vals * n_val)
    w_train = MODELS * cfg.n_tokens * epochs * n_train
    return {
        "fit_s": round(dt, 3),
        "compile_s": round(compile_s, 2),
        "windows_per_s_incl_val": round(w_incl / dt, 1),
        "trainpass_windows_per_s": round(w_train / dt, 1),
    }


def timed_segmented(model, cfg, stack, x, y, *, seg_ep=2, total_ep=8):
    """Steady-state segmented executor (exercises the carry donation):
    one warmup pass (compile), then a timed full segmented run."""
    from imagined_speech_decoding_tpu.train.engine import fit_many_segmented, make_fit

    keys, params0, state0, tidx, vidx, n_train, n_val = stack
    fit = make_fit(
        model.apply, cfg.n_classes, epochs=seg_ep, batch_size=BATCH,
        n_train=n_train, n_val=n_val, learning_rate=5e-4,
        warmup_epochs=min(10, total_ep), data_dtype=jnp.bfloat16,
        total_epochs=total_ep,
    )
    run = lambda: fit_many_segmented(
        fit, keys, params0, state0, tidx, vidx, x, y, total_epochs=total_ep
    )
    t0 = time.perf_counter()
    float(jnp.sum(run().best_val_acc))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run()
    float(jnp.sum(res.best_val_acc))
    dt = time.perf_counter() - t0
    w_incl = MODELS * cfg.n_tokens * total_ep * (n_train + n_val)
    return {
        "fit_s": round(dt, 3),
        "compile_s": round(compile_s, 2),
        "segments": -(-total_ep // seg_ep),
        "windows_per_s_incl_val": round(w_incl / dt, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()

    from imagined_speech_decoding_tpu.config import FASTConfig
    from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials_device
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.profiling import sync_scalar

    log("device:", jax.devices()[0])
    cfg = FASTConfig.default()
    x, y = jax.jit(
        lambda k: synthetic_trials_device(
            k, N_SUBJECTS * N_TRIALS, cfg.n_channels, cfg.seq_len, cfg.n_classes
        )
    )(jax.random.PRNGKey(0))
    sync_scalar(x)
    log("corpus ready")

    def fresh_model():
        return make_fast_model(
            cfg, compute_dtype=jnp.bfloat16, remat=True, head_micro_batch=256
        )

    variants = [
        ("baseline_conv_tails", {}, lambda m, s: timed_whole_run(m, cfg, s, x, y)),
        ("dense_tails", {"ISD_CONV4_TAILS": "dense"},
         lambda m, s: timed_whole_run(m, cfg, s, x, y)),
        ("dense_tails_convfirst",
         {"ISD_CONV4_TAILS": "dense", "ISD_CONV4_FIRST": "conv"},
         lambda m, s: timed_whole_run(m, cfg, s, x, y)),
        ("val_every_4", {},
         lambda m, s: timed_whole_run(m, cfg, s, x, y, val_every=4)),
        ("segmented_donated", {},
         lambda m, s: timed_segmented(m, cfg, s, x, y)),
        ("segmented_no_donate", {"ISD_NO_DONATE": "1"},
         lambda m, s: timed_segmented(m, cfg, s, x, y)),
    ]
    knob_keys = ["ISD_CONV4_TAILS", "ISD_CONV4_FIRST", "ISD_NO_DONATE"]
    for name, env, fn in variants:
        if args.only and args.only not in name:
            continue
        for k in knob_keys:
            os.environ.pop(k, None)
        os.environ.update(env)
        model = fresh_model()
        stack = build_stack(cfg, model)
        try:
            out = fn(model, stack)
        except Exception as e:  # noqa: BLE001 — OOM is a data point
            out = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps({"variant": name, **out}), flush=True)
    for k in knob_keys:
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
