"""Round-5: the explicit-layout attack on the 21.2% relayout-copy share.

VERDICT r4 #2 — the one identified-but-unrecovered cost in the
production fit is XLA layout-assignment copies of the ~1.5 GB
window-stack activation (bounds 1.27x; docs/PERFORMANCE.md r4
re-profile). Every *indirect* attack (channels-last chains, remat-save
policies, donation, de-grouping) measured null. This harness attacks it
directly, two ways:

1. ``with_layout_constraint`` pins on the window-stack activation
   itself (``ISD_H2_LAYOUT`` hook in ``models/heads.py``): force the
   producer and consumer to agree on one layout so layout assignment
   has nothing to reconcile. Variants sweep the major-to-minor orders
   of the ``(B*N, Z, O, T1)`` tensor.
2. AUTO entry layouts on the whole fit: let XLA choose the *argument*
   layouts (params / corpus / index stacks) instead of JAX's default
   row-major, in case the entry-layout constraint is what forces the
   internal relayout trade.

Usage (TPU host)::

    python experiments/r5_layout.py                # all variants
    python experiments/r5_layout.py --only wlc     # substring filter

Prints one JSON line per variant (same timed 75-model / 4-epoch / bf16
whole-run fit as bench.py — directly comparable to BENCH_r04's 78.6k
incl-val windows/s unchunked figure).
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


def timed_whole_run(model, cfg, stack, x, y, *, auto_entry=False):
    from imagined_speech_decoding_tpu.train.engine import fit_many, make_fit

    keys, params0, state0, tidx, vidx, n_train, n_val = stack
    fit = make_fit(
        model.apply, cfg.n_classes, epochs=EPOCHS, batch_size=BATCH,
        n_train=n_train, n_val=n_val, learning_rate=5e-4,
        warmup_epochs=min(10, EPOCHS), data_dtype=jnp.bfloat16,
    )
    args = (keys, params0, state0, tidx, vidx, x, y)
    if auto_entry:
        from jax.experimental.layout import Format, Layout

        # AUTO-layout compiles are not persistent-cache-safe here: a
        # cache round-trip returns an executable whose actual input
        # layouts disagree with comp.input_formats (measured: 5/14
        # mismatches). Bypass the cache for this variant.
        jax.config.update("jax_enable_compilation_cache", False)
        run = jax.jit(
            lambda *a: fit_many(fit, *a),
            in_shardings=Format(Layout.AUTO),
            out_shardings=Format(Layout.AUTO),
        )
        comp = run.lower(*args).compile()
        in_fmts = comp.input_formats[0]
        # device_put only the arguments whose XLA-chosen layout differs
        # from their current one (copying ALL args would transiently
        # double the 1.07 GB corpus and OOM next to the compile buffers).
        # Pair formats to args with tree.map — two independent flattens
        # can cross leaves between dict subtrees.
        moved = [0, 0]

        def _relay(v, f):
            moved[1] += 1
            if hasattr(v, "format") and v.format == f:
                return v
            moved[0] += 1
            return jax.device_put(v, f)

        args = jax.tree.map(_relay, args, tuple(in_fmts))
        log(f"auto-entry: {moved[0]}/{moved[1]} args re-laid-out")
        run = comp
    else:
        run = jax.jit(lambda *a: fit_many(fit, *a))
    t0 = time.perf_counter()
    warm = run(*args)
    float(jnp.sum(warm.best_val_acc))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run(*args)
    float(jnp.sum(res.best_val_acc))
    dt = time.perf_counter() - t0
    w_incl = MODELS * cfg.n_tokens * EPOCHS * (n_train + n_val)
    w_train = MODELS * cfg.n_tokens * EPOCHS * n_train
    return {
        "fit_s": round(dt, 3),
        "compile_s": round(compile_s, 2),
        "windows_per_s_incl_val": round(w_incl / dt, 1),
        "trainpass_windows_per_s": round(w_train / dt, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, default="")
    p.add_argument("--chunk", type=int, default=0,
                   help="head_micro_batch; 0 = unchunked")
    args = p.parse_args()

    from imagined_speech_decoding_tpu.config import FASTConfig
    from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials_device
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.profiling import sync_scalar

    log("device:", jax.devices()[0])
    cfg = FASTConfig.default()
    # Chunked like bench.py (service cold-program cost; see
    # synthetic_trials_device_chunked's docstring).
    from imagined_speech_decoding_tpu.data.synthetic import (
        synthetic_trials_device_chunked,
    )

    x, y = synthetic_trials_device_chunked(
        jax.random.PRNGKey(0), N_SUBJECTS * N_TRIALS, cfg.n_channels,
        cfg.seq_len, cfg.n_classes, n_chunks=6,
    )
    log("corpus ready")

    # (name, ISD_H2_LAYOUT value or None, auto_entry)
    variants = [
        ("baseline_dense_unchunked", None, False),
        ("wlc_0123_rowmajor", "0,1,2,3", False),
        ("wlc_0132_Ominor", "0,1,3,2", False),
        ("wlc_1230_Bminor", "1,2,3,0", False),
        ("wlc_0213", "0,2,1,3", False),
        ("auto_entry_layouts", None, True),
    ]
    for name, h2, auto in variants:
        if args.only and args.only not in name:
            continue
        env = {}
        if h2 is not None:
            env["ISD_H2_LAYOUT"] = h2
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            # fresh model per variant: env knobs are read at trace time
            model = make_fast_model(
                cfg, compute_dtype=jnp.bfloat16, remat=True,
                head_micro_batch=args.chunk or None,
            )
            stack = build_stack(cfg, model)
            out = timed_whole_run(model, cfg, stack, x, y, auto_entry=auto)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            out = {"error": f"{type(e).__name__}: {e}"}
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        print(json.dumps({"variant": name, **out}), flush=True)


if __name__ == "__main__":
    main()
