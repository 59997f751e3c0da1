"""Explainability CLI: gradient attributions + visualization suite.

Parity with ``scripts/explain_fast.py`` + ``scripts/global_shap_analysis
.py``: load a trained FAST checkpoint, compute per-sample attributions
against a background set (expected gradients — the jax-native equivalent
of ``shap.GradientExplainer``), and write the full plot suite: per-sample
electrode x time heatmaps + topomaps + zone bars, class-conditional
correct-only / error-only average topomaps, zone x time and
frequency-band heatmaps.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="FAST attribution analysis")
    p.add_argument("--checkpoint", type=str, default=None, help="best_subject.npz")
    p.add_argument("--cache", type=str, default=None, help="per-subject HDF5 cache")
    p.add_argument("--subject", type=int, default=0, help="subject index in the cache")
    p.add_argument("--n_background", type=int, default=64)
    p.add_argument("--n_test", type=int, default=16)
    p.add_argument("--n_grad_samples", type=int, default=32)
    p.add_argument("--n_sample_plots", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", type=str, default="results/explain/FAST")
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp

    from imagined_speech_decoding_tpu.config import FASTConfig
    from imagined_speech_decoding_tpu.data import CLASSES, Electrodes, SFREQ, zone_layout
    from imagined_speech_decoding_tpu.explain import (
        attribution_for_predictions,
        plot_attribution_heatmap,
        plot_band_heatmap,
        plot_class_topomaps,
        plot_zone_importance,
        plot_zone_time_heatmap,
        save_topomap,
        zone_importance,
        zone_time_matrix,
    )
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.ops.spectral import band_stft_heatmap
    from imagined_speech_decoding_tpu.train.checkpoint import load_model_npz

    cfg = FASTConfig.default()
    model = make_fast_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.checkpoint:
        params, state, _ = load_model_npz(args.checkpoint, params, state)

    if args.synthetic or not args.cache:
        from imagined_speech_decoding_tpu.data import synthetic_trials

        x, y = synthetic_trials(args.seed, args.n_background + args.n_test, 64, cfg.seq_len)
    else:
        from imagined_speech_decoding_tpu.data import load_standardized_h5

        X, Y = load_standardized_h5(args.cache)
        x, y = X[args.subject], Y[args.subject]

    # fixed-seed permutation into background / explain sets (reference
    # prepare_shap_data, scripts/explain_fast.py:56-73)
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(len(x))
    bg = jnp.asarray(x[perm[: args.n_background]])
    xt = jnp.asarray(x[perm[args.n_background: args.n_background + args.n_test]])
    yt = np.asarray(y)[perm[args.n_background: args.n_background + args.n_test]].astype(int)

    attr, preds = attribution_for_predictions(
        model.apply, params, state, xt, bg, jax.random.PRNGKey(args.seed),
        n_samples=args.n_grad_samples,
    )
    attr_np = np.asarray(attr)
    preds_np = np.asarray(preds)
    zl = zone_layout()
    out = args.output_dir
    os.makedirs(out, exist_ok=True)

    # --- per-sample plots ---
    for i in range(min(args.n_sample_plots, len(xt))):
        tag = f"sample{i}_pred{preds_np[i]}_true{yt[i]}"
        plot_attribution_heatmap(
            f"{out}/{tag}_heatmap.png", attr_np[i], Electrodes, sfreq=SFREQ,
            title=f"Attribution — pred {CLASSES[preds_np[i]]}, true {CLASSES[yt[i]]}",
        )
        # mean over time (reference explain_fast.py:166 aggregates
        # per-sample SHAP with np.mean over the time axis)
        save_topomap(
            f"{out}/{tag}_topomap.png", attr_np[i].mean(-1), Electrodes,
            title=f"pred {CLASSES[preds_np[i]]}",
        )
        zi = np.asarray(zone_importance(attr[i: i + 1], zl.indices, zl.mask))[0]
        plot_zone_importance(f"{out}/{tag}_zones.png", zi, zl.names)

    # --- class-conditional averages (correct-only / error-only) ---
    correct = preds_np == yt
    for name, mask in (("correct_only", correct), ("errors_only", ~correct)):
        per_class = {}
        for k, cname in enumerate(CLASSES):
            sel = (yt == k) & mask
            if sel.any():
                # mean over time then samples (reference explain_fast.py
                # :242/:312, np.mean(np.mean(relevant_shap, axis=2), axis=0))
                per_class[cname] = attr_np[sel].mean(-1).mean(0)
        if per_class:
            plot_class_topomaps(
                f"{out}/class_topomaps_{name}.png", per_class, Electrodes,
                title=f"Mean attribution ({name.replace('_', ' ')})",
            )

    # --- group-level: zone x time + band x time heatmaps ---
    mean_attr = attr_np.mean(0)  # (C, T)
    zt = zone_time_matrix(mean_attr, zl.indices, zl.mask)
    plot_zone_time_heatmap(f"{out}/zone_time.png", zt, zl.names, sfreq=SFREQ)

    band_names, times, bands = band_stft_heatmap(
        jnp.abs(jnp.asarray(mean_attr)).mean(0), SFREQ, nperseg=64, noverlap=32
    )
    plot_band_heatmap(f"{out}/band_heatmap.png", np.asarray(bands), band_names, times)

    print(f"attribution analysis written to {out} "
          f"(accuracy on explained set: {float(correct.mean()):.3f})")
    return out


if __name__ == "__main__":
    main()
