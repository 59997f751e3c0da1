"""Group-level explainability: the all-subject attribution driver.

Parity with the reference ``scripts/global_shap_analysis.py:260-367``:
iterate ALL subjects; for each, load that subject's best checkpoint and
data, compute class-conditional mean attributions over samples whose
TRUE label matches the class (the reference's "true positives" filter,
``global_shap_analysis.py:315-330``), and write three plots per
(subject, class):

  Sub{sid}_Class{k}_{name}_Topomap.png     mean attribution topomap
  Sub{sid}_Class{k}_{name}_ZoneMatrix.png  zone x time heatmap
  Sub{sid}_Class{k}_{name}_FreqBands.png   Delta..Gamma band STFT heatmap

plus pooled group-level artifacts the reference's per-subject loop
implies but never aggregates (documented extension):

  group_class_topomaps.png   per-class topomaps pooled over subjects
  group_zone_time.png        pooled zone x time heatmap
  group_band_heatmap.png     pooled band x time heatmap

Missing checkpoints / subjects are skipped with a message, exactly like
the reference (``global_shap_analysis.py:288-297``). Attribution math:
ONE expected-gradients call per subject with per-sample targets = true
labels — elementwise identical to the reference's
``shap_vals[k][true == k]`` selection, at 1/n_classes the compute.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="All-subject FAST attribution analysis")
    p.add_argument("--model_dir", type=str, default="results/FAST",
                   help="dir containing sub-<sid>/best_subject.npz checkpoints")
    p.add_argument("--cache", type=str, default=None, help="standardized per-subject HDF5 cache")
    p.add_argument("--subjects", type=int, nargs="*", default=None,
                   help="subject indices (default: all in the cache)")
    p.add_argument("--n_bg", type=int, default=200)
    p.add_argument("--n_test", type=int, default=100,
                   help="samples to average per subject (reference --n_test)")
    p.add_argument("--n_grad_samples", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", type=str, default="shap_subject_analysis")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic corpus instead of a cache (tests/demos)")
    p.add_argument("--n_synth_subjects", type=int, default=3)
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
        expected_gradients,
        plot_band_heatmap,
        plot_class_topomaps,
        plot_zone_time_heatmap,
        save_topomap,
        zone_time_matrix,
    )
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.ops.spectral import band_stft_heatmap
    from imagined_speech_decoding_tpu.train.checkpoint import load_model_npz

    cfg = FASTConfig.default()
    model = make_fast_model(cfg)
    params0, state0 = model.init(jax.random.PRNGKey(0))
    zl = zone_layout()
    out = args.output_dir
    os.makedirs(out, exist_ok=True)

    if args.synthetic:
        from imagined_speech_decoding_tpu.data import synthetic_corpus

        X, Y = synthetic_corpus(
            args.seed, n_subjects=args.n_synth_subjects,
            n_trials=args.n_bg + args.n_test, n_samples=cfg.seq_len,
        )
    elif not args.cache:
        # the reference errors out when its data file is missing
        # (global_shap_analysis.py:269-271); silently explaining real
        # checkpoints on synthetic data would produce real-looking plots
        build_parser().error("--cache is required (or pass --synthetic)")
    else:
        from imagined_speech_decoding_tpu.data import load_standardized_h5

        X, Y = load_standardized_h5(args.cache)

    subjects = args.subjects if args.subjects is not None else list(range(len(X)))

    # pooled accumulators: per-class channel-topomap sums, zone x time,
    # band x time (weighted by per-subject sample counts)
    pooled_topo = np.zeros((cfg.n_classes, cfg.n_channels))
    pooled_zt = None
    pooled_band = None
    band_meta = None  # (band_names, frame_times) from the first STFT
    pooled_n = np.zeros(cfg.n_classes)
    n_done = 0
    any_untrained = False  # any subject plotted from demo weights

    for sid in subjects:
        ckpt = os.path.join(args.model_dir, f"sub-{sid}", "best_subject.npz")
        if os.path.exists(ckpt):
            params, state, _ = load_model_npz(ckpt, params0, state0)
            stamp = ""
        elif args.synthetic:
            # Untrained demo weights: the plots must SAY so — attribution
            # maps from random weights are visually indistinguishable
            # from trained ones, and an unstamped artifact tree invites
            # misreading them as results.
            params, state = params0, state0
            stamp = " [UNTRAINED]"
            any_untrained = True
        else:
            print(f"Skipping Subject {sid}: no checkpoint at {ckpt}")
            continue
        if sid >= len(X):
            print(f"Skipping Subject {sid}: no data")
            continue

        x, y = np.asarray(X[sid]), np.asarray(Y[sid]).astype(int)
        rng = np.random.default_rng(args.seed)
        perm = rng.permutation(len(x))
        bg = jnp.asarray(x[perm[: args.n_bg]])
        sel = perm[args.n_bg: args.n_bg + args.n_test]
        xt = jnp.asarray(x[sel])
        yt = y[sel]

        # one call, per-sample target = TRUE label: identical to the
        # reference's per-class shap_vals[k][true == k] selection
        attr = np.asarray(expected_gradients(
            model.apply, params, state, xt, bg, jnp.asarray(yt),
            jax.random.PRNGKey(args.seed), n_samples=args.n_grad_samples,
        ))

        n_plotted = 0
        for k, cname in enumerate(CLASSES):
            mask = yt == k
            if not mask.any():
                print(f"Skipping Sub {sid} {cname}: no samples of this class")
                continue
            avg = attr[mask].mean(0)  # (C, T)
            tag = f"Sub{sid}_Class{k}_{cname}"
            # mean over time, matching the reference plot_class_topomap
            # ("Mean SHAP", global_shap_analysis.py:205)
            save_topomap(
                f"{out}/{tag}_Topomap.png", avg.mean(-1), Electrodes,
                title=f"Sub {sid}: {cname} (True Positives){stamp}",
            )
            zt = zone_time_matrix(avg, zl.indices, zl.mask)
            plot_zone_time_heatmap(
                f"{out}/{tag}_ZoneMatrix.png", zt, zl.names, sfreq=SFREQ,
                title=f"Sub {sid}: {cname} (Time x Region){stamp}",
            )
            band_names, times, bands = band_stft_heatmap(
                jnp.abs(jnp.asarray(avg)).mean(0), SFREQ, nperseg=64, noverlap=32
            )
            plot_band_heatmap(
                f"{out}/{tag}_FreqBands.png", np.asarray(bands), band_names, times,
                title=f"Sub {sid}: {cname}{stamp}",
            )
            n_k = int(mask.sum())
            n_plotted += n_k
            pooled_topo[k] += avg.mean(-1) * n_k
            pooled_n[k] += n_k
            if pooled_zt is None:
                pooled_zt = np.zeros_like(zt)
                pooled_band = np.zeros_like(np.asarray(bands))
                band_meta = (band_names, times)
            pooled_zt += zt * n_k
            pooled_band += np.asarray(bands) * n_k
        n_done += 1
        print(f"Subject {sid}: class plots written ({n_plotted} samples)")

    if n_done and pooled_n.sum() > 0:
        per_class = {
            CLASSES[k]: pooled_topo[k] / pooled_n[k]
            for k in range(cfg.n_classes) if pooled_n[k] > 0
        }
        gstamp = " [UNTRAINED]" if any_untrained else ""
        plot_class_topomaps(
            f"{out}/group_class_topomaps.png", per_class, Electrodes,
            title=f"Group mean attribution ({n_done} subjects){gstamp}",
        )
        total = pooled_n.sum()
        plot_zone_time_heatmap(
            f"{out}/group_zone_time.png", pooled_zt / total, zl.names, sfreq=SFREQ,
            title=f"Group zone x time ({n_done} subjects){gstamp}",
        )
        band_names, times = band_meta  # shape-determined constants,
        # captured from the first per-class STFT (same nperseg/noverlap)
        plot_band_heatmap(
            f"{out}/group_band_heatmap.png", pooled_band / total, band_names, times,
            title=f"Group band energy ({n_done} subjects){gstamp}",
        )
    print(f"Analysis Complete! ({n_done} subjects -> {out})")
    return out


if __name__ == "__main__":
    main()
