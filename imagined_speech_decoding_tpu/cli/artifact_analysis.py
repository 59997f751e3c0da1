"""Artifact QC CLI: PSD + ICA signal-quality analysis per subject.

Parity with ``scripts/artifact_analysis.py`` (MNE EpochsArray → PSD
0.1-40 Hz → 15-component ICA with component/source plots), built on the
in-repo jitted Welch PSD (``ops.spectral``) and sklearn FastICA (MNE is
not available in this environment); topographic component maps use the
self-contained layout in ``explain.topomap``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def build_parser():
    p = argparse.ArgumentParser(description="EEG artifact / signal-quality analysis")
    p.add_argument("--cache", type=str, default=None, help="per-subject HDF5 cache")
    p.add_argument("--subject", type=int, default=0)
    p.add_argument("--n_components", type=int, default=15)
    p.add_argument("--fmin", type=float, default=0.1)
    p.add_argument("--fmax", type=float, default=40.0)
    p.add_argument("--output_dir", type=str, default="results/artifact_analysis")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n_trials", type=int, default=100, help="synthetic-mode trial count")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from imagined_speech_decoding_tpu.cli import enable_cache

    enable_cache()

    import jax.numpy as jnp

    from imagined_speech_decoding_tpu.data import Electrodes, SFREQ
    from imagined_speech_decoding_tpu.explain.topomap import plot_topomap
    from imagined_speech_decoding_tpu.ops.spectral import welch_psd

    if args.synthetic or not args.cache:
        from imagined_speech_decoding_tpu.data import synthetic_trials

        x, _ = synthetic_trials(args.seed, args.n_trials, 64, 800)
    else:
        from imagined_speech_decoding_tpu.data import load_standardized_h5

        X, _ = load_standardized_h5(args.cache)
        x = X[args.subject]

    out = args.output_dir
    os.makedirs(out, exist_ok=True)
    n_trials, n_ch, n_t = x.shape

    # --- PSD (jitted Welch over all trials x channels at once) ---
    freqs, pxx = welch_psd(jnp.asarray(x), fs=SFREQ, nperseg=min(256, n_t))
    pxx = np.asarray(pxx).mean(0)  # (C, F) mean over trials
    sel = (freqs >= args.fmin) & (freqs <= args.fmax)
    # numeric artifact alongside the plot (testable vs scipy.signal.welch)
    np.savez(f"{out}/psd.npz", freqs=np.asarray(freqs), pxx=pxx)

    fig, ax = plt.subplots(figsize=(10, 5))
    for c in range(n_ch):
        ax.semilogy(freqs[sel], pxx[c, sel], lw=0.5, alpha=0.5)
    ax.semilogy(freqs[sel], pxx[:, sel].mean(0), "k", lw=2, label="mean")
    ax.set_xlabel("Frequency (Hz)")
    ax.set_ylabel("PSD (V²/Hz)")
    ax.set_title(f"Welch PSD, {n_trials} trials x {n_ch} channels")
    ax.legend()
    fig.tight_layout()
    fig.savefig(f"{out}/psd.png", dpi=120)
    plt.close(fig)

    # --- ICA decomposition (sklearn FastICA on concatenated trials) ---
    from sklearn.decomposition import FastICA

    cont = np.transpose(x, (1, 0, 2)).reshape(n_ch, -1).T  # (N*T, C)
    cont = cont - cont.mean(0)
    ica = FastICA(
        n_components=args.n_components, random_state=args.seed, max_iter=500, whiten="unit-variance"
    )
    sources = ica.fit_transform(cont)  # (N*T, K)
    mixing = ica.mixing_  # (C, K)

    # component topographies
    k = args.n_components
    cols = 5
    rows = -(-k // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    for i in range(rows * cols):
        ax = axes.flat[i]
        if i < k:
            plot_topomap(mixing[:, i], Electrodes[:n_ch], ax=ax, title=f"IC{i}")
        else:
            ax.axis("off")
    fig.suptitle("ICA component topographies")
    fig.savefig(f"{out}/ica_components.png", dpi=110)
    plt.close(fig)

    # source time courses (first seconds)
    span = min(10 * int(SFREQ), sources.shape[0])
    fig, ax = plt.subplots(figsize=(12, 8))
    t = np.arange(span) / SFREQ
    for i in range(k):
        s = sources[:span, i]
        ax.plot(t, s / (np.abs(s).max() or 1) + 2.2 * i, lw=0.4)
    ax.set_yticks(2.2 * np.arange(k))
    ax.set_yticklabels([f"IC{i}" for i in range(k)])
    ax.set_xlabel("Time (s)")
    ax.set_title("ICA source time courses")
    fig.tight_layout()
    fig.savefig(f"{out}/ica_sources.png", dpi=110)
    plt.close(fig)

    print(f"artifact analysis written to {out}")
    return out


if __name__ == "__main__":
    main()
