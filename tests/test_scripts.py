"""CLI tests (mirrors reference tests/test_scripts.py strata): argument
parsing, config resolution, benchmark aggregation over synthetic result
trees, end-to-end synthetic runs of the training CLIs."""

import os

import numpy as np
import pandas as pd
import pytest

from imagined_speech_decoding_tpu.cli import benchmark as bench_cli
from imagined_speech_decoding_tpu.cli import train_fast as train_cli
from imagined_speech_decoding_tpu.train.artifacts import save_predictions_csv


class TestArgParsing:
    def test_train_fast_defaults(self):
        args = train_cli.build_parser().parse_args([])
        assert args.config == "configs/default.yaml"
        assert args.output_dir.endswith("FAST")
        assert args.synthetic == 0

    def test_train_fast_overrides(self):
        args = train_cli.build_parser().parse_args(
            ["--epochs", "3", "--batch_size", "16", "--synthetic", "2"]
        )
        assert args.epochs == 3 and args.batch_size == 16 and args.synthetic == 2


class TestBenchmarkAggregation:
    def _make_tree(self, root, model, subjects, with_global=True):
        rng = np.random.default_rng(0)
        all_p, all_t = [], []
        for sid in subjects:
            t = rng.integers(0, 5, 50)
            p = np.where(rng.random(50) < 0.6, t, rng.integers(0, 5, 50))
            save_predictions_csv(
                os.path.join(root, model, f"sub-{sid}", "test_predictions.csv"), p, t
            )
            all_p.append(p)
            all_t.append(t)
        if with_global:
            save_predictions_csv(
                os.path.join(root, model, "global_test_predictions.csv"),
                np.concatenate(all_p), np.concatenate(all_t),
            )

    def test_process_results(self, tmp_dir):
        self._make_tree(tmp_dir, "FAST", ["01", "02", "03"])
        df, summary = bench_cli.process_results(tmp_dir, "FAST")
        assert len(df) == 3
        assert set(df.columns) == {"Subject", "Accuracy", "F1", "Precision", "Recall"}
        assert 0.4 < summary["Acc_Mean"] < 0.95
        assert summary["Global_Acc"] == pytest.approx(
            np.average(df["Accuracy"]), abs=1e-9
        )  # equal-sized subjects → global == mean
        assert np.isfinite(summary["TTest_vs_Chance"])

    def test_fallback_without_global(self, tmp_dir):
        self._make_tree(tmp_dir, "M2", ["01", "02"], with_global=False)
        df, summary = bench_cli.process_results(tmp_dir, "M2")
        assert summary["Global_Acc"] == pytest.approx(df["Accuracy"].mean())

    def test_missing_model_raises(self, tmp_dir):
        with pytest.raises(FileNotFoundError):
            bench_cli.process_results(tmp_dir, "NOPE")

    def test_main_writes_summary(self, tmp_dir):
        self._make_tree(tmp_dir, "FAST", ["01", "02"])
        bench_cli.main(["--results_dir", tmp_dir])
        assert os.path.exists(os.path.join(tmp_dir, "FAST_Subject_Metrics.csv"))
        summary = pd.read_csv(os.path.join(tmp_dir, "Model_Summary.csv"))
        assert summary.iloc[0]["Model"] == "FAST"


class TestEndToEndSynthetic:
    """Full CLI pipeline on synthetic data — the minimum end-to-end slice
    (SURVEY §7 stage 5) exercised through the public entry point."""

    @pytest.mark.slow
    def test_train_fast_synthetic(self, tmp_dir):
        trace_dir = os.path.join(tmp_dir, "trace")
        result = train_cli.main([
            "--config", "nonexistent.yaml",
            "--synthetic", "2", "--synthetic_trials", "30",
            "--epochs", "3", "--batch_size", "10", "--n_folds", "3",
            "--precision", "f32",
            "--profile", trace_dir,
            "--output_dir", tmp_dir,
        ])
        assert len(result.summary) == 2
        import glob

        assert glob.glob(os.path.join(trace_dir, "plugins", "profile", "*", "*")), (
            "--profile produced no device-trace artifacts"
        )
        assert os.path.exists(os.path.join(tmp_dir, "summary_per_subject.csv"))
        assert os.path.exists(os.path.join(tmp_dir, "global_test_predictions.csv"))
        assert os.path.exists(os.path.join(tmp_dir, "sub-01", "best_subject.npz"))
        # benchmark CLI consumes the tree the training CLI wrote
        parent = os.path.dirname(tmp_dir)
        model = os.path.basename(tmp_dir)
        df, summary = bench_cli.process_results(parent, model)
        assert len(df) == 2

    @pytest.mark.slow
    def test_train_fast_synthetic_val_every(self, tmp_dir):
        """--val_every plumbs through config -> cv -> engine: the
        campaign completes, the artifact tree is intact, and the history
        CSVs carry NaN val rows on skipped epochs."""
        result = train_cli.main([
            "--config", "nonexistent.yaml",
            "--synthetic", "2", "--synthetic_trials", "30",
            "--epochs", "4", "--batch_size", "10", "--n_folds", "3",
            "--precision", "f32", "--val_every", "2",
            "--output_dir", tmp_dir,
        ])
        assert len(result.summary) == 2
        import pandas as pd

        hist = pd.read_csv(os.path.join(tmp_dir, "sub-01", "fold-1_history.csv"))
        va = hist["val_acc"].to_numpy()
        assert len(va) == 4
        import numpy as np

        assert np.isnan(va[0]) and np.isnan(va[2]), "skipped epochs must be NaN"
        assert np.isfinite(va[1]) and np.isfinite(va[3])


class TestMultiModelComparison:
    def test_model_summary_covers_all_models(self, tmp_dir):
        """The reference's FAST-vs-TSception comparison study (notebook
        cell 49): one benchmark run aggregates every model tree under
        results_dir into a single Model_Summary with per-model rows."""
        agg = TestBenchmarkAggregation()
        for model in ("FAST", "TSception", "svm"):
            agg._make_tree(tmp_dir, model, ["01", "02"])
        bench_cli.main(["--results_dir", tmp_dir])
        import pandas as pd

        summary = pd.read_csv(os.path.join(tmp_dir, "Model_Summary.csv"))
        assert set(summary["Model"]) == {"FAST", "TSception", "svm"}
        assert {"Acc_Mean", "F1_Mean", "Global_Acc"} <= set(summary.columns)


class TestConsoleEntryPoints:
    def test_declared_entry_points_resolve(self):
        """Every [project.scripts] target in pyproject.toml imports and
        exposes a callable main — an uninstallable entry point would only
        surface at user install time otherwise."""
        import importlib
        import re

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "pyproject.toml")) as f:
            text = f.read()
        block = re.search(r"\[project\.scripts\]\n(.*?)(?=\n\[|\Z)", text, re.S)
        assert block, "pyproject.toml lost its [project.scripts] table"
        targets = re.findall(r'=\s*"([\w.]+):(\w+)"', block.group(1))
        assert len(targets) >= 9
        for mod_name, attr in targets:
            mod = importlib.import_module(mod_name)
            fn = getattr(mod, attr)
            assert callable(fn), f"{mod_name}:{attr}"
            # setuptools wrappers run sys.exit(target()): a non-None
            # return would exit 1 on success, so targets must be the
            # return-swallowing wrappers, not the raw CLI mains.
            assert mod_name.endswith("_scriptmain"), (
                f"{mod_name}:{attr} — point entry points at "
                "cli._scriptmain wrappers (raw main() returns objects)"
            )
