"""Hyperparameter-sweep engine tests (``train.sweep``, ``cli.sweep``).

The load-bearing property is EXACTNESS: a sweep-mode fit at runtime
scales (c, w) must reproduce a plain fit rebuilt with ``learning_rate *=
c, weight_decay *= w`` — AdamW's update is linear in the step lr, so the
reconstruction differs only by float reassociation (see
``make_fit(sweep=True)``). Everything else (grid orchestration, shared
inits/keys across configs, artifacts) is layered on that.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials
from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.train.engine import make_fit
from imagined_speech_decoding_tpu.train.sweep import (
    cv_sweep,
    hyper_grid,
    sweep_many,
)


@pytest.fixture(scope="module")
def small_corpus(request):
    small_config = request.getfixturevalue("small_config")
    x, y = synthetic_trials(
        0, 30, small_config.n_channels, small_config.seq_len, small_config.n_classes
    )
    return jnp.asarray(x), jnp.asarray(y.astype(np.int32))


def _fit_kwargs():
    return dict(epochs=4, batch_size=10, n_train=24, n_val=6, warmup_epochs=2)


class TestSweepExactness:
    """Sweep-mode fit == rebuilt-optimizer fit, to float rounding."""

    @pytest.mark.parametrize(
        "c,w",
        [
            (1.0, 1.0),
            pytest.param(2.3, 0.4, marks=pytest.mark.slow),
            pytest.param(0.25, 10.0, marks=pytest.mark.slow),
        ],
    )
    def test_matches_rebuilt_optimizer(self, small_config, small_corpus, c, w):
        model = make_fast_model(small_config)
        X, Y = small_corpus
        tr, va = jnp.arange(24), jnp.arange(24, 30)
        p0, s0 = model.init(jax.random.PRNGKey(3))
        key = jax.random.PRNGKey(7)

        fit_ref = make_fit(
            model.apply, 5, learning_rate=5e-4 * c, weight_decay=0.01 * w,
            **_fit_kwargs(),
        )
        r_ref = jax.jit(fit_ref)(key, p0, s0, tr, va, X, Y)

        fit_sw = make_fit(
            model.apply, 5, learning_rate=5e-4, weight_decay=0.01, sweep=True,
            **_fit_kwargs(),
        )
        hyper = {"lr_scale": jnp.float32(c), "wd_scale": jnp.float32(w)}
        r_sw = jax.jit(fit_sw)(hyper, key, p0, s0, tr, va, X, Y)

        for k in r_ref.history:
            np.testing.assert_allclose(
                np.asarray(r_sw.history[k]), np.asarray(r_ref.history[k]),
                rtol=2e-4, atol=2e-5, err_msg=f"history[{k}]",
            )
        # The two formulations differ by one float reassociation in the
        # per-step lr (c·(base·tbl) vs (c·base)·tbl); that ulp-level
        # difference is amplified through AdamW's rsqrt over the run, so
        # final params agree to ~1e-3, not 1e-7 (measured 3e-4 here —
        # the history check above is the tight functional assertion).
        for a, b in zip(jax.tree.leaves(r_sw.params), jax.tree.leaves(r_ref.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3
            )

    @pytest.mark.parametrize(
        "warmup",
        [0, pytest.param(1, marks=pytest.mark.slow),
         pytest.param(3, marks=pytest.mark.slow)],
    )
    def test_lr_table_matches_rebuilt_warmup(self, small_config, small_corpus, warmup):
        """A per-model lr TABLE (the warmup-sweep mechanism) reproduces a
        plain fit rebuilt with that warmup length — the schedule shape
        really is a runtime input."""
        from imagined_speech_decoding_tpu.train.schedule import cosine_scheduler

        model = make_fast_model(small_config)
        X, Y = small_corpus
        tr, va = jnp.arange(24), jnp.arange(24, 30)
        p0, s0 = model.init(jax.random.PRNGKey(3))
        key = jax.random.PRNGKey(7)
        kw = _fit_kwargs()
        spe = 24 // 10 + 1  # 3 steps/epoch at batch 10

        fit_ref = make_fit(
            model.apply, 5, learning_rate=5e-4, weight_decay=0.01,
            epochs=kw["epochs"], batch_size=kw["batch_size"],
            n_train=kw["n_train"], n_val=kw["n_val"], warmup_epochs=warmup,
        )
        r_ref = jax.jit(fit_ref)(key, p0, s0, tr, va, X, Y)

        fit_sw = make_fit(
            model.apply, 5, learning_rate=5e-4, weight_decay=0.01, sweep=True,
            **kw,  # base warmup differs (2): the table must fully override it
        )
        table = 5e-4 * cosine_scheduler(1.0, 0.1, kw["epochs"], spe, warmup_epochs=warmup)
        hyper = {
            "lr_scale": jnp.float32(1.0),
            "wd_scale": jnp.float32(1.0),
            "lr_table": jnp.asarray(table, jnp.float32),
        }
        r_sw = jax.jit(fit_sw)(hyper, key, p0, s0, tr, va, X, Y)

        for k in r_ref.history:
            np.testing.assert_allclose(
                np.asarray(r_sw.history[k]), np.asarray(r_ref.history[k]),
                rtol=2e-4, atol=2e-5, err_msg=f"history[{k}] warmup={warmup}",
            )

    def test_hyper_changes_training(self, small_config, small_corpus):
        """Different scales through the SAME compiled program must give
        different trajectories (the hyper really is a runtime input)."""
        model = make_fast_model(small_config)
        X, Y = small_corpus
        tr, va = jnp.arange(24), jnp.arange(24, 30)
        p0, s0 = model.init(jax.random.PRNGKey(3))
        key = jax.random.PRNGKey(7)
        fit_sw = make_fit(
            model.apply, 5, learning_rate=5e-4, weight_decay=0.01, sweep=True,
            **_fit_kwargs(),
        )
        jfit = jax.jit(fit_sw)
        mk = lambda c: {"lr_scale": jnp.float32(c), "wd_scale": jnp.float32(1.0)}
        r1 = jfit(mk(1.0), key, p0, s0, tr, va, X, Y)
        r2 = jfit(mk(8.0), key, p0, s0, tr, va, X, Y)
        assert not np.allclose(
            np.asarray(r1.history["loss"]), np.asarray(r2.history["loss"])
        )


class TestGrid:
    def test_hyper_grid_order(self):
        hyper, meta = hyper_grid([0.5, 1.0], [0.0, 1.0, 2.0])
        assert meta == [
            (0.5, 0.0), (0.5, 1.0), (0.5, 2.0),
            (1.0, 0.0), (1.0, 1.0), (1.0, 2.0),
        ]
        np.testing.assert_array_equal(
            np.asarray(hyper["lr_scale"]), [0.5, 0.5, 0.5, 1.0, 1.0, 1.0]
        )
        np.testing.assert_array_equal(
            np.asarray(hyper["wd_scale"]), [0.0, 1.0, 2.0, 0.0, 1.0, 2.0]
        )

    def test_sweep_many_rows_match_single_fits(self, small_config, small_corpus):
        """Each row of the vmapped sweep equals the corresponding single
        sweep-fit call (vmap correctness over the hyper axis)."""
        model = make_fast_model(small_config)
        X, Y = small_corpus
        tr = jnp.tile(jnp.arange(24), (2, 1))
        va = jnp.tile(jnp.arange(24, 30), (2, 1))
        p0, s0 = model.init(jax.random.PRNGKey(3))
        stack = lambda t: jax.tree.map(lambda x: jnp.stack([x, x]), t)
        keys = jnp.stack([jax.random.PRNGKey(7)] * 2)
        fit_sw = make_fit(
            model.apply, 5, learning_rate=5e-4, weight_decay=0.01, sweep=True,
            **_fit_kwargs(),
        )
        hyper = {
            "lr_scale": jnp.asarray([1.0, 3.0], jnp.float32),
            "wd_scale": jnp.asarray([1.0, 0.0], jnp.float32),
        }
        res = jax.jit(lambda *a: sweep_many(fit_sw, *a))(
            hyper, keys, stack(p0), stack(s0), tr, va, X, Y
        )
        for i in range(2):
            hi = {k: v[i] for k, v in hyper.items()}
            ri = jax.jit(fit_sw)(
                hi, keys[i], p0, s0, tr[i], va[i], X, Y
            )
            np.testing.assert_allclose(
                np.asarray(res.history["val_acc"][i]),
                np.asarray(ri.history["val_acc"]),
                rtol=1e-5, atol=1e-6,
            )

    def test_cv_sweep_report(self, small_config, small_corpus):
        model = make_fast_model(small_config)
        X, Y = small_corpus
        report = cv_sweep(
            model, 5, X, Y, n_trials=30, lr_scales=[0.5, 1.0], wd_scales=[1.0],
            n_folds=3, epochs=3, batch_size=10, warmup_epochs=1, seed=42,
        )
        assert report.fold_val_acc.shape == (2, 3)
        assert report.mean_val_acc.shape == (2,)
        assert report.history["val_acc"].shape == (2, 3, 3)
        assert report.best_index == int(np.argmax(report.mean_val_acc))
        assert 0.0 <= report.best["mean_val_acc"] <= 1.0
        rows = report.rows()
        assert len(rows) == 2 and "fold2_val_acc" in rows[0]
        # lr column carries absolute values (base 5e-4 x scales)
        np.testing.assert_allclose(report.lr, [2.5e-4, 5e-4])

    @pytest.mark.slow
    def test_cv_sweep_warmup_grid(self, small_config, small_corpus):
        """The third (warmup) grid axis: report geometry, per-row warmup
        values, and that warmup actually changes trajectories."""
        model = make_fast_model(small_config)
        X, Y = small_corpus
        report = cv_sweep(
            model, 5, X, Y, n_trials=30, lr_scales=[1.0], wd_scales=[1.0],
            warmup_epochs_list=[0, 4], n_folds=3, epochs=4, batch_size=10,
            seed=42,
        )
        assert report.fold_val_acc.shape == (2, 3)
        np.testing.assert_array_equal(report.warmup, [0, 4])
        assert "warmup_epochs" in report.best
        assert all("warmup_epochs" in r for r in report.rows())
        # warmup 0 vs 4 must produce different loss histories through
        # the SAME compiled program
        h = report.history["loss"]
        assert not np.allclose(h[0], h[1])

    @pytest.mark.slow
    def test_cv_sweep_segmented_matches_whole_run(self, small_config, small_corpus):
        """The segmented executor is the same math AND the same key
        stream as one whole-run program: the engine derives epoch keys
        by fold_in(base key, global epoch), so shuffles/dropout are
        identical across the segment boundary. Full trajectories (loss
        histories, not just quantized accuracies) must agree."""
        model = make_fast_model(small_config)
        X, Y = small_corpus
        kw = dict(
            n_trials=30, lr_scales=[1.0, 2.0], wd_scales=[1.0], n_folds=3,
            epochs=4, batch_size=10, warmup_epochs=1, seed=42,
        )
        whole = cv_sweep(model, 5, X, Y, **kw)
        seg = cv_sweep(model, 5, X, Y, segment_epochs=2, **kw)
        np.testing.assert_allclose(
            seg.fold_val_acc, whole.fold_val_acc, rtol=1e-5, atol=1e-6
        )
        for k in ("loss", "val_loss", "val_acc", "acc"):
            np.testing.assert_allclose(
                np.asarray(seg.history[k]), np.asarray(whole.history[k]),
                rtol=1e-5, atol=1e-6, err_msg=f"history[{k}]",
            )


class TestSweepCLI:
    def test_synthetic_cli_artifacts(self, tmp_path, monkeypatch, small_config):
        from imagined_speech_decoding_tpu.cli import sweep as cli_sweep

        # Shrink the model the CLI builds: patch its config loader to
        # return the small fixture geometry.
        from imagined_speech_decoding_tpu import config as config_mod

        import dataclasses

        full = config_mod.load_config(None, {})
        patched = dataclasses.replace(full, model=small_config)
        monkeypatch.setattr(config_mod, "load_config", lambda *a, **k: patched)
        out = str(tmp_path / "sweep")
        report = cli_sweep.main([
            "--synthetic", "24", "--n_folds", "3", "--epochs", "2",
            "--batch_size", "8", "--warmup_epochs", "1",
            "--lr_scales", "0.5,1", "--wd_scales", "1",
            "--precision", "f32", "--output_dir", out,
        ])
        assert os.path.exists(os.path.join(out, "sweep_results.csv"))
        assert os.path.exists(os.path.join(out, "sweep_heatmap.png"))
        assert os.path.exists(os.path.join(out, "best.json"))
        assert report.fold_val_acc.shape == (2, 3)

    @pytest.mark.slow
    def test_synthetic_cli_warmup_grid(self, tmp_path, monkeypatch, small_config):
        from imagined_speech_decoding_tpu.cli import sweep as cli_sweep
        from imagined_speech_decoding_tpu import config as config_mod

        import dataclasses
        import json

        full = config_mod.load_config(None, {})
        patched = dataclasses.replace(full, model=small_config)
        monkeypatch.setattr(config_mod, "load_config", lambda *a, **k: patched)
        out = str(tmp_path / "wsweep")
        report = cli_sweep.main([
            "--synthetic", "24", "--n_folds", "3", "--epochs", "2",
            "--batch_size", "8", "--lr_scales", "1", "--wd_scales", "1",
            "--warmup_grid", "0,1", "--precision", "f32", "--output_dir", out,
        ])
        assert report.fold_val_acc.shape == (2, 3)
        with open(os.path.join(out, "best.json")) as f:
            best = json.load(f)
        assert best["warmup_epochs"] in (0, 1)
        assert os.path.exists(os.path.join(out, "sweep_heatmap.png"))

    def test_train_fast_consumes_best_json(self, tmp_path):
        """The sweep winner feeds the production CLI (--hyperparams);
        explicit flags win over the file."""
        import json

        from imagined_speech_decoding_tpu.cli import train_fast as train_cli
        from imagined_speech_decoding_tpu.config import load_config

        best = {
            "learning_rate": 2e-3, "weight_decay": 0.0, "mean_val_acc": 0.5,
            "warmup_epochs": 7,
        }
        path = tmp_path / "best.json"
        path.write_text(json.dumps(best))

        args = train_cli.build_parser().parse_args(["--hyperparams", str(path)])
        ov = train_cli.build_overrides(args)
        assert ov["learning_rate"] == 2e-3
        assert ov["weight_decay"] == 0.0  # wd=0 from the file survives
        assert ov["warmup_epochs"] == 7  # warmup winner flows through too
        cfg = load_config(None, ov)
        assert cfg.train.learning_rate == 2e-3
        assert cfg.train.weight_decay == 0.0
        assert cfg.train.warmup_epochs == 7

        args = train_cli.build_parser().parse_args(
            ["--hyperparams", str(path), "--learning_rate", "1e-4",
             "--weight_decay", "0.5"]
        )
        ov = train_cli.build_overrides(args)
        assert ov["learning_rate"] == 1e-4 and ov["weight_decay"] == 0.5
