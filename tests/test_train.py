"""Training-layer tests: schedule properties, metric parity with sklearn,
engine learning behavior, best-checkpoint semantics, checkpoint
round-trips, KFold index parity. Mirrors the reference tests/test_train.py
strata plus the vmapped-engine additions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.config import FASTConfig
from imagined_speech_decoding_tpu.data import synthetic_trials
from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.train import (
    cosine_scheduler,
    cross_entropy,
    f1_from_confusion,
    confusion_matrix,
    fit_many,
    load_state_dict,
    macro_f1,
    make_fit,
    predict,
    save_state_dict,
    ttest_vs_chance,
    warmup_cosine_lr,
)
from imagined_speech_decoding_tpu.train.cv import build_cv_index_stack, kfold_indices, stacked_init


class TestCosineScheduler:
    def test_length(self):
        s = cosine_scheduler(1.0, 0.1, epochs=200, niter_per_ep=5, warmup_epochs=10)
        assert len(s) == 1000

    def test_warmup_linear(self):
        s = cosine_scheduler(1.0, 0.1, 20, 10, warmup_epochs=5)
        assert s[0] == 0.0
        np.testing.assert_allclose(np.diff(s[:50]), s[1] - s[0], rtol=1e-6)
        np.testing.assert_allclose(s[49], 1.0, rtol=1e-2)

    def test_endpoint(self):
        s = cosine_scheduler(1.0, 0.1, 100, 5, warmup_epochs=10)
        np.testing.assert_allclose(s[-1], 0.1, atol=1e-4)

    def test_monotone_decay_after_warmup(self):
        s = cosine_scheduler(1.0, 0.1, 100, 5, warmup_epochs=10)
        post = s[50:]
        assert (np.diff(post) <= 1e-9).all()

    def test_warmup_clamped(self):
        s = cosine_scheduler(1.0, 0.1, 3, 4, warmup_epochs=10)
        assert len(s) == 12

    def test_lr_fn(self):
        f = warmup_cosine_lr(5e-4, epochs=10, niter_per_ep=5, warmup_epochs=2)
        assert float(f(0)) == 0.0
        assert float(f(10)) == pytest.approx(5e-4, rel=1e-3)
        assert float(f(49)) == pytest.approx(5e-5, rel=2e-2)
        assert float(f(1000)) == float(f(49))  # clamps past the table


class TestMetrics:
    def test_cross_entropy_matches_manual(self):
        logits = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
        y = jnp.asarray([0, 1])
        ce = float(cross_entropy(logits, y))
        expected = -np.mean(
            [np.log(np.exp(2) / (np.exp(2) + 2)), np.log(np.exp(3) / (np.exp(3) + 2))]
        )
        assert ce == pytest.approx(expected, rel=1e-5)

    def test_weighted_ce_ignores_padding(self):
        logits = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [9.0, 0.0]])
        y = jnp.asarray([0, 1, 1])
        w = jnp.asarray([1.0, 1.0, 0.0])
        ce_w = float(cross_entropy(logits, y, w))
        ce_2 = float(cross_entropy(logits[:2], y[:2]))
        assert ce_w == pytest.approx(ce_2, rel=1e-6)

    def test_macro_f1_matches_sklearn(self):
        from sklearn.metrics import f1_score

        rng = np.random.default_rng(0)
        y_true = rng.integers(0, 5, 200)
        y_pred = rng.integers(0, 5, 200)
        ours = float(
            f1_from_confusion(
                confusion_matrix(jnp.asarray(y_pred), jnp.asarray(y_true), 5)
            )
        )
        ref = f1_score(y_true, y_pred, average="macro")
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_macro_f1_from_logits(self):
        logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0], [2.0, 0.0]])
        y = jnp.asarray([0, 1, 1, 0])
        from sklearn.metrics import f1_score

        ref = f1_score([0, 1, 1, 0], [0, 1, 0, 0], average="macro")
        assert float(macro_f1(logits, y, 2)) == pytest.approx(ref, rel=1e-5)

    def test_ttest_vs_chance_matches_scipy(self):
        accs = np.array([0.3, 0.4, 0.35, 0.5, 0.45])
        t, p = ttest_vs_chance(accs, 0.2)
        from scipy import stats

        t_ref, p2 = stats.ttest_1samp(accs, 0.2)
        assert t == pytest.approx(t_ref)
        assert p == pytest.approx(p2 / 2)


class TestKFold:
    def test_matches_sklearn_reference_semantics(self):
        from sklearn.model_selection import KFold

        folds = kfold_indices(350, 5, seed=42)
        kf = KFold(n_splits=5, shuffle=True, random_state=42)
        ref = list(kf.split(np.arange(350)))
        for (tr, va), (rtr, rva) in zip(folds, ref):
            np.testing.assert_array_equal(tr, rtr)
            np.testing.assert_array_equal(va, rva)

    def test_build_cv_index_stack(self):
        tidx, vidx, meta = build_cv_index_stack(3, 30, 5, seed=0)
        assert tidx.shape == (15, 24) and vidx.shape == (15, 6)
        assert meta[0] == (0, 0) and meta[-1] == (2, 4)
        # fold indices land inside each subject's global range
        for m, (s, k) in enumerate(meta):
            assert tidx[m].min() >= s * 30 and tidx[m].max() < (s + 1) * 30
            combined = np.sort(np.concatenate([tidx[m], vidx[m]]))
            np.testing.assert_array_equal(combined, np.arange(s * 30, (s + 1) * 30))

    def test_non_divisible_raises(self):
        with pytest.raises(ValueError):
            build_cv_index_stack(1, 31, 5, seed=0)


@pytest.fixture(scope="module")
def tiny_setup(request):
    cfg = request.getfixturevalue("small_config")
    model = make_fast_model(cfg)
    x, y = synthetic_trials(0, 60, n_channels=8, n_samples=200, snr=2.0)
    X = jnp.asarray(x)
    Y = jnp.asarray(y.astype(np.int32))
    return cfg, model, X, Y


EPOCHS = 25


@pytest.fixture(scope="module")
def fitted(tiny_setup):
    """One 2-model stacked training run shared by the engine tests."""
    cfg, model, X, Y = tiny_setup
    n_train, n_val = 40, 20
    fit = make_fit(
        model.apply, cfg.n_classes, epochs=EPOCHS, batch_size=16,
        n_train=n_train, n_val=n_val, learning_rate=2e-3, warmup_epochs=2,
    )
    rng = np.random.default_rng(0)
    perms = np.stack([rng.permutation(60) for _ in range(2)])
    tidx = jnp.asarray(perms[:, :n_train])
    vidx = jnp.asarray(perms[:, n_train:])
    params0, state0 = stacked_init(model, jax.random.PRNGKey(1), 2)
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    res = jax.jit(lambda *a: fit_many(fit, *a))(keys, params0, state0, tidx, vidx, X, Y)
    return jax.block_until_ready(res)


class TestEngine:
    def test_learns_synthetic(self, fitted):
        final_acc = np.asarray(fitted.history["acc"][:, -1])
        assert (final_acc > 0.5).all(), f"models failed to learn: {final_acc}"

    def test_history_shapes(self, fitted):
        for k in ("loss", "acc", "f1", "val_loss", "val_acc", "val_f1"):
            assert fitted.history[k].shape == (2, EPOCHS)

    def test_best_checkpoint_semantics(self, fitted):
        va = np.asarray(fitted.history["val_acc"], dtype=np.float64)
        best_acc = np.asarray(fitted.best_val_acc)
        best_ep = np.asarray(fitted.best_epoch)
        for mi in range(va.shape[0]):
            assert best_acc[mi] == pytest.approx(va[mi].max(), abs=1e-6)
            # first epoch achieving the max (strictly-greater updates)
            assert best_ep[mi] == int(np.argmax(va[mi] >= va[mi].max()))

    def test_models_independent(self, fitted):
        """Stacked models with different seeds follow different trajectories."""
        l0 = np.asarray(fitted.history["loss"][0])
        l1 = np.asarray(fitted.history["loss"][1])
        assert not np.allclose(l0, l1)

    def test_eval_batch_auto_selection(self, tiny_setup):
        """Default eval batch: fewest steps first (never a tiny-batch
        scan for divisor-poor n_val), then least padding, then the
        larger size."""
        cfg, model, X, Y = tiny_setup
        cases = {
            # (batch_size, n_val) -> expected eval batch
            (64, 70): 35,   # 2 steps, zero waste
            (64, 71): 36,   # 2 steps, 1 padded slot — not 71 steps of 1
            (64, 8): 8,     # single exact batch
            (64, 64): 64,
            (16, 20): 10,   # capped at train batch; 2x10 exact
        }
        for (bs, n_val), want in cases.items():
            fit = make_fit(model.apply, cfg.n_classes, epochs=1,
                           batch_size=bs, n_train=bs, n_val=n_val)
            assert fit.eval_batch_size == want, (bs, n_val, fit.eval_batch_size)

    def test_predict_shapes(self, tiny_setup):
        cfg, model, X, Y = tiny_setup
        params, state = model.init(jax.random.PRNGKey(0))
        preds = predict(model.apply, params, state, X[:50], batch_size=16)
        assert preds.shape == (50,)
        assert preds.max() < cfg.n_classes


class TestValEvery:
    """make_fit(val_every=k): sparse validation must not change the
    train trajectory, and its val/best semantics must equal the dense
    run's restricted to the val epochs (VERDICT r3 item 4)."""

    @pytest.fixture(scope="class")
    def fitted_sparse(self, tiny_setup):
        cfg, model, X, Y = tiny_setup
        n_train, n_val = 40, 20
        fit = make_fit(
            model.apply, cfg.n_classes, epochs=EPOCHS, batch_size=16,
            n_train=n_train, n_val=n_val, learning_rate=2e-3, warmup_epochs=2,
            val_every=5,
        )
        rng = np.random.default_rng(0)
        perms = np.stack([rng.permutation(60) for _ in range(2)])
        tidx = jnp.asarray(perms[:, :n_train])
        vidx = jnp.asarray(perms[:, n_train:])
        params0, state0 = stacked_init(model, jax.random.PRNGKey(1), 2)
        keys = jax.random.split(jax.random.PRNGKey(2), 2)
        res = jax.jit(lambda *a: fit_many(fit, *a))(keys, params0, state0, tidx, vidx, X, Y)
        return jax.block_until_ready(res)

    def test_train_trajectory_identical(self, fitted, fitted_sparse):
        """Epoch keys fold in the global epoch counter, so the k=5 run's
        shuffles/params are exactly the k=1 run's."""
        for k in ("loss", "acc", "f1"):
            np.testing.assert_array_equal(
                np.asarray(fitted.history[k]), np.asarray(fitted_sparse.history[k])
            )
        for a, b in zip(jax.tree.leaves(fitted.params), jax.tree.leaves(fitted_sparse.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_val_cadence(self, fitted, fitted_sparse):
        """val metrics: NaN on skipped epochs, equal to the dense run's
        on val epochs (same params -> same eval)."""
        val_eps = np.arange(EPOCHS) % 5 == 4
        for k in ("val_loss", "val_acc", "val_f1"):
            sparse = np.asarray(fitted_sparse.history[k], dtype=np.float64)
            dense = np.asarray(fitted.history[k], dtype=np.float64)
            assert np.isnan(sparse[:, ~val_eps]).all()
            np.testing.assert_allclose(sparse[:, val_eps], dense[:, val_eps], atol=1e-6)

    def test_best_restricted_to_val_epochs(self, fitted, fitted_sparse):
        va = np.asarray(fitted.history["val_acc"], dtype=np.float64)
        val_eps = np.where(np.arange(EPOCHS) % 5 == 4)[0]
        for mi in range(va.shape[0]):
            best = va[mi, val_eps].max()
            assert np.asarray(fitted_sparse.best_val_acc)[mi] == pytest.approx(best, abs=1e-6)
            assert np.asarray(fitted_sparse.best_epoch)[mi] in val_eps

    def test_non_divisor_raises(self, tiny_setup):
        cfg, model, X, Y = tiny_setup
        with pytest.raises(ValueError):
            make_fit(model.apply, cfg.n_classes, epochs=25, batch_size=16,
                     n_train=40, n_val=20, val_every=4)


class TestCheckpoint:
    def test_state_dict_round_trip(self, small_config, tmp_dir):
        model = make_fast_model(small_config)
        params, state = model.init(jax.random.PRNGKey(0))
        path = save_state_dict(f"{tmp_dir}/w.npz", params)
        params2, _ = model.init(jax.random.PRNGKey(1))
        restored = load_state_dict(path, params2)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_prefix_stripping(self, tmp_dir):
        tree = {"lin": {"w": jnp.ones((2, 2))}}
        import numpy as _np

        _np.savez(f"{tmp_dir}/p.npz", **{"model.lin.w": _np.zeros((2, 2), _np.float32)})
        restored = load_state_dict(f"{tmp_dir}/p.npz", tree)
        np.testing.assert_array_equal(np.asarray(restored["lin"]["w"]), np.zeros((2, 2)))

    def test_shape_mismatch_raises(self, tmp_dir):
        tree = {"w": jnp.ones((2, 2))}
        import numpy as _np

        _np.savez(f"{tmp_dir}/bad.npz", w=_np.zeros((3, 3), _np.float32))
        with pytest.raises(ValueError):
            load_state_dict(f"{tmp_dir}/bad.npz", tree)


class TestEarlyStopping:
    """In-scan early stopping (reference notebook capability:
    EarlyStopping(stopping_threshold=1.0, patience=20), cell 26)."""

    def _fit(self, small_config, **es):
        from imagined_speech_decoding_tpu.models.api import make_fast_model
        from imagined_speech_decoding_tpu.train.engine import make_fit

        model = make_fast_model(small_config)
        rng = np.random.default_rng(0)
        n = 24
        X = jnp.asarray(rng.normal(size=(n, small_config.n_channels, small_config.seq_len)).astype(np.float32))
        Y = jnp.asarray(rng.integers(0, small_config.n_classes, n).astype(np.int32))
        params0, state0 = model.init(jax.random.PRNGKey(0))
        fit = make_fit(
            model.apply, small_config.n_classes, epochs=6, batch_size=8,
            n_train=16, n_val=8, warmup_epochs=1, **es,
        )
        res = jax.jit(fit)(
            jax.random.PRNGKey(1), params0, state0,
            jnp.arange(16), jnp.arange(16, 24), X, Y,
        )
        return res

    def test_threshold_freezes_model(self, small_config):
        res = self._fit(small_config, early_stop_threshold=0.0)
        va = np.asarray(res.history["val_acc"])
        # stopped after epoch 0: frozen params give a constant val curve
        assert np.allclose(va[1:], va[1]), va

    def test_patience_stops(self, small_config):
        res = self._fit(small_config, early_stop_patience=1)
        va = np.asarray(res.history["val_acc"])
        best_ep = int(res.best_epoch)
        # after best_ep + 1 epochs without improvement the curve freezes
        tail = va[best_ep + 2:]
        assert tail.size == 0 or np.allclose(tail, tail[0])

    def test_disabled_by_default(self, small_config):
        res = self._fit(small_config)
        assert np.asarray(res.history["loss"]).shape == (6,)


class TestFullBatchLOFO:
    """Full-batch fold training (reference LOFO variant,
    deprecated/BCIC2020Track3_train.py:252-396: batch_size=len(x_train),
    averaged cross-fold curves)."""

    def test_full_batch_fit_and_averaged_curves(self, small_config, tmp_path):
        from imagined_speech_decoding_tpu.models.api import make_fast_model
        from imagined_speech_decoding_tpu.train.artifacts import plot_averaged_fold_curves
        from imagined_speech_decoding_tpu.train.cv import stacked_init
        from imagined_speech_decoding_tpu.train.engine import fit_many, make_fit

        model = make_fast_model(small_config)
        rng = np.random.default_rng(0)
        n, n_train = 24, 16
        X = jnp.asarray(rng.normal(size=(n, small_config.n_channels, small_config.seq_len)).astype(np.float32))
        Y = jnp.asarray(rng.integers(0, small_config.n_classes, n).astype(np.int32))
        folds = 3
        perms = np.stack([rng.permutation(n) for _ in range(folds)])
        tidx = jnp.asarray(perms[:, :n_train])
        vidx = jnp.asarray(perms[:, n_train:])
        params0, state0 = stacked_init(model, jax.random.PRNGKey(0), folds)
        # full-batch: batch_size == n_train -> exactly 1 step per epoch
        fit = make_fit(model.apply, small_config.n_classes, epochs=4,
                       batch_size=n_train, n_train=n_train, n_val=n - n_train,
                       warmup_epochs=1)
        keys = jax.random.split(jax.random.PRNGKey(1), folds)
        res = jax.jit(lambda *a: fit_many(fit, *a))(
            keys, params0, state0, tidx, vidx, X, Y
        )
        hist = {k: np.asarray(v) for k, v in res.history.items()}
        assert hist["loss"].shape == (folds, 4)
        assert np.isfinite(hist["loss"]).all()
        out = plot_averaged_fold_curves(str(tmp_path / "avg.png"), hist, "LOFO")
        import os
        assert os.path.exists(out)


class TestSubjectGrouping:
    @pytest.mark.slow
    def test_grouped_cv_merges_artifacts(self, small_config, tmp_path):
        """subject_group_size trains groups sequentially and merges the
        summary, fit stack, and global artifacts (the HBM lever for
        big-activation models like TSception)."""
        import os

        from imagined_speech_decoding_tpu.config import TrainConfig
        from imagined_speech_decoding_tpu.data.synthetic import synthetic_corpus
        from imagined_speech_decoding_tpu.models.api import make_fast_model
        from imagined_speech_decoding_tpu.train.cv import train_per_subject_cv

        cfg = small_config
        model = make_fast_model(cfg)
        X, Y = synthetic_corpus(0, 3, 18, cfg.n_channels, cfg.seq_len, cfg.n_classes)
        subjects = ["01", "02", "03"]
        test = {sid: (X[i, :6], Y[i, :6]) for i, sid in enumerate(subjects)}
        tc = TrainConfig(max_epochs=2, batch_size=6, n_folds=2, seed=0,
                         warmup_epochs=1, precision="f32")
        out = str(tmp_path / "grouped")
        res = train_per_subject_cv(
            model, tc, X, Y, subjects, cfg.n_classes,
            test_per_subject=test, save_dir=out, verbose=False,
            subject_group_size=2,
        )
        assert list(res.summary["Subject"]) == subjects
        assert set(res.best_fold_per_subject) == set(subjects)
        # fit stack merged over all 3*2 models
        assert np.asarray(res.fit.best_val_acc).shape == (6,)
        assert np.asarray(res.fit.history["val_acc"]).shape == (6, 2)
        for sid in subjects:
            assert os.path.exists(os.path.join(out, f"sub-{sid}", "best_subject.npz"))
        assert os.path.exists(os.path.join(out, "summary_per_subject.csv"))
        # merged global predictions cover all subjects' test trials
        from imagined_speech_decoding_tpu.train.artifacts import load_predictions_csv

        pred, true = load_predictions_csv(os.path.join(out, "global_test_predictions.csv"))
        assert len(pred) == 18

    @pytest.mark.slow
    def test_grouped_matches_ungrouped_rng(self, small_config, tmp_path):
        """Global key indexing: the grouped run draws the same per-model
        init/fit keys as the ungrouped run, so results match."""
        from imagined_speech_decoding_tpu.config import TrainConfig
        from imagined_speech_decoding_tpu.data.synthetic import synthetic_corpus
        from imagined_speech_decoding_tpu.models.api import make_fast_model
        from imagined_speech_decoding_tpu.train.cv import train_per_subject_cv

        cfg = small_config
        model = make_fast_model(cfg)
        X, Y = synthetic_corpus(1, 3, 12, cfg.n_channels, cfg.seq_len, cfg.n_classes)
        subjects = ["01", "02", "03"]
        tc = TrainConfig(max_epochs=2, batch_size=6, n_folds=2, seed=3,
                         warmup_epochs=1, precision="f32")
        ref = train_per_subject_cv(model, tc, X, Y, subjects, cfg.n_classes,
                                   verbose=False)
        grp = train_per_subject_cv(model, tc, X, Y, subjects, cfg.n_classes,
                                   verbose=False, subject_group_size=1)
        np.testing.assert_allclose(
            np.asarray(grp.fit.best_val_acc), np.asarray(ref.fit.best_val_acc),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(grp.fit.history["loss"]), np.asarray(ref.fit.history["loss"]),
            rtol=1e-4, atol=1e-5,
        )
        assert grp.meta == ref.meta


class TestScheduleOverride:
    @pytest.mark.slow
    def test_custom_schedule_drives_lr(self, small_config):
        """make_fit(schedule=...) must govern the actual step sizes: an
        all-zero schedule freezes the model; the default one trains."""
        cfg = small_config
        model = make_fast_model(cfg)
        x, y = synthetic_trials(5, 20, n_channels=8, n_samples=200)
        X, Y = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
        tidx = jnp.arange(12, dtype=jnp.int32)
        vidx = jnp.arange(12, 20, dtype=jnp.int32)
        params0, state0 = model.init(jax.random.PRNGKey(0))

        def run(schedule):
            fit = make_fit(
                model.apply, cfg.n_classes, epochs=2, batch_size=6,
                n_train=12, n_val=8, learning_rate=1e-3, warmup_epochs=0,
                schedule=schedule,
            )
            return jax.jit(fit)(
                jax.random.PRNGKey(3), params0, state0, tidx, vidx, X, Y
            )

        frozen = run(lambda c: 0.0)
        moved = run(None)
        delta_frozen = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(frozen.params), jax.tree.leaves(params0))
        )
        delta_moved = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(moved.params), jax.tree.leaves(params0))
        )
        assert delta_frozen == 0.0
        assert delta_moved > 0.0
