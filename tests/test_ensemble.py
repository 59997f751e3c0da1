"""Seed-ensemble tests (``train.ensemble``): soft-voting math, member
independence, member-0 == single-run reproducibility, artifact tree."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.config import TrainConfig
from imagined_speech_decoding_tpu.data.synthetic import synthetic_corpus
from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.train.checkpoint import select_model
from imagined_speech_decoding_tpu.train.engine import predict, predict_proba
from imagined_speech_decoding_tpu.train.ensemble import (
    member_seed,
    train_seed_ensemble,
)
from imagined_speech_decoding_tpu.train.cv import train_per_subject_cv


def _tiny_problem(cfg, n_subjects=2, n_trials=12, seed=0):
    X, Y = synthetic_corpus(seed, n_subjects, n_trials, cfg.n_channels,
                            cfg.seq_len, cfg.n_classes)
    subjects = [f"{i + 1:02d}" for i in range(n_subjects)]
    test = {sid: (X[i, :6], Y[i, :6]) for i, sid in enumerate(subjects)}
    tc = TrainConfig(max_epochs=2, batch_size=6, n_folds=2, seed=7,
                     warmup_epochs=1, precision="f32")
    return X, Y, subjects, test, tc


class TestPredictProba:
    def test_argmax_matches_predict(self, small_config):
        model = make_fast_model(small_config)
        params, state = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(
            size=(10, small_config.n_channels, small_config.seq_len)
        ).astype(np.float32))
        proba = predict_proba(model.apply, params, state, x, batch_size=4)
        pred = predict(model.apply, params, state, x, batch_size=4)
        assert proba.shape == (10, small_config.n_classes)
        np.testing.assert_allclose(proba.sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_array_equal(proba.argmax(-1), pred)


class TestSeedEnsemble:
    def test_member_seed_zero_identity(self):
        assert member_seed(42, 0) == 42
        assert len({member_seed(42, e) for e in range(10)}) == 10

    @pytest.mark.slow
    def test_ensemble_end_to_end(self, small_config, tmp_path):
        """2-member ensemble: member 0 reproduces the plain single run,
        members draw different weights, the root tree holds the ensemble
        decision, and that decision equals the hand-computed soft vote."""
        cfg = small_config
        model = make_fast_model(cfg)
        X, Y, subjects, test, tc = _tiny_problem(cfg)
        out = str(tmp_path / "ens")
        res = train_seed_ensemble(
            model, tc, X, Y, subjects, cfg.n_classes,
            test_per_subject=test, save_dir=out, n_members=2, verbose=False,
        )
        assert len(res.members) == 2
        assert list(res.summary["Subject"]) == subjects

        # --- member 0 == plain single run (identical folds AND weights)
        single = train_per_subject_cv(
            model, tc, X, Y, subjects, cfg.n_classes,
            test_per_subject=test, verbose=False,
        )
        np.testing.assert_allclose(
            np.asarray(res.members[0].fit.best_val_acc),
            np.asarray(single.fit.best_val_acc), rtol=1e-6,
        )
        assert res.members[0].best_fold_per_subject == single.best_fold_per_subject

        # --- members drew different weights (some leaves are
        # zero-initialized biases; any differing leaf proves divergence)
        leaves0 = jax.tree.leaves(res.members[0].fit.best_params)
        leaves1 = jax.tree.leaves(res.members[1].fit.best_params)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves0, leaves1)
        )

        # --- soft-vote math: root predictions == argmax(mean member proba)
        k = tc.n_folds
        from imagined_speech_decoding_tpu.train.artifacts import load_predictions_csv

        for si, sid in enumerate(subjects):
            x_test, y_test = test[sid]
            probs = []
            for m in res.members:
                bm = si * k + m.best_fold_per_subject[sid]
                probs.append(predict_proba(
                    model.apply,
                    select_model(m.fit.best_params, bm),
                    select_model(m.fit.best_model_state, bm),
                    jnp.asarray(x_test), tc.batch_size,
                ))
            expected = np.mean(np.stack(probs), axis=0)
            np.testing.assert_allclose(res.proba_per_subject[sid], expected, rtol=1e-6)
            y_pred, y_true = load_predictions_csv(
                os.path.join(out, f"sub-{sid}", "test_predictions.csv")
            )
            np.testing.assert_array_equal(y_pred, expected.argmax(-1))
            np.testing.assert_array_equal(y_true, y_test.astype(int))

        # --- artifact tree: ensemble at root, full member trees below
        assert os.path.exists(os.path.join(out, "summary_per_subject.csv"))
        assert os.path.exists(os.path.join(out, "global_test_predictions.csv"))
        assert os.path.exists(os.path.join(out, "global_subject_accuracy.png"))
        for e in range(2):
            for sid in subjects:
                assert os.path.exists(os.path.join(
                    out, f"member-{e}", f"sub-{sid}", "best_subject.npz"))
            assert os.path.exists(os.path.join(
                out, f"member-{e}", "summary_per_subject.csv"))

        # --- summary sanity: accs are probabilities, F1 defined
        acc = res.summary["Test_Acc"].to_numpy()
        assert np.all((acc >= 0) & (acc <= 1))
        assert res.summary["Member_Mean_Test_Acc"].notna().all()

    def test_rejects_zero_members(self, small_config):
        model = make_fast_model(small_config)
        X, Y, subjects, test, tc = _tiny_problem(small_config)
        with pytest.raises(ValueError):
            train_seed_ensemble(model, tc, X, Y, subjects,
                                small_config.n_classes, n_members=0)
