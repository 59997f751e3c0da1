"""End-to-end tests for the baseline pipelines (BASELINE.json configs
#1 / #3 / #4) and the train-step augmentation wiring.

VERDICT r2 item 1: the parts (models, spectral ops, ``ops.augment``)
existed but nothing composed features -> model -> CV -> artifacts, and
``ops.augment`` had no production consumer. These tests drive the new
``cli/train_baselines.py`` + ``pipelines.py`` end-to-end on synthetic
data and pin the augmentation contract: augmented and unaugmented
training produce DIFFERENT trajectories while eval forwards are
bit-identical.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials
from imagined_speech_decoding_tpu.pipelines import (
    PIPELINES,
    bandpower_featurize,
    featurize_corpus,
    stft_image_featurize,
    stft_n_frames,
)

C, T, K = 8, 256, 5


@pytest.fixture(scope="module")
def trials():
    x, y = synthetic_trials(0, 20, C, T, K)
    return jnp.asarray(x), jnp.asarray(y.astype(np.int32))


class TestFeaturizers:
    def test_bandpower_shape_and_finite(self, trials):
        x, _ = trials
        f = bandpower_featurize(x, sfreq=250.0)
        assert f.shape == (20, C * 5)
        assert np.isfinite(np.asarray(f)).all()

    def test_bandpower_deterministic(self, trials):
        x, _ = trials
        a = np.asarray(bandpower_featurize(x, sfreq=250.0))
        a2 = np.asarray(bandpower_featurize(x, sfreq=250.0))
        np.testing.assert_array_equal(a, a2)  # bit-deterministic
        # jit == eager up to XLA fusion reassociation (log of small band
        # powers amplifies ulp-level PSD differences)
        b = np.asarray(jax.jit(lambda v: bandpower_featurize(v, sfreq=250.0))(x))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    def test_stft_image_shape(self, trials):
        x, _ = trials
        f = stft_image_featurize(x, sfreq=250.0)
        assert f.shape == (20, 5, C, stft_n_frames(T))
        assert np.isfinite(np.asarray(f)).all()

    def test_stft_n_frames_matches_op(self, trials):
        x, _ = trials
        f = stft_image_featurize(x[:2], sfreq=250.0)
        assert f.shape[-1] == stft_n_frames(T)

    def test_featurize_corpus_maps_test_sets(self, trials):
        x, y = trials
        X = np.asarray(x).reshape(2, 10, C, T)
        test = {"01": (np.asarray(x[:4]), np.asarray(y[:4]))}
        Xf, testf = featurize_corpus(PIPELINES["bandpower_mlp"], X, test)
        assert Xf.shape == (2, 10, C * 5)
        assert testf["01"][0].shape == (4, C * 5)
        # raw pipeline: identity pass-through
        Xr, testr = featurize_corpus(PIPELINES["cnn_bilstm"], X, test)
        assert Xr is X and testr is test


class TestPipelineModels:
    @pytest.mark.parametrize("name", sorted(PIPELINES))
    def test_model_one_train_step(self, name, trials):
        """Every pipeline's model does one engine-shaped train step over
        its own featurized input without NaNs."""
        x, y = trials
        pipe = PIPELINES[name]
        xf = pipe.featurize(x) if pipe.featurize else x
        model = pipe.make_model(C, T, K, jnp.float32)
        params, state = model.init(jax.random.PRNGKey(0))

        def loss(p):
            logits, _ = model.apply(
                p, state, xf[:8], train=True, rng=jax.random.PRNGKey(1)
            )
            onehot = jax.nn.one_hot(y[:8], K)
            return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), -1))

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


class TestAugmentedModel:
    def _model(self):
        from imagined_speech_decoding_tpu.models.api import make_augmented_model

        pipe = PIPELINES["cnn_bilstm"]
        base = pipe.make_model(C, T, K, jnp.float32)
        return base, make_augmented_model(base, noise_sigma=0.3, ch_drop=0.2)

    def test_eval_path_bit_identical(self, trials):
        x, _ = trials
        base, aug = self._model()
        params, state = base.init(jax.random.PRNGKey(0))
        lb, _ = base.apply(params, state, x[:6], train=False, rng=None)
        la, _ = aug.apply(params, state, x[:6], train=False, rng=None)
        np.testing.assert_array_equal(np.asarray(lb), np.asarray(la))

    def test_train_forward_differs(self, trials):
        x, _ = trials
        base, aug = self._model()
        params, state = base.init(jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(7)
        lb, _ = base.apply(params, state, x[:6], train=True, rng=rng)
        la, _ = aug.apply(params, state, x[:6], train=True, rng=rng)
        assert not np.allclose(np.asarray(lb), np.asarray(la))

    def test_train_requires_rng(self, trials):
        x, _ = trials
        base, aug = self._model()
        params, state = base.init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="rng"):
            aug.apply(params, state, x[:6], train=True, rng=None)

    def test_trajectories_diverge_in_engine(self, trials):
        """Full engine fits: augmented vs unaugmented training histories
        differ (the augmentation really runs inside the jitted step),
        and the augmented run still trains (finite losses)."""
        from imagined_speech_decoding_tpu.train.engine import make_fit

        x, y = trials
        base, aug = self._model()
        params, state = base.init(jax.random.PRNGKey(0))
        kw = dict(epochs=2, batch_size=8, n_train=16, n_val=4, warmup_epochs=1)
        tr, va = jnp.arange(16), jnp.arange(16, 20)
        key = jax.random.PRNGKey(3)

        r_base = jax.jit(make_fit(base.apply, K, **kw))(key, params, state, tr, va, x, y)
        r_aug = jax.jit(make_fit(aug.apply, K, **kw))(key, params, state, tr, va, x, y)
        assert not np.allclose(
            np.asarray(r_base.history["loss"]), np.asarray(r_aug.history["loss"])
        )
        assert np.isfinite(np.asarray(r_aug.history["loss"])).all()


class TestTrainBaselinesCLI:
    @pytest.mark.parametrize(
        "name,extra",
        [
            ("bandpower_mlp", []),
            pytest.param("stft_eegnet", [], marks=pytest.mark.slow),
            pytest.param("cnn_bilstm", ["--augment"], marks=pytest.mark.slow),
        ],
    )
    def test_synthetic_e2e(self, name, extra, tmp_path):
        from imagined_speech_decoding_tpu.cli.train_baselines import main

        out = str(tmp_path / name)
        result = main([
            "--pipeline", name, "--synthetic", "2", "--synthetic_trials", "15",
            "--epochs", "2", "--batch_size", "8", "--n_folds", "3",
            "--precision", "f32", "--output_dir", out, *extra,
        ])
        assert len(result.summary) == 2
        assert ((result.summary["Test_Acc"] >= 0) & (result.summary["Test_Acc"] <= 1)).all()
        # reference artifact tree (scripts/train_fast.py:229-258 layout)
        assert os.path.exists(os.path.join(out, "summary_per_subject.csv"))
        assert os.path.exists(os.path.join(out, "global_test_predictions.csv"))
        for sid in ("01", "02"):
            sub = os.path.join(out, f"sub-{sid}")
            assert os.path.exists(os.path.join(sub, "fold_metrics.csv"))
            assert os.path.exists(os.path.join(sub, "best_subject.npz"))
            assert os.path.exists(os.path.join(sub, "test_predictions.csv"))

    @pytest.mark.slow
    def test_subject_group_produces_same_artifact_tree(self, tmp_path):
        """--subject_group (the HBM lever for cnn_bilstm at real
        geometry) still writes the full per-subject tree."""
        from imagined_speech_decoding_tpu.cli.train_baselines import main

        out = str(tmp_path / "grouped")
        result = main([
            "--pipeline", "cnn_bilstm", "--synthetic", "2",
            "--synthetic_trials", "12", "--epochs", "1", "--batch_size", "8",
            "--n_folds", "3", "--precision", "f32", "--subject_group", "1",
            "--output_dir", out,
        ])
        assert len(result.summary) == 2
        for sid in ("01", "02"):
            assert os.path.exists(os.path.join(out, f"sub-{sid}", "fold_metrics.csv"))
        assert os.path.exists(os.path.join(out, "global_test_predictions.csv"))

    def test_augment_rejected_for_feature_pipelines(self):
        from imagined_speech_decoding_tpu.cli.train_baselines import main

        with pytest.raises(SystemExit):
            main(["--pipeline", "bandpower_mlp", "--synthetic", "1", "--augment"])

    def test_augment_flag_on_raw_input_clis(self):
        """The raw-EEG training CLIs all expose the augmentation flags."""
        from imagined_speech_decoding_tpu.cli import train_fast, train_tsception

        for mod in (train_fast, train_tsception):
            args = mod.build_parser().parse_args(
                ["--augment", "--noise_sigma", "0.2", "--ch_drop", "0.05"]
            )
            assert args.augment and args.noise_sigma == 0.2 and args.ch_drop == 0.05
