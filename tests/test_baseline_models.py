"""Baseline model zoo tests: TSception, EEGNet, CNN-BiLSTM, MLP,
classical CSP pipeline — shapes, gradient flow, learning on synthetic
data, torch-semantics helpers (adaptive pooling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.data import synthetic_trials
from imagined_speech_decoding_tpu.models import (
    CSPClassifierPipeline,
    make_cnn_bilstm_model,
    make_eegnet_model,
    make_mlp_model,
    make_tsception_model,
)
from imagined_speech_decoding_tpu.models.tsception import adaptive_avg_pool_w
from imagined_speech_decoding_tpu.models.rnn import bilstm_apply, bilstm_init


C, T, K = 16, 256, 5


@pytest.fixture(scope="module")
def trials():
    x, y = synthetic_trials(0, 24, n_channels=C, n_samples=T, snr=2.0)
    return jnp.asarray(x), jnp.asarray(y.astype(np.int32))


MODELS = {
    "tsception": lambda: make_tsception_model(C, T, K),
    "eegnet": lambda: make_eegnet_model(C, T, K),
    "cnn_bilstm": lambda: make_cnn_bilstm_model(C, T, K),
}


class TestTrainableBaselines:
    @pytest.mark.parametrize("name", list(MODELS))
    def test_forward_shapes(self, name, trials):
        x, y = trials
        model = MODELS[name]()
        params, state = model.init(jax.random.PRNGKey(0))
        logits, new_state = model.apply(params, state, x, train=False, rng=None)
        assert logits.shape == (24, K)
        assert np.isfinite(np.asarray(logits)).all()

    @pytest.mark.parametrize("name", list(MODELS))
    def test_train_mode_with_rng(self, name, trials):
        x, y = trials
        model = MODELS[name]()
        params, state = model.init(jax.random.PRNGKey(0))
        logits, new_state = model.apply(params, state, x, train=True, rng=jax.random.PRNGKey(1))
        assert logits.shape == (24, K)
        # BN-bearing models must update running stats in train mode
        before, after = jax.tree.leaves(state), jax.tree.leaves(new_state)
        if before:
            assert any(
                not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(after, before)
            )

    @pytest.mark.parametrize("name", list(MODELS))
    def test_gradients_flow(self, name, trials):
        x, y = trials
        model = MODELS[name]()
        params, state = model.init(jax.random.PRNGKey(0))

        def loss(p):
            logits, _ = model.apply(p, state, x[:8], train=False, rng=None)
            return jnp.sum(logits**2)

        g = jax.grad(loss)(params)
        nonzero = [float(jnp.abs(v).max()) > 0 for v in jax.tree.leaves(g)]
        assert sum(nonzero) >= len(nonzero) - 2  # BN biases etc. may be exactly 0


class TestMLP:
    def test_forward_and_grads(self):
        model = make_mlp_model(d_in=40, n_classes=K)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 40)).astype(np.float32))
        logits, _ = model.apply(params, state, x, train=True, rng=jax.random.PRNGKey(1))
        assert logits.shape == (10, K)
        g = jax.grad(lambda p: jnp.sum(model.apply(p, state, x)[0] ** 2))(params)
        assert all(float(jnp.abs(v).max()) > 0 for v in jax.tree.leaves(g))


class TestAdaptivePool:
    def test_matches_torch_semantics(self):
        """torch AdaptiveAvgPool2d((None, 8)) bin-boundary parity."""
        import torch

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 4, 13)).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool_w(jnp.asarray(x), 8))
        ref = torch.nn.AdaptiveAvgPool2d((None, 8))(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestBiLSTM:
    def test_output_shapes(self):
        params = bilstm_init(jax.random.PRNGKey(0), d_in=8, d_hidden=16)
        xs = jnp.asarray(np.random.default_rng(0).normal(size=(3, 10, 8)).astype(np.float32))
        outs, final = bilstm_apply(params, xs)
        assert outs.shape == (3, 10, 32)
        assert final.shape == (3, 32)

    def test_matches_torch_lstm(self):
        """Forward-direction LSTM parity with torch.nn.LSTM."""
        import torch

        from imagined_speech_decoding_tpu.models.rnn import lstm_init, lstm_scan

        d_in, d_h = 6, 5
        params = lstm_init(jax.random.PRNGKey(0), d_in, d_h)
        ref = torch.nn.LSTM(d_in, d_h, batch_first=True)
        sd = ref.state_dict()
        sd["weight_ih_l0"] = torch.from_numpy(np.asarray(params["wi"]).T.copy())
        sd["weight_hh_l0"] = torch.from_numpy(np.asarray(params["wh"]).T.copy())
        sd["bias_ih_l0"] = torch.from_numpy(np.asarray(params["bi"]).copy())
        sd["bias_hh_l0"] = torch.from_numpy(np.asarray(params["bh"]).copy())
        ref.load_state_dict(sd)

        xs = np.random.default_rng(1).normal(size=(2, 7, d_in)).astype(np.float32)
        ours, final = lstm_scan(params, jnp.asarray(xs))
        with torch.no_grad():
            ref_out, (ref_h, _) = ref(torch.from_numpy(xs))
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(final), ref_h[0].numpy(), rtol=1e-4, atol=1e-5)


class TestClassicalPipeline:
    def test_fit_predict_svm(self):
        x, y = synthetic_trials(0, 60, n_channels=8, n_samples=250, snr=3.0)
        pipe = CSPClassifierPipeline(n_classes=5, filter_method="iir", l_freq=2.0, h_freq=45.0)
        pipe.fit(x[:40], y[:40])
        preds = pipe.predict(x[40:])
        assert preds.shape == (20,)
        acc = pipe.score(x[40:], y[40:])
        assert acc > 0.2  # must beat chance-ish on separable synthetic data

    def test_filterbank_lda(self):
        x, y = synthetic_trials(1, 50, n_channels=8, n_samples=250, snr=3.0)
        pipe = CSPClassifierPipeline(
            n_classes=5, classifier="lda", filter_method="iir",
            bands=[(4, 8), (8, 16), (16, 30)], n_components=5,
        )
        pipe.fit(x[:40], y[:40])
        assert len(pipe.csp_models) == 3
        acc = pipe.score(x[40:], y[40:])
        assert 0.0 <= acc <= 1.0

    def test_unfitted_raises(self):
        pipe = CSPClassifierPipeline()
        with pytest.raises(RuntimeError):
            pipe.predict(np.zeros((2, 8, 100), np.float32))

    def test_save_load_round_trip(self, tmp_dir):
        x, y = synthetic_trials(2, 40, n_channels=6, n_samples=200, snr=3.0)
        pipe = CSPClassifierPipeline(n_classes=5, filter_method="iir", n_components=5)
        pipe.fit(x, y)
        path = pipe.save(f"{tmp_dir}/pipe.joblib")
        pipe2 = CSPClassifierPipeline.load(path)
        np.testing.assert_array_equal(pipe.predict(x[:5]), pipe2.predict(x[:5]))


class TestSampleWeightedBN:
    """Zero-weight padding rows must not touch BatchNorm statistics:
    applying a model to [real rows + padded rows, weights 0 on padding]
    must give the real rows the same logits and the same new BN state as
    applying it to the real rows alone (the reference's ragged
    drop_last=False final-batch semantics)."""

    @pytest.mark.parametrize("name", list(MODELS))
    def test_padded_equals_ragged(self, name, trials):
        x, _ = trials
        model = MODELS[name]()
        params, state = model.init(jax.random.PRNGKey(0))
        real = x[:6]
        padded = jnp.concatenate([real, x[:2]], axis=0)  # duplicate rows
        w = jnp.asarray([1.0] * 6 + [0.0] * 2, jnp.float32)

        ref_logits, ref_state = model.apply(params, state, real, train=True, rng=None)
        out_logits, out_state = model.apply(
            params, state, padded, train=True, rng=None, sample_weight=w
        )
        np.testing.assert_allclose(
            np.asarray(out_logits[:6]), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
        )
        for a, b in zip(jax.tree.leaves(out_state), jax.tree.leaves(ref_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_engine_passes_weights(self):
        """One full fit step with a ragged final batch: BN running stats
        must equal a manual weighted-apply over the same batches."""
        from imagined_speech_decoding_tpu.train.engine import fit_many, make_fit
        from imagined_speech_decoding_tpu.train.cv import stacked_init

        model = make_eegnet_model(C, T, K)
        rng = np.random.default_rng(5)
        n = 10  # batch_size 8 -> batches of 8 and 2(+6 padding)
        X = jnp.asarray(rng.normal(size=(n, C, T)).astype(np.float32))
        Y = jnp.asarray(rng.integers(0, K, n).astype(np.int32))
        fit = make_fit(model.apply, K, epochs=1, batch_size=8, n_train=n,
                       n_val=n, warmup_epochs=1)
        params0, state0 = stacked_init(model, jax.random.PRNGKey(0), 1)
        keys = jax.random.split(jax.random.PRNGKey(1), 1)
        idx = jnp.arange(n)[None]
        res = jax.jit(lambda *a: fit_many(fit, *a))(
            keys, params0, state0, idx, idx, X, Y
        )
        # BN running stats must be finite and changed from init
        leaves = jax.tree.leaves(res.model_state)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(res.model_state), jax.tree.leaves(state0))
        )


class TestEEGNetOddLengths:
    @pytest.mark.parametrize("t", [795, 800, 250, 500])
    def test_classifier_sized_for_any_length(self, t):
        """The analytic classifier input length must match the forward
        for lengths where ((T+1)//4) % 8 straddles the +1 from the
        sep_depth 'same' conv (e.g. the raw 795-sample trials)."""
        model = make_eegnet_model(C, t, K)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, C, t)).astype(np.float32))
        logits, _ = model.apply(params, state, x, train=False, rng=None)
        assert logits.shape == (3, K)
