"""Fused Conv4Layers Pallas head: interpret-mode equivalence vs the XLA
reference path — forward, parameter grads, and input grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import imagined_speech_decoding_tpu.models.fast as fast_mod
from imagined_speech_decoding_tpu.config import FASTConfig
from imagined_speech_decoding_tpu.models.fast import fast_apply, fast_init

ELECTRODES = tuple(f"E{i}" for i in range(10))
ZONES = {
    "A": ("E0", "E1", "E2"),
    "B": ("E3", "E4"),
    "C": ("E5", "E6", "E7", "E8"),
    "D": ("E9",),
}


@pytest.fixture(scope="module")
def cfg():
    return FASTConfig(
        electrodes=ELECTRODES, zone_dict=ZONES, dim_cnn=8, dim_token=16,
        seq_len=200, window_len=100, slide_step=50, head="Conv4Layers",
        n_classes=5, num_layers=1, num_heads=4, dropout=0.0,
    )


@pytest.fixture(scope="module")
def setup(cfg):
    params, state = fast_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 10, 150)).astype(np.float32)
    )
    y = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    return params, state, x, y


def _loss(params, state, x, y, cfg, use_pallas):
    fast_mod.PALLAS_HEAD = use_pallas
    try:
        logits, _ = fast_apply(params, state, x, cfg, train=True, rng=None)
    finally:
        fast_mod.PALLAS_HEAD = None
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1)), logits


class TestFusedHeadParity:
    def test_forward_matches_xla(self, setup, cfg):
        params, state, x, y = setup
        with pltpu.force_tpu_interpret_mode():
            _, logits_p = _loss(params, state, x, y, cfg, True)
        _, logits_x = _loss(params, state, x, y, cfg, False)
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(logits_x), rtol=1e-5, atol=1e-6
        )

    @pytest.mark.slow
    def test_param_grads_match_xla(self, setup, cfg):
        params, state, x, y = setup
        with pltpu.force_tpu_interpret_mode():
            g_p = jax.grad(lambda p: _loss(p, state, x, y, cfg, True)[0])(params)
        g_x = jax.grad(lambda p: _loss(p, state, x, y, cfg, False)[0])(params)

        def rel(a, b):
            return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12))

        errs = jax.tree.map(rel, g_p, g_x)
        assert max(jax.tree.leaves(errs)) < 1e-4, errs

    @pytest.mark.slow
    def test_input_grads_match_xla(self, setup, cfg):
        params, state, x, y = setup
        with pltpu.force_tpu_interpret_mode():
            gx_p = jax.grad(lambda xx: _loss(params, state, xx, y, cfg, True)[0])(x)
        gx_x = jax.grad(lambda xx: _loss(params, state, xx, y, cfg, False)[0])(x)
        denom = float(jnp.abs(gx_x).max())
        assert float(jnp.abs(gx_p - gx_x).max()) / denom < 1e-4

    @pytest.mark.slow
    def test_vmap_over_models(self, setup, cfg):
        """The engine vmaps the head over a model stack — the kernel must
        batch correctly (grid-dim prepend), including under grad."""
        params, state, x, y = setup
        m = 3
        keys = jax.random.split(jax.random.PRNGKey(1), m)
        stacked = jax.vmap(lambda k: fast_init(k, cfg)[0])(keys)

        def loss_of(p, use):
            return _loss(p, state, x, y, cfg, use)[0]

        with pltpu.force_tpu_interpret_mode():
            l_p = jax.vmap(lambda p: loss_of(p, True))(stacked)
            g_p = jax.vmap(jax.grad(lambda p: loss_of(p, True)))(stacked)
        l_x = jax.vmap(lambda p: loss_of(p, False))(stacked)
        g_x = jax.vmap(jax.grad(lambda p: loss_of(p, False)))(stacked)
        np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )

    @pytest.mark.slow
    def test_ragged_batch_falls_back_cleanly(self, setup, cfg):
        """Odd batch sizes pick a smaller block divisor (down to 1)."""
        params, state, x, y = setup
        x7 = x[:5]
        with pltpu.force_tpu_interpret_mode():
            fast_mod.PALLAS_HEAD = True
            try:
                logits_p, _ = fast_apply(params, state, x7, cfg, train=False)
            finally:
                fast_mod.PALLAS_HEAD = None
        logits_x, _ = fast_apply(params, state, x7, cfg, train=False)
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(logits_x), rtol=1e-5, atol=1e-6
        )
