"""FAST model tests: shapes for all forward modes, token-count math,
gradient flow (incl. the stop-gradient mode), masked-zone equivalence
with a ragged per-zone computation, per-head-family checks.

Mirrors the strata of the reference ``tests/test_model.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.models import (
    HEAD_REGISTRY,
    attention_block_apply,
    attention_block_init,
    fast_apply,
    fast_batched_forward_head,
    fast_forward_head,
    fast_init,
    param_count,
)
from imagined_speech_decoding_tpu.models.heads import get_head
from imagined_speech_decoding_tpu.ops.windowing import zone_gather


@pytest.fixture(scope="module")
def small_model(request):
    cfg = request.getfixturevalue("small_config")
    params, state = fast_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


class TestForwardModes:
    @pytest.mark.parametrize("mode", ["default", "train_head", "train_transformer"])
    def test_logits_shape(self, small_model, dummy_eeg_small, mode):
        cfg, params, state = small_model
        logits, new_state = fast_apply(
            params, state, jnp.asarray(dummy_eeg_small), cfg, forward_mode=mode
        )
        assert logits.shape == (6, cfg.n_classes)
        assert np.isfinite(np.asarray(logits)).all()

    def test_unknown_mode_raises(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        with pytest.raises(NotImplementedError):
            fast_apply(params, state, jnp.asarray(dummy_eeg_small), cfg, forward_mode="bogus")

    def test_full_config_forward(self, model_config, dummy_eeg_batch):
        params, state = fast_init(jax.random.PRNGKey(1), model_config)
        logits, _ = fast_apply(params, state, jnp.asarray(dummy_eeg_batch), model_config)
        assert logits.shape == (4, 5)
        # ~0.19 M params at the canonical config (SURVEY.md appendix) — the
        # dense C_max zone layout carries extra (inert) spatial-conv rows.
        n = param_count(params)
        assert 150_000 < n < 400_000


class TestTokenizer:
    def test_token_count(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        feat, _ = fast_forward_head(params, state, jnp.asarray(dummy_eeg_small), cfg)
        assert feat.shape == (6, cfg.n_tokens, cfg.n_zones, cfg.dim_cnn)
        assert cfg.n_tokens == (cfg.seq_len - cfg.window_len) // cfg.slide_step + 1

    def test_step_override_changes_tokens(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        feat, _ = fast_forward_head(
            params, state, jnp.asarray(dummy_eeg_small), cfg, step_override=25
        )
        expected = (cfg.seq_len - cfg.window_len) // 25 + 1
        assert feat.shape[1] == expected

    def test_batched_forward_head_matches(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        full, _ = fast_forward_head(params, state, jnp.asarray(dummy_eeg_small), cfg)
        batched = fast_batched_forward_head(
            params, state, jnp.asarray(dummy_eeg_small), cfg, micro_batch=2
        )
        np.testing.assert_allclose(np.asarray(full), np.asarray(batched), rtol=1e-5, atol=1e-5)


class TestGradients:
    def _loss(self, params, state, x, cfg, mode):
        logits, _ = fast_apply(params, state, x, cfg, forward_mode=mode, train=False)
        return jnp.sum(logits**2)

    def test_all_params_get_grads_default(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        g = jax.grad(self._loss)(params, state, jnp.asarray(dummy_eeg_small), cfg, "default")
        flat = jax.tree.leaves_with_path(g)
        zero = [jax.tree_util.keystr(k) for k, v in flat if float(jnp.abs(v).max()) == 0.0]
        # Only the padded spatial-conv rows may carry zero grad; whole-leaf
        # zeros indicate disconnected parameters.
        assert not zero, f"zero-grad leaves: {zero}"

    def test_head_frozen_in_train_transformer(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        g = jax.grad(self._loss)(
            params, state, jnp.asarray(dummy_eeg_small), cfg, "train_transformer"
        )
        head_grads = jax.tree.leaves(g["head"])
        assert all(float(jnp.abs(h).max()) == 0.0 for h in head_grads)
        trunk_grads = jax.tree.leaves(g["blocks"])
        assert any(float(jnp.abs(t).max()) > 0.0 for t in trunk_grads)

    def test_transformer_unused_in_train_head(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        g = jax.grad(self._loss)(params, state, jnp.asarray(dummy_eeg_small), cfg, "train_head")
        assert all(float(jnp.abs(t).max()) == 0.0 for t in jax.tree.leaves(g["blocks"]))
        assert any(float(jnp.abs(h).max()) > 0.0 for h in jax.tree.leaves(g["head"]))


class TestAttentionBlock:
    def test_shape_preserved(self):
        p = attention_block_init(jax.random.PRNGKey(0), 16, 32)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 16)).astype(np.float32))
        y = attention_block_apply(p, x, num_heads=4)
        assert y.shape == x.shape

    def test_residual_at_zero_weights(self):
        p = attention_block_init(jax.random.PRNGKey(0), 16, 32)
        p = jax.tree.map(jnp.zeros_like, p)
        x = jnp.ones((1, 3, 16))
        y = attention_block_apply(p, x, num_heads=4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


class TestMaskedZoneEquivalence:
    """The dense mask-padded zone encoders must equal a ragged computation
    that slices out only each zone's real channels."""

    @pytest.mark.parametrize("head_name", list(HEAD_REGISTRY))
    def test_padded_equals_ragged(self, head_name):
        from imagined_speech_decoding_tpu.data.constants import zone_layout

        electrodes = tuple(f"E{i}" for i in range(6))
        zones = {"A": ("E0", "E1", "E2", "E3"), "B": ("E4", "E5")}
        layout = zone_layout(electrodes, zones)
        enc = get_head(head_name)

        t = 128
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, 6, t)).astype(np.float32))
        xz, zmask = zone_gather(x, layout.indices, layout.mask)

        for zi, zname in enumerate(layout.names):
            c_real = int(layout.counts[zi])
            key = jax.random.PRNGKey(zi)
            # Padded encoder at full width.
            p_pad, s_pad = enc.init(key, layout.c_max, 8, t)
            feat_pad, _ = enc.apply(
                p_pad, s_pad, xz[:, zi], jnp.asarray(layout.mask[zi], jnp.float32), train=True
            )
            # Ragged encoder: same params, spatial-conv kernel truncated to
            # the real width; input is only the real channels.
            p_ragged = jax.tree.map(lambda v: v, p_pad)
            for k, sub in p_ragged.items():
                if isinstance(sub, dict) and "w" in sub and sub["w"].ndim == 4:
                    if sub["w"].shape[2] == layout.c_max:
                        sub["w"] = sub["w"][:, :, :c_real, :]
            x_real = xz[:, zi, :c_real]
            feat_ragged, _ = enc.apply(
                p_ragged, s_pad, x_real, jnp.ones((c_real,), jnp.float32), train=True
            )
            np.testing.assert_allclose(
                np.asarray(feat_pad), np.asarray(feat_ragged), rtol=2e-4, atol=2e-4,
                err_msg=f"head={head_name} zone={zname}",
            )


class TestFusedFullseqEquivalence:
    """The production Conv4Layers fast path (fused first conv over the
    FULL sequence, windows sliced from its output) must equal the
    per-window fused path and the gather+vmap reference path — values
    and gradients."""

    def _setup(self):
        from imagined_speech_decoding_tpu.data.constants import zone_layout
        from imagined_speech_decoding_tpu.models.heads import head_init

        electrodes = tuple(f"E{i}" for i in range(10))
        zones = {
            "A": ("E0", "E1", "E2", "E3"),
            "B": ("E4", "E5"),
            "C": ("E6", "E7", "E8", "E9"),
        }
        layout = zone_layout(electrodes, zones)
        params, _ = head_init(jax.random.PRNGKey(3), "Conv4Layers",
                              layout.n_zones, layout.c_max, 8, 64)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(3, 10, 160)).astype(np.float32))
        return layout, params, x

    def test_fullseq_equals_windowed(self):
        from imagined_speech_decoding_tpu.models.heads import (
            conv4layers_fused_all_zones,
            conv4layers_fused_all_zones_fullseq,
        )
        from imagined_speech_decoding_tpu.ops.windowing import sliding_window

        layout, params, x = self._setup()
        window_len, step = 64, 32
        n = (x.shape[-1] - window_len) // step + 1

        full = conv4layers_fused_all_zones_fullseq(
            params, x, layout.indices, layout.mask, window_len, step
        )
        w = sliding_window(x, window_len, step)  # (B, C, N, W)
        w = jnp.moveaxis(w, 2, 1).reshape(x.shape[0] * n, x.shape[1], window_len)
        per_window = conv4layers_fused_all_zones(
            params, w, layout.indices, layout.mask
        ).reshape(x.shape[0], n, layout.n_zones, 8)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(per_window), rtol=1e-5, atol=1e-5
        )

    def test_fullseq_equals_gather_vmap(self):
        from imagined_speech_decoding_tpu.models.heads import (
            conv4layers_fused_all_zones_fullseq,
            head_apply,
        )
        from imagined_speech_decoding_tpu.ops.windowing import sliding_window

        layout, params, x = self._setup()
        window_len, step = 64, 32
        n = (x.shape[-1] - window_len) // step + 1

        full = conv4layers_fused_all_zones_fullseq(
            params, x, layout.indices, layout.mask, window_len, step
        )
        w = sliding_window(x, window_len, step)
        w = jnp.moveaxis(w, 2, 1).reshape(x.shape[0] * n, x.shape[1], window_len)
        xz, zmask = zone_gather(w, layout.indices, layout.mask)
        ref, _ = head_apply("Conv4Layers", params, {}, xz, zmask, train=False)
        ref = ref.reshape(x.shape[0], n, layout.n_zones, 8)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.parametrize("first", ["gemm", "conv"])
    @pytest.mark.parametrize(
        "tails",
        ["patches", "pertap", "conv", "convnhwc", "nhwc2", "dense", "dense_g2",
         "dense_g4", "dense_s2", "dense_s4", "fullseq", "conv2", "conv2c",
         "dense2", "fullseq2"],
    )
    def test_formulations_agree(self, first, tails, monkeypatch):
        """All first-conv x tails formulation knobs compute the same head."""
        from imagined_speech_decoding_tpu.models.heads import (
            conv4layers_fused_all_zones_fullseq,
        )

        layout, params, x = self._setup()
        monkeypatch.delenv("ISD_CONV4_FIRST", raising=False)
        monkeypatch.delenv("ISD_CONV4_TAILS", raising=False)
        ref = np.asarray(conv4layers_fused_all_zones_fullseq(
            params, x, layout.indices, layout.mask, 64, 32
        ))
        monkeypatch.setenv("ISD_CONV4_FIRST", first)
        monkeypatch.setenv("ISD_CONV4_TAILS", tails)
        out = np.asarray(conv4layers_fused_all_zones_fullseq(
            params, x, layout.indices, layout.mask, 64, 32
        ))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("tails", ["dense_g2", "dense_g4", "dense_s2", "dense_s4"])
    def test_partial_dense_grouping_agrees(self, tails, monkeypatch):
        """The partially de-grouped tails (G groups of Z/G zones on the
        block diagonal) must equal the grouped reference on a geometry
        where G actually divides Z (the 3-zone fixture above falls back
        to g=1, so this uses 4 zones)."""
        from imagined_speech_decoding_tpu.data.constants import zone_layout
        from imagined_speech_decoding_tpu.models.heads import (
            conv4layers_fused_all_zones_fullseq,
            head_init,
        )

        electrodes = tuple(f"E{i}" for i in range(12))
        zones = {
            "A": ("E0", "E1", "E2"),
            "B": ("E3", "E4"),
            "C": ("E5", "E6", "E7", "E8"),
            "D": ("E9", "E10", "E11"),
        }
        layout = zone_layout(electrodes, zones)
        params, _ = head_init(jax.random.PRNGKey(5), "Conv4Layers",
                              layout.n_zones, layout.c_max, 8, 64)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(3, 12, 160)).astype(np.float32))
        monkeypatch.delenv("ISD_CONV4_FIRST", raising=False)
        monkeypatch.delenv("ISD_CONV4_TAILS", raising=False)
        ref = np.asarray(conv4layers_fused_all_zones_fullseq(
            params, x, layout.indices, layout.mask, 64, 32
        ))
        monkeypatch.setenv("ISD_CONV4_TAILS", tails)
        out = np.asarray(conv4layers_fused_all_zones_fullseq(
            params, x, layout.indices, layout.mask, 64, 32
        ))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize(
        "tails",
        [None, "fullseq", "conv2", "conv2c", "dense2", "fullseq2", "nhwc2",
         "dense", "dense_g2", "dense_s2"],
    )
    def test_fullseq_gradients_match_windowed(self, tails, monkeypatch):
        from imagined_speech_decoding_tpu.models.heads import (
            conv4layers_fused_all_zones,
            conv4layers_fused_all_zones_fullseq,
        )
        from imagined_speech_decoding_tpu.ops.windowing import sliding_window

        layout, params, x = self._setup()
        window_len, step = 64, 32
        n = (x.shape[-1] - window_len) // step + 1

        def loss_full(p):
            f = conv4layers_fused_all_zones_fullseq(
                p, x, layout.indices, layout.mask, window_len, step
            )
            return jnp.sum(f * f)

        def loss_win(p):
            w = sliding_window(x, window_len, step)
            w = jnp.moveaxis(w, 2, 1).reshape(x.shape[0] * n, x.shape[1], window_len)
            f = conv4layers_fused_all_zones(p, w, layout.indices, layout.mask)
            return jnp.sum(f * f)

        # Reference gradients ALWAYS come from the two-stage windowed
        # path — so each parametrized formulation's gradients (incl. the
        # composed-kernel edge corrections) are cross-checked against an
        # independent implementation, never against themselves.
        monkeypatch.setenv("ISD_CONV4_TAILS", "conv")
        g_win = jax.grad(loss_win)(params)
        if tails is None:
            monkeypatch.delenv("ISD_CONV4_TAILS", raising=False)
        else:
            monkeypatch.setenv("ISD_CONV4_TAILS", tails)
        g_full = jax.grad(loss_full)(params)
        for gf, gw in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_win)):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gw), rtol=2e-4, atol=2e-4
            )


class TestKnobMatrix:
    """Guard against knob rot (VERDICT r4 weak #5): every documented
    value of the formulation/remat env knobs must still trace and agree
    with the default at tiny geometry. The forward/grad matrix over
    ``ISD_CONV4_FIRST x ISD_CONV4_TAILS`` lives in
    ``TestFusedFullseqEquivalence``; this class covers the remaining
    knobs — the INFERENCE-only selector ``ISD_CONV4_TAILS_EVAL``
    (models/heads.py::_conv4_tails_impl) and the remat save-point tags
    ``ISD_REMAT_SAVE`` (models/fast.py) — so no selectable formulation
    rots undiscovered until a user sets the env var."""

    _setup = TestFusedFullseqEquivalence._setup

    # Every tails formulation _conv4_tails accepts (heads.py dispatch).
    TAILS_VALUES = [
        "patches", "pertap", "conv", "convnhwc", "nhwc2", "dense",
        "dense_g2", "dense_g4", "dense_s2", "dense_s4", "fullseq",
        "conv2", "conv2c", "dense2", "fullseq2",
    ]

    @pytest.mark.parametrize("tails_eval", TAILS_VALUES)
    def test_eval_tails_knob(self, tails_eval, monkeypatch):
        """``ISD_CONV4_TAILS_EVAL`` alone (train knob untouched) selects
        the train=False formulation; every value matches the default."""
        from imagined_speech_decoding_tpu.models.heads import (
            conv4layers_fused_all_zones_fullseq,
        )

        layout, params, x = self._setup()
        monkeypatch.delenv("ISD_CONV4_FIRST", raising=False)
        monkeypatch.delenv("ISD_CONV4_TAILS", raising=False)
        monkeypatch.delenv("ISD_CONV4_TAILS_EVAL", raising=False)
        ref = np.asarray(conv4layers_fused_all_zones_fullseq(
            params, x, layout.indices, layout.mask, 64, 32, train=False
        ))
        monkeypatch.setenv("ISD_CONV4_TAILS_EVAL", tails_eval)
        out = np.asarray(conv4layers_fused_all_zones_fullseq(
            params, x, layout.indices, layout.mask, 64, 32, train=False
        ))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("h2_layout", ["0,1,2,3", "0,1,3,2", ""])
    def test_h2_layout_knob(self, h2_layout, monkeypatch):
        """``ISD_H2_LAYOUT`` (the window-stack layout pin, TPU default
        "0,1,2,3") is value-preserving for every documented setting —
        forward AND gradients match the unpinned computation."""
        from imagined_speech_decoding_tpu.models.heads import (
            conv4layers_fused_all_zones_fullseq,
        )

        layout, params, x = self._setup()

        def loss(p):
            f = conv4layers_fused_all_zones_fullseq(
                p, x, layout.indices, layout.mask, 64, 32
            )
            return jnp.sum(f * f)

        monkeypatch.setenv("ISD_H2_LAYOUT", "")
        l_ref, g_ref = jax.value_and_grad(loss)(params)
        monkeypatch.setenv("ISD_H2_LAYOUT", h2_layout)
        l, g = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    @pytest.mark.parametrize(
        "save", [None, "tails_h3", "tails_h4", "tails_h3,tails_h4"]
    )
    def test_remat_save_knob(self, save, small_config, dummy_eeg_small, monkeypatch):
        """Every documented ``ISD_REMAT_SAVE`` tag list still traces the
        remat model and reproduces the default policy's logits AND
        gradients (the tags only change what backward recomputes)."""
        from imagined_speech_decoding_tpu.models.api import make_fast_model

        x = jnp.asarray(dummy_eeg_small)
        model = make_fast_model(small_config, remat=True, head_micro_batch=8)

        def loss(p, s):
            logits, _ = model.apply(p, s, x, train=True, rng=jax.random.PRNGKey(2))
            return jnp.sum(logits * logits), logits

        monkeypatch.delenv("ISD_REMAT_SAVE", raising=False)
        params, state = model.init(jax.random.PRNGKey(0))
        (l_ref, logits_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(params, state)
        if save is not None:
            monkeypatch.setenv("ISD_REMAT_SAVE", save)
        (l, logits), g = jax.value_and_grad(loss, has_aux=True)(params, state)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_ref), rtol=1e-5, atol=1e-5
        )
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )


class TestHeadFamilies:
    @pytest.mark.parametrize("head_name", list(HEAD_REGISTRY))
    def test_output_shape(self, head_name):
        enc = get_head(head_name)
        params, state = enc.init(jax.random.PRNGKey(0), 7, 12, 250)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 7, 250)).astype(np.float32))
        feat, new_state = enc.apply(params, state, x, jnp.ones((7,), jnp.float32))
        assert feat.shape == (5, 12)
        assert np.isfinite(np.asarray(feat)).all()

    @pytest.mark.parametrize(
        "head_name",
        [
            # the non-default compile-heavy head rides the slow tier; its
            # shape/masked-BN coverage stays default via test_output_shape
            # and test_fast_padded_equals_ragged
            pytest.param(h, marks=pytest.mark.slow)
            if h == "HeadConv_Paper_Version" else h
            for h in HEAD_REGISTRY
        ],
    )
    def test_fast_with_each_head(self, head_name, small_config, dummy_eeg_small):
        cfg = small_config.replace(head=head_name)
        params, state = fast_init(jax.random.PRNGKey(0), cfg)
        logits, new_state = fast_apply(
            params, state, jnp.asarray(dummy_eeg_small), cfg, train=True,
            rng=jax.random.PRNGKey(1),
        )
        assert logits.shape == (6, 5)
        assert np.isfinite(np.asarray(logits)).all()

    def test_bn_state_updates_in_train(self, small_config, dummy_eeg_small):
        cfg = small_config.replace(head="CVBlock")
        params, state = fast_init(jax.random.PRNGKey(0), cfg)
        _, new_state = fast_apply(
            params, state, jnp.asarray(dummy_eeg_small), cfg, train=True,
            rng=jax.random.PRNGKey(1),
        )
        before = jax.tree.leaves(state["head"])
        after = jax.tree.leaves(new_state["head"])
        assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(after, before))

    def test_bn_state_frozen_in_eval(self, small_config, dummy_eeg_small):
        cfg = small_config.replace(head="CVBlock")
        params, state = fast_init(jax.random.PRNGKey(0), cfg)
        _, new_state = fast_apply(params, state, jnp.asarray(dummy_eeg_small), cfg, train=False)
        for a, b in zip(jax.tree.leaves(new_state["head"]), jax.tree.leaves(state["head"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDeterminism:
    def test_same_key_same_params(self, small_config):
        p1, _ = fast_init(jax.random.PRNGKey(5), small_config)
        p2, _ = fast_init(jax.random.PRNGKey(5), small_config)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_forward_deterministic(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        l1, _ = fast_apply(params, state, jnp.asarray(dummy_eeg_small), cfg)
        l2, _ = fast_apply(params, state, jnp.asarray(dummy_eeg_small), cfg)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_jit_matches_eager(self, small_model, dummy_eeg_small):
        cfg, params, state = small_model
        f = jax.jit(lambda p, s, x: fast_apply(p, s, x, cfg)[0])
        l_jit = f(params, state, jnp.asarray(dummy_eeg_small))
        l_eager, _ = fast_apply(params, state, jnp.asarray(dummy_eeg_small), cfg)
        np.testing.assert_allclose(np.asarray(l_jit), np.asarray(l_eager), rtol=1e-4, atol=1e-5)


class TestSampleWeightedHeadBN:
    """Zero-weight padding trials must not touch the BN statistics of
    BN-bearing zone heads: padded-batch apply must equal ragged-batch
    apply on the real trials (reference drop_last=False semantics)."""

    @pytest.mark.parametrize(
        "head",
        ["CVBlock", "EEGNet_Encoder",
         pytest.param("HeadConv_Paper_Version", marks=pytest.mark.slow)],
    )
    def test_fast_padded_equals_ragged(self, small_config, head):
        import dataclasses

        from imagined_speech_decoding_tpu.models.api import make_fast_model

        cfg = dataclasses.replace(small_config, head=head, dropout=0.0)
        model = make_fast_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(11)
        x = jnp.asarray(
            rng.normal(size=(6, cfg.n_channels, cfg.seq_len)).astype(np.float32)
        )
        real = x[:4]
        padded = jnp.concatenate([real, x[:2]], axis=0)
        w = jnp.asarray([1.0] * 4 + [0.0] * 2, jnp.float32)

        ref_logits, ref_state = model.apply(params, state, real, train=True, rng=None)
        out_logits, out_state = model.apply(
            params, state, padded, train=True, rng=None, sample_weight=w
        )
        np.testing.assert_allclose(
            np.asarray(out_logits[:4]), np.asarray(ref_logits), rtol=1e-4, atol=1e-5
        )
        for a, b in zip(jax.tree.leaves(out_state), jax.tree.leaves(ref_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
