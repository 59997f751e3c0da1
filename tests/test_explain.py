"""Explainability tests: attribution correctness (completeness axiom,
linear-model exactness), zone aggregation, topomap/plot smoke tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.data import Electrodes, zone_layout
from imagined_speech_decoding_tpu.explain import (
    attribution_for_predictions,
    electrode_position,
    expected_gradients,
    integrated_gradients,
    montage_positions,
    plot_attribution_heatmap,
    plot_band_heatmap,
    plot_class_topomaps,
    plot_zone_importance,
    plot_zone_time_heatmap,
    save_topomap,
    symmetric_vlim,
    zone_importance,
)
from imagined_speech_decoding_tpu.models.api import make_fast_model


def linear_model(w):
    """A ModelDef-like apply for a known-linear scoring function."""

    def apply(params, state, x, *, train=False, rng=None):
        logits = jnp.einsum("bct,kct->bk", x, w)
        return logits, state

    return apply


class TestIntegratedGradients:
    def test_exact_for_linear_model(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(3, 4, 10)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 4, 10)).astype(np.float32))
        target = jnp.asarray([0, 2])
        attr = integrated_gradients(linear_model(w), {}, {}, x, target, n_steps=8)
        # For a linear model with zero baseline, IG == w_target * x exactly.
        expected = np.asarray(w)[np.asarray(target)] * np.asarray(x)
        np.testing.assert_allclose(np.asarray(attr), expected, rtol=1e-4, atol=1e-5)

    def test_completeness(self, small_config, dummy_eeg_small):
        model = make_fast_model(small_config)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(dummy_eeg_small[:2])
        target = jnp.asarray([1, 3])
        attr = integrated_gradients(model.apply, params, state, x, target, n_steps=256)
        logits_x, _ = model.apply(params, state, x)
        logits_0, _ = model.apply(params, state, jnp.zeros_like(x))
        lhs = np.asarray(attr).sum(axis=(1, 2))
        rhs = np.asarray(
            jnp.take_along_axis(logits_x - logits_0, target[:, None], axis=-1)[:, 0]
        )
        np.testing.assert_allclose(lhs, rhs, rtol=0.05, atol=0.02)


class TestExpectedGradients:
    def test_shapes_and_finite(self, small_config, dummy_eeg_small):
        model = make_fast_model(small_config)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(dummy_eeg_small[:2])
        bg = jnp.asarray(dummy_eeg_small[2:])
        attr = expected_gradients(
            model.apply, params, state, x, bg, jnp.asarray([0, 1]),
            jax.random.PRNGKey(1), n_samples=4,
        )
        assert attr.shape == x.shape
        assert np.isfinite(np.asarray(attr)).all()

    def test_for_predictions(self, small_config, dummy_eeg_small):
        model = make_fast_model(small_config)
        params, state = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(dummy_eeg_small[:2])
        bg = jnp.asarray(dummy_eeg_small[2:])
        attr, preds = attribution_for_predictions(
            model.apply, params, state, x, bg, jax.random.PRNGKey(1), n_samples=4
        )
        assert attr.shape == x.shape and preds.shape == (2,)


class TestZoneImportance:
    def test_aggregation(self):
        zl = zone_layout()
        attr = jnp.ones((2, 64, 10))
        zi = zone_importance(attr, zl.indices, zl.mask)
        assert zi.shape == (2, 8)
        # all-ones attribution: the per-zone MEAN is 1 regardless of
        # zone channel count (reference plot_zone_importance semantics)
        np.testing.assert_allclose(np.asarray(zi)[0], np.ones(8), rtol=1e-6)

    def test_mean_matches_reference_formula(self):
        zl = zone_layout()
        rng = np.random.default_rng(0)
        attr = rng.normal(size=(1, 64, 10)).astype(np.float32)
        zi = np.asarray(zone_importance(jnp.asarray(attr), zl.indices, zl.mask))[0]
        for z in range(zl.n_zones):
            idx = zl.indices[z][zl.mask[z]]
            np.testing.assert_allclose(zi[z], attr[0, idx].mean(), rtol=1e-5)


class TestTopomap:
    def test_all_montage_electrodes_parse(self):
        pos = montage_positions(Electrodes)
        assert pos.shape == (64, 2)
        # left/right symmetry of homologous pairs
        x1, _ = electrode_position("C3")
        x2, _ = electrode_position("C4")
        assert x1 == -x2 and x1 < 0

    def test_below_circle_ring(self):
        # the 9/10 ring lies on the 90-deg (preauricular) circle = the
        # head outline in the azimuthal-equidistant projection
        for name in ("FT9", "TP10", "PO9"):
            x, y = electrode_position(name)
            np.testing.assert_allclose(np.hypot(x, y), 1.0, rtol=1e-6)

    def test_bad_name_raises(self):
        with pytest.raises(ValueError):
            electrode_position("XX9")

    def test_standard_1020_anchors(self):
        """Known anchors of the published idealized-sphere 10-10
        construction under azimuthal-equidistant projection (VERDICT r2
        item 7; reference plots on MNE standard_1020,
        scripts/explain_fast.py:154-206)."""
        # Cz at the origin
        np.testing.assert_allclose(electrode_position("Cz"), (0.0, 0.0), atol=1e-12)
        # T7/T8 on the 72-deg ring at the lateral axis: (∓0.8, 0)
        np.testing.assert_allclose(electrode_position("T7"), (-0.8, 0.0), atol=1e-9)
        np.testing.assert_allclose(electrode_position("T8"), (0.8, 0.0), atol=1e-9)
        # midline: Fz front at 36 deg -> (0, 0.4); Pz mirror at the back
        np.testing.assert_allclose(electrode_position("Fz"), (0.0, 0.4), atol=1e-9)
        np.testing.assert_allclose(electrode_position("Pz"), (0.0, -0.4), atol=1e-9)
        # ring electrodes at 10%-arc azimuth steps, radius 0.8:
        # Fp1 at 18 deg front-left, O2 at 162 deg back-right
        np.testing.assert_allclose(
            electrode_position("Fp1"),
            (-0.8 * np.sin(np.radians(18)), 0.8 * np.cos(np.radians(18))),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            electrode_position("O2"),
            (0.8 * np.sin(np.radians(18)), -0.8 * np.cos(np.radians(18))),
            atol=1e-9,
        )
        # C3: halfway along the Cz->T7 coronal arc -> 36 deg inclination
        np.testing.assert_allclose(electrode_position("C3"), (-0.4, 0.0), atol=1e-9)
        # front/back signs
        assert electrode_position("Fp1")[1] > 0 > electrode_position("O1")[1]

    def test_interior_electrodes_inside_ring(self):
        # great-circle interpolation keeps 1..6-numbered electrodes
        # strictly inside the 10% ring
        for name in ("F3", "FC1", "CP5", "PO3", "AF4", "C1"):
            x, y = electrode_position(name)
            assert 0.0 < np.hypot(x, y) < 0.8, name

    def test_save_topomap(self, tmp_dir):
        vals = np.random.default_rng(0).normal(size=64)
        path = save_topomap(f"{tmp_dir}/topo.png", vals, Electrodes, title="test")
        assert os.path.exists(path) and os.path.getsize(path) > 1000


class TestPlots:
    def test_symmetric_vlim(self):
        lo, hi = symmetric_vlim(np.array([-5.0, 1.0, 3.0]), pct=100)
        assert lo == -5.0 and hi == 5.0

    def test_all_plot_writers(self, tmp_dir):
        rng = np.random.default_rng(0)
        zl = zone_layout()
        paths = [
            plot_attribution_heatmap(
                f"{tmp_dir}/heat.png", rng.normal(size=(64, 100)), Electrodes
            ),
            plot_zone_importance(f"{tmp_dir}/zones.png", rng.normal(size=8), zl.names),
            plot_class_topomaps(
                f"{tmp_dir}/classes.png",
                {f"c{i}": rng.normal(size=64) for i in range(3)},
                Electrodes,
            ),
            plot_zone_time_heatmap(
                f"{tmp_dir}/zt.png", rng.normal(size=(8, 100)), zl.names
            ),
            plot_band_heatmap(
                f"{tmp_dir}/bands.png", rng.random((5, 20)),
                ["Delta", "Theta", "Alpha", "Beta", "Gamma"], np.linspace(0, 3, 20),
            ),
        ]
        for p in paths:
            assert os.path.exists(p) and os.path.getsize(p) > 1000


class TestTorchExpectedGradientsOracle:
    """Numeric cross-check of the attribution math against an
    INDEPENDENT torch implementation of SHAP GradientExplainer's
    expected gradients (``/root/reference/scripts/explain_fast.py:75-123``
    semantics: per draw, a random background trial and a random
    interpolation point; gradient there times (x - bg); averaged),
    differentiated through the transplanted REFERENCE torch FAST —
    so the model, the autodiff, and the estimator are all independent
    of the jax side. Only the (bg_idx, alpha) draws are shared, since
    the estimator is defined conditional on them (VERDICT r3 item 2)."""

    def test_expected_gradients_match_torch(self):
        torch = pytest.importorskip("torch")
        if not os.path.exists("/root/reference/src/fast/models/fast.py"):
            pytest.skip("reference repo not mounted")
        import test_torch_parity as tp

        ref = tp._load_ref_fast()
        cfg, tm, params, state, x_np = tp._make_pair(ref, "Conv4Layers", 100, 250, 50)
        rng = np.random.default_rng(7)
        bg_np = rng.normal(size=(6, cfg.n_channels, cfg.seq_len)).astype(np.float32)
        target_np = np.array([0, 2, 4, 1])

        # jax side, and the draws it used (same key derivation as
        # explain.attribution.expected_gradients)
        key = jax.random.PRNGKey(3)
        n_samples = 8
        attr_jax = expected_gradients(
            lambda p, s, xx, *, train, rng: tp.fast_apply(p, s, xx, cfg, train=train),
            params, state, jnp.asarray(x_np), jnp.asarray(bg_np),
            jnp.asarray(target_np), key, n_samples=n_samples,
        )
        kb, ka = jax.random.split(key)
        bg_idx = np.asarray(
            jax.random.randint(kb, (n_samples, x_np.shape[0]), 0, bg_np.shape[0])
        )
        alphas = np.asarray(jax.random.uniform(ka, (n_samples, x_np.shape[0])))

        # torch side: ~20 lines, differentiated through the reference model
        x_t = torch.from_numpy(x_np)
        bg_t = torch.from_numpy(bg_np)
        tgt_t = torch.from_numpy(target_np).long()
        total = torch.zeros_like(x_t)
        for s in range(n_samples):
            bg = bg_t[torch.from_numpy(bg_idx[s].copy()).long()]  # (B, C, T)
            a = torch.from_numpy(alphas[s].copy()).float()[:, None, None]
            xi = (bg + a * (x_t - bg)).detach().requires_grad_(True)
            score = tm(xi).gather(1, tgt_t[:, None]).sum()
            (g,) = torch.autograd.grad(score, xi)
            total += g * (x_t - bg)
        attr_torch = (total / n_samples).numpy()

        a_jax = np.asarray(attr_jax)
        assert a_jax.shape == attr_torch.shape == x_np.shape
        # elementwise agreement; atol scaled to the attribution magnitude
        # (f32 through two independent autodiff pipelines)
        scale = np.abs(attr_torch).max()
        np.testing.assert_allclose(a_jax, attr_torch, rtol=1e-3, atol=1e-4 * scale)
