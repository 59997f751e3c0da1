"""Parallelism tests on the virtual 8-device CPU mesh: shard_map DP
equivalence with single-device training, model-axis sharding of the
stacked engine, mesh helpers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from imagined_speech_decoding_tpu.config import FASTConfig
from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.parallel import (
    DPTrainState,
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_leading_axis,
)
from imagined_speech_decoding_tpu.train.engine import fit_many, make_fit, make_optimizer
from imagined_speech_decoding_tpu.train.metrics import confusion_matrix, cross_entropy
from imagined_speech_decoding_tpu.train.cv import stacked_init


@pytest.fixture(scope="module")
def dp_setup(request):
    cfg = request.getfixturevalue("small_config")
    model = make_fast_model(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, cfg.n_channels, cfg.seq_len)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, 16).astype(np.int32))
    w = jnp.ones((16,), jnp.float32)
    return cfg, model, params, mstate, x, y, w


class TestMesh:
    def test_make_mesh_1d(self):
        mesh = make_mesh(("data",))
        assert mesh.shape == {"data": 8}

    def test_make_mesh_2d(self):
        mesh = make_mesh(("model", "data"), shape=(4, 2))
        assert mesh.shape == {"model": 4, "data": 2}

    def test_shard_and_replicate(self):
        mesh = make_mesh(("data",))
        x = jnp.arange(16.0).reshape(8, 2)
        xs = shard_leading_axis(mesh, x)
        assert len(xs.sharding.device_set) == 8
        r = replicate(mesh, {"a": jnp.ones(3)})
        assert r["a"].sharding.is_fully_replicated


class TestDPTrainStep:
    @pytest.mark.slow
    def test_matches_single_device_gradients(self, dp_setup):
        """One DP step (no dropout) must equal the unsharded step.

        Uses plain SGD so ``params_new - params = -lr * grads`` compares
        gradients directly (Adam would amplify f32 reduction-order noise
        on near-zero grads into full-magnitude update differences).
        """
        cfg, model, params, mstate, x, y, w = dp_setup
        opt = optax.sgd(0.1)

        # --- sharded ---
        mesh = make_mesh(("data",))
        step = make_dp_train_step(model.apply, opt, cfg.n_classes, mesh)
        st = DPTrainState(params, mstate, opt.init(params), jnp.int32(0))
        st2, metrics = step(st, x, y, w, jax.random.PRNGKey(0))

        # --- reference single-device ---
        def loss_fn(p):
            logits, _ = model.apply(p, mstate, x, train=True, rng=jax.random.PRNGKey(9))
            return cross_entropy(logits, y, w)

        loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)
        updates, _ = opt.update(grads_ref, opt.init(params), params)
        params_ref = optax.apply_updates(params, updates)

        assert float(metrics["loss"]) == pytest.approx(float(loss_ref), rel=1e-5)
        for a, b in zip(jax.tree.leaves(st2.params), jax.tree.leaves(params_ref)):
            scale = max(float(np.abs(np.asarray(b)).max()), 1e-3)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5 * scale
            )

    @pytest.mark.slow
    def test_weighted_padding_exact(self, dp_setup):
        """Zero-weight rows must not affect the DP loss."""
        cfg, model, params, mstate, x, y, w = dp_setup
        opt = make_optimizer(1e-3, 2, 4, warmup_epochs=0)
        mesh = make_mesh(("data",))
        step = make_dp_train_step(model.apply, opt, cfg.n_classes, mesh)

        w_pad = w.at[12:].set(0.0)
        st = DPTrainState(params, mstate, opt.init(params), jnp.int32(0))
        _, m_pad = step(st, x, y, w_pad, jax.random.PRNGKey(0))

        def loss12(p):
            logits, _ = model.apply(p, mstate, x[:12], train=True, rng=None)
            return cross_entropy(logits, y[:12])

        assert float(m_pad["loss"]) == pytest.approx(float(loss12(params)), rel=1e-5)

    def test_eval_step(self, dp_setup):
        cfg, model, params, mstate, x, y, w = dp_setup
        mesh = make_mesh(("data",))
        ev = make_dp_eval_step(model.apply, cfg.n_classes, mesh)
        num, den, cm = ev(params, mstate, x, y, w)
        logits, _ = model.apply(params, mstate, x, train=False, rng=None)
        ref = float(cross_entropy(logits, y, w))
        assert float(num) / float(den) == pytest.approx(ref, rel=1e-5)
        cm_ref = confusion_matrix(logits, y, cfg.n_classes, w)
        np.testing.assert_allclose(np.asarray(cm), np.asarray(cm_ref), atol=1e-5)


class TestModelAxisSharding:
    @pytest.mark.slow
    def test_stacked_fit_sharded_matches_unsharded(self, small_config):
        """The vmapped fit with its model axis sharded over 8 devices must
        produce the same histories as the unsharded run."""
        cfg = small_config
        model = make_fast_model(cfg)
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.normal(size=(40, cfg.n_channels, cfg.seq_len)).astype(np.float32))
        Y = jnp.asarray(rng.integers(0, 5, 40).astype(np.int32))
        m = 8
        perms = np.stack([rng.permutation(40) for _ in range(m)])
        tidx, vidx = jnp.asarray(perms[:, :32]), jnp.asarray(perms[:, 32:])
        params0, state0 = stacked_init(model, jax.random.PRNGKey(1), m)
        keys = jax.random.split(jax.random.PRNGKey(2), m)
        fit = make_fit(model.apply, cfg.n_classes, epochs=2, batch_size=16,
                       n_train=32, n_val=8, learning_rate=1e-3, warmup_epochs=0)
        run = jax.jit(lambda *a: fit_many(fit, *a))

        res_plain = jax.block_until_ready(run(keys, params0, state0, tidx, vidx, X, Y))

        mesh = make_mesh(("model",))
        ms = NamedSharding(mesh, P("model"))
        shard = lambda t: jax.tree.map(lambda v: jax.device_put(v, ms), t)
        res_shard = jax.block_until_ready(
            run(shard(keys), shard(params0), shard(state0), shard(tidx), shard(vidx),
                replicate(mesh, X), replicate(mesh, Y))
        )
        # Sharding changes layouts/fusions → small f32 reduction-order
        # differences; losses must stay close, accuracies within one
        # val-sample flip (8 val samples → 0.125 quantum).
        np.testing.assert_allclose(
            np.asarray(res_plain.history["loss"]),
            np.asarray(res_shard.history["loss"]),
            rtol=5e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(res_plain.best_val_acc), np.asarray(res_shard.best_val_acc),
            atol=0.13,
        )


class TestSegmentedSweepSharding:
    def test_segmented_sweep_sharded_matches_unsharded(self, small_config):
        """The SEGMENTED sweep-mode fit (runtime lr/wd hypers riding the
        stacked axis, multi-segment carry, non-divisible stack padded to
        the mesh) sharded over ('model',) == unsharded, exactly.

        This is the bit-exact check the multichip dryrun references
        (``__graft_entry__._dryrun_multichip_impl`` keeps its budget by
        checking the sharded sweep against a plain non-sweep run at
        reassociation tolerance); one test covers the three wiring
        surfaces the dryrun no longer isolates: segment-boundary carry
        under sharding, hyper-dict padding via shard_model_stack, and
        sweep-mode history assembly.
        """
        from imagined_speech_decoding_tpu.parallel.mesh import shard_model_stack
        from imagined_speech_decoding_tpu.train.engine import fit_many_segmented

        cfg = small_config
        model = make_fast_model(cfg)
        rng = np.random.default_rng(3)
        X = jnp.asarray(rng.normal(size=(30, cfg.n_channels, cfg.seq_len)).astype(np.float32))
        Y = jnp.asarray(rng.integers(0, 5, 30).astype(np.int32))
        m = 5  # NOT divisible by the 8-device mesh: padding exercised
        perms = np.stack([rng.permutation(30) for _ in range(m)])
        tidx, vidx = jnp.asarray(perms[:, :24]), jnp.asarray(perms[:, 24:])
        params0, state0 = stacked_init(model, jax.random.PRNGKey(4), m)
        keys = jax.random.split(jax.random.PRNGKey(5), m)
        hyper = {
            "lr_scale": jnp.asarray([1.0, 0.5, 2.0, 1.0, 0.25], jnp.float32),
            "wd_scale": jnp.asarray([1.0, 0.0, 1.0, 2.0, 1.0], jnp.float32),
        }
        fit = make_fit(
            model.apply, cfg.n_classes, epochs=1, batch_size=8, n_train=24,
            n_val=6, learning_rate=1e-3, warmup_epochs=0, total_epochs=2,
            sweep=True,
        )
        res_plain = jax.block_until_ready(
            fit_many_segmented(
                fit, keys, params0, state0, tidx, vidx, X, Y,
                total_epochs=2, hyper=hyper,
            )
        )
        (hyper_s, keys_s, p_s, s_s, t_s, v_s), (X_s, Y_s), m_padded = (
            shard_model_stack(
                "model", m, [hyper, keys, params0, state0, tidx, vidx], [X, Y]
            )
        )
        assert m_padded == 8
        res_shard = jax.block_until_ready(
            fit_many_segmented(
                fit, keys_s, p_s, s_s, t_s, v_s, X_s, Y_s,
                total_epochs=2, hyper=hyper_s,
            )
        )
        res_shard = jax.tree.map(lambda v: v[:m], res_shard)
        for k in res_plain.history:
            np.testing.assert_allclose(
                np.asarray(res_shard.history[k]), np.asarray(res_plain.history[k]),
                rtol=1e-5, atol=1e-5, err_msg=f"history[{k}]",
            )
        np.testing.assert_allclose(
            np.asarray(res_shard.best_val_acc), np.asarray(res_plain.best_val_acc),
            atol=1e-6,
        )


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert np.asarray(out).shape == (8, 5)

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestMeshStrategiesCV:
    """cv.train_per_subject_cv under each mesh strategy matches the
    unsharded run (same seeds -> same split/init/shuffle streams)."""

    def _run(self, small_config, small_train_config, mesh_axis, tmp_path):
        from imagined_speech_decoding_tpu.models.api import make_fast_model
        from imagined_speech_decoding_tpu.train.cv import train_per_subject_cv

        model = make_fast_model(small_config)
        rng = np.random.default_rng(0)
        s, n = 2, 12
        X = rng.normal(size=(s, n, small_config.n_channels, small_config.seq_len)).astype(np.float32)
        Y = rng.integers(0, small_config.n_classes, (s, n)).astype(np.int32)
        return train_per_subject_cv(
            model, small_train_config, X, Y, ["01", "02"],
            small_config.n_classes, save_dir=None, verbose=False,
            mesh_axis=mesh_axis,
        )

    @pytest.mark.slow
    @pytest.mark.parametrize("mesh_axis", ["data", "2d"])
    def test_matches_unsharded(self, small_config, small_train_config, mesh_axis, tmp_path):
        base = self._run(small_config, small_train_config, None, tmp_path)
        sharded = self._run(small_config, small_train_config, mesh_axis, tmp_path)
        np.testing.assert_allclose(
            np.asarray(sharded.fit.best_val_acc),
            np.asarray(base.fit.best_val_acc), rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(sharded.fit.history["loss"]),
            np.asarray(base.fit.history["loss"]), rtol=1e-3, atol=1e-5,
        )
