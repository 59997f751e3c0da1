"""Mid-run checkpoint persistence: segment-boundary save + crash resume.

Reference analogue: Lightning ``ModelCheckpoint`` persists during
``trainer.fit`` (``/root/reference/scripts/train_fast.py:118-125``); the
rebuild persists the FULL carry (params, optimizer, best snapshot, epoch
counter) so a resumed run is step-identical to an uninterrupted one.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.train.cv import stacked_init
from imagined_speech_decoding_tpu.train.engine import fit_many_segmented, make_fit


@pytest.fixture(scope="module")
def setup(small_config_module):
    cfg = small_config_module
    model = make_fast_model(cfg)
    m, n_trials, n_train, n_val = 3, 24, 16, 8
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(n_trials, cfg.n_channels, cfg.seq_len)).astype(np.float32))
    Y = jnp.asarray(rng.integers(0, cfg.n_classes, n_trials).astype(np.int32))
    perms = np.stack([rng.permutation(n_trials) for _ in range(m)])
    tidx = jnp.asarray(perms[:, :n_train])
    vidx = jnp.asarray(perms[:, n_train:])
    params0, state0 = stacked_init(model, jax.random.PRNGKey(1), m)
    keys = jax.random.split(jax.random.PRNGKey(2), m)
    fit = make_fit(
        model.apply, cfg.n_classes, epochs=2, batch_size=8,
        n_train=n_train, n_val=n_val, warmup_epochs=1, total_epochs=6,
    )
    return fit, keys, params0, state0, tidx, vidx, X, Y


@pytest.fixture(scope="module")
def small_config_module():
    from imagined_speech_decoding_tpu.config import FASTConfig

    return FASTConfig(
        electrodes=("C1", "C2", "C3", "C4", "P1", "P2", "O1", "O2"),
        zone_dict={"Central": ("C1", "C2", "C3", "C4"), "Parietal": ("P1", "P2"),
                   "Occipital": ("O1", "O2")},
        dim_cnn=8, dim_token=16, seq_len=200, window_len=100, slide_step=50,
        head="Conv4Layers", n_classes=5, num_layers=1, num_heads=4, dropout=0.0,
    )


def _run(setup, total_epochs, ckpt_dir=None, resume=True):
    fit, keys, params0, state0, tidx, vidx, X, Y = setup
    return fit_many_segmented(
        fit, keys, params0, state0, tidx, vidx, X, Y,
        total_epochs=total_epochs, checkpoint_dir=ckpt_dir, resume=resume,
    )


class TestSegmentCheckpoint:
    def test_resume_is_step_identical(self, setup, tmp_path):
        ref = _run(setup, 6)  # uninterrupted, no persistence

        # "crashed" run: only 2 of 3 segments execute
        crash_dir = str(tmp_path / "ckpt")
        partial = _run(setup, 4, ckpt_dir=crash_dir)
        assert os.path.exists(os.path.join(crash_dir, "segment_carry.npz"))

        resumed = _run(setup, 6, ckpt_dir=crash_dir, resume=True)
        for a, b in zip(jax.tree.leaves(resumed.params), jax.tree.leaves(ref.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(resumed.history["val_acc"]), np.asarray(ref.history["val_acc"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(resumed.best_val_acc), np.asarray(ref.best_val_acc), rtol=1e-5
        )
        assert resumed.history["loss"].shape == ref.history["loss"].shape

    def test_no_resume_starts_fresh(self, setup, tmp_path):
        ckpt_dir = str(tmp_path / "ckpt2")
        _run(setup, 4, ckpt_dir=ckpt_dir)
        fresh = _run(setup, 2, ckpt_dir=ckpt_dir, resume=False)
        assert fresh.history["loss"].shape[-1] == 2

    def test_checkpoint_every_thins_cadence_and_resumes(self, setup, tmp_path):
        """checkpoint_every=2 over 3 segments: the write after segment 1
        is skipped (the background-writer path still persists segments 2
        and the final 3), and resume from the thinned checkpoint is
        step-identical to the uninterrupted run."""
        fit, keys, params0, state0, tidx, vidx, X, Y = setup
        ref = _run(setup, 6)

        ckpt_dir = str(tmp_path / "ckpt3")
        path = os.path.join(ckpt_dir, "segment_carry.npz")
        # 2 segments, cadence 2: exactly one write (after segment 2)
        fit_many_segmented(
            fit, keys, params0, state0, tidx, vidx, X, Y,
            total_epochs=4, checkpoint_dir=ckpt_dir, checkpoint_every=2,
        )
        assert os.path.exists(path)
        resumed = fit_many_segmented(
            fit, keys, params0, state0, tidx, vidx, X, Y,
            total_epochs=6, checkpoint_dir=ckpt_dir, checkpoint_every=2,
        )
        for a, b in zip(jax.tree.leaves(resumed.params), jax.tree.leaves(ref.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(resumed.history["val_acc"]), np.asarray(ref.history["val_acc"]),
            rtol=1e-5, atol=1e-6,
        )

    def test_writer_failure_propagates(self, setup, tmp_path, monkeypatch):
        """A failed background checkpoint write (disk full, permissions)
        must fail the run at the next join — never a silent success with
        a stale checkpoint that a later --resume would trust."""
        import imagined_speech_decoding_tpu.train.checkpoint as ckpt_mod

        def _boom(*args, **kwargs):
            raise OSError("no space left on device (simulated)")

        monkeypatch.setattr(ckpt_mod, "save_segment_checkpoint", _boom)
        fit, keys, params0, state0, tidx, vidx, X, Y = setup
        with pytest.raises(RuntimeError, match="segment-checkpoint write"):
            fit_many_segmented(
                fit, keys, params0, state0, tidx, vidx, X, Y,
                total_epochs=4, checkpoint_dir=str(tmp_path / "ckpt5"),
            )

    def test_final_segment_always_checkpointed(self, setup, tmp_path):
        """With cadence > n_segments no interior boundary matches, but
        the final segment must still write (the campaign's end state is
        never lost to a thinned cadence)."""
        ckpt_dir = str(tmp_path / "ckpt4")
        fit, keys, params0, state0, tidx, vidx, X, Y = setup
        fit_many_segmented(
            fit, keys, params0, state0, tidx, vidx, X, Y,
            total_epochs=4, checkpoint_dir=ckpt_dir, checkpoint_every=99,
        )
        assert os.path.exists(os.path.join(ckpt_dir, "segment_carry.npz"))


class TestEpochBudgetFreeze:
    """total_epochs not divisible by the segment length: surplus epochs
    in the final segment must be no-ops, so segmented execution equals a
    run of exactly total_epochs (the engine freezes updates once
    ep >= total_epochs)."""

    def test_surplus_segment_is_noop(self, setup, small_config_module):
        _, keys, params0, state0, tidx, vidx, X, Y = setup
        cfg = small_config_module
        model = make_fast_model(cfg)
        n_train, n_val = tidx.shape[1], vidx.shape[1]
        fit = make_fit(
            model.apply, cfg.n_classes, epochs=2, batch_size=8,
            n_train=n_train, n_val=n_val, warmup_epochs=1, total_epochs=5,
        )
        segment = jax.jit(jax.vmap(fit.segment, in_axes=(0, 0, 0, 0, None, None)))
        carry = jax.vmap(fit.init_carry)(params0, state0)
        snapshots = []
        for s in range(4):  # 8 epochs attempted; budget is 5
            # base keys pass through unchanged — the engine folds in the
            # global epoch itself (engine._run_epochs)
            carry, _ = segment(carry, keys, tidx, vidx, X, Y)
            snapshots.append(carry)

        p4, p6, p8 = snapshots[1][0], snapshots[2][0], snapshots[3][0]
        # epoch 4 (the 5th) still trains...
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(p4), jax.tree.leaves(p6))
        )
        # ...but epochs 5-7 are frozen: params, best snapshot, and
        # optimizer state are all bit-identical after the budget.
        for i in (0, 2, 3, 4, 5, 6):  # params, opt, best_params, best_ms, best_acc, best_ep
            for a, b in zip(jax.tree.leaves(snapshots[2][i]), jax.tree.leaves(snapshots[3][i])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
