"""LOSO pretraining tests: index construction (exclusion + stratification),
idempotent checkpointing, warm-start stacking."""

import os

import jax
import numpy as np
import pytest

from imagined_speech_decoding_tpu.data import synthetic_corpus
from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.train.loso import (
    build_loso_index_stack,
    pretrain_loso,
    stack_pretrained_for_cv,
)


class TestLOSOIndices:
    def test_excludes_target_subject(self):
        y = np.tile(np.arange(5), (4, 6))  # 4 subjects x 30 trials, balanced
        tidx, vidx = build_loso_index_stack(y, val_frac=0.1, seed=0)
        n = y.shape[1]
        for s in range(4):
            combined = np.concatenate([tidx[s], vidx[s]])
            # no index falls inside the excluded subject's range
            assert not ((combined >= s * n) & (combined < (s + 1) * n)).any()
            # pool covers exactly the other subjects' trials
            assert len(combined) == 3 * n
            assert len(np.unique(combined)) == 3 * n

    def test_stratified_val(self):
        y = np.tile(np.arange(5), (4, 20))  # 100 trials each, balanced
        _, vidx = build_loso_index_stack(y, val_frac=0.1, seed=0)
        flat = y.reshape(-1)
        for s in range(4):
            counts = np.bincount(flat[vidx[s]], minlength=5)
            assert (counts == counts[0]).all()  # perfectly stratified

    def test_split_sizes(self):
        y = np.tile(np.arange(5), (3, 8))  # 40 trials/subject
        tidx, vidx = build_loso_index_stack(y, val_frac=0.1, seed=0)
        assert tidx.shape == (3, 72) and vidx.shape == (3, 8)


class TestLOSOPretrain:
    @pytest.fixture(scope="class")
    def setup(self, request):
        cfg = request.getfixturevalue("small_config")
        model = make_fast_model(cfg)
        X, Y = synthetic_corpus(0, n_subjects=3, n_trials=20, n_channels=8, n_samples=200)
        return cfg, model, X, Y

    @pytest.mark.slow
    def test_pretrain_and_idempotency(self, setup, tmp_dir):
        cfg, model, X, Y = setup
        subjects = ["01", "02", "03"]
        best = pretrain_loso(
            model, X, Y, subjects, cfg.n_classes, save_dir=tmp_dir,
            epochs=2, batch_size=16, warmup_epochs=0, verbose=False,
        )
        assert len(best) == 3
        for sid in subjects:
            assert os.path.exists(os.path.join(tmp_dir, f"Pretrain_excludes_sub{sid}.npz"))

        # second call must load, not retrain (skip-if-exists idempotency)
        mtimes = {
            sid: os.path.getmtime(os.path.join(tmp_dir, f"Pretrain_excludes_sub{sid}.npz"))
            for sid in subjects
        }
        best2 = pretrain_loso(
            model, X, Y, subjects, cfg.n_classes, save_dir=tmp_dir,
            epochs=2, batch_size=16, verbose=False,
        )
        for sid in subjects:
            assert os.path.getmtime(
                os.path.join(tmp_dir, f"Pretrain_excludes_sub{sid}.npz")
            ) == mtimes[sid]
        for a, b in zip(jax.tree.leaves(best[0]), jax.tree.leaves(best2[0])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_stack_for_cv(self, setup, tmp_dir):
        cfg, model, X, Y = setup
        subjects = ["01", "02"]
        best = pretrain_loso(
            model, X[:2], Y[:2], subjects, cfg.n_classes,
            save_dir=os.path.join(tmp_dir, "p2"),
            epochs=1, batch_size=16, warmup_epochs=0, verbose=False,
        )
        stacked = stack_pretrained_for_cv(best, n_folds=3)
        leaves = jax.tree.leaves(stacked)
        assert all(l.shape[0] == 6 for l in leaves)  # 2 subjects x 3 folds
        # each subject's params replicated across its folds
        for l, l0 in zip(leaves, jax.tree.leaves(best[0])):
            np.testing.assert_array_equal(np.asarray(l[0]), np.asarray(l[2]))
            np.testing.assert_array_equal(np.asarray(l[0]), np.asarray(l0))
