"""Zero-shot cross-subject transfer CLI (reference notebook cells 30/43)."""

import os

import numpy as np
import pytest


class TestZeroShotCLI:
    @pytest.mark.slow
    def test_synthetic_matrix(self, tmp_dir):
        from imagined_speech_decoding_tpu.cli.zero_shot import main

        matrix = main([
            "--synthetic", "3", "--synthetic_trials", "24",
            "--synthetic_epochs", "3", "--output_dir", tmp_dir,
        ])
        assert matrix.shape == (3, 3)
        assert ((matrix >= 0) & (matrix <= 1)).all()
        assert os.path.exists(os.path.join(tmp_dir, "zero_shot_matrix.csv"))
        assert os.path.exists(os.path.join(tmp_dir, "zero_shot_matrix.png"))

        import pandas as pd

        df = pd.read_csv(os.path.join(tmp_dir, "zero_shot_matrix.csv"), index_col=0)
        np.testing.assert_allclose(df.to_numpy(), matrix, rtol=1e-6)

    def test_transfer_matrix_unit(self, small_config):
        """transfer_matrix: vmapped all-models eval on shared test sets."""
        import jax

        from imagined_speech_decoding_tpu.cli.zero_shot import transfer_matrix
        from imagined_speech_decoding_tpu.models.api import make_fast_model
        from imagined_speech_decoding_tpu.train.cv import stacked_init

        model = make_fast_model(small_config)
        params, state = stacked_init(model, jax.random.PRNGKey(0), 2)
        rng = np.random.default_rng(0)
        tests = [
            (
                rng.normal(size=(10, small_config.n_channels, small_config.seq_len)).astype(np.float32),
                rng.integers(0, small_config.n_classes, 10),
            )
            for _ in range(2)
        ]
        m = transfer_matrix(model, params, state, tests, batch_size=4)
        assert m.shape == (2, 2)
        assert ((m >= 0) & (m <= 1)).all()
