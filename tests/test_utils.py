"""Utils + config tests (mirrors reference tests/test_utils.py strata)."""

import os

import numpy as np
import pytest

from imagined_speech_decoding_tpu import (
    FASTConfig,
    Tick,
    Tock,
    convert_to_number,
    find_available_path,
    first_existing_path,
    next_available_path,
    green,
    load_config,
    now,
    random_string,
    seed_all,
    yellow,
)


class TestColors:
    def test_wrap(self):
        assert green("x") == "\033[92mx\033[0m"
        assert yellow("y") == "\033[93my\033[0m"


class TestHelpers:
    def test_convert_to_number(self):
        assert convert_to_number("3") == 3
        assert convert_to_number("3.5") == 3.5
        assert convert_to_number("abc") == "abc"

    def test_first_existing_path(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        b.write_text("x")
        assert first_existing_path([str(a), str(b)]) == str(b)
        import pytest as _pytest
        with _pytest.raises(FileNotFoundError):
            first_existing_path([str(a)])

    def test_next_available_path(self, tmp_path):
        p = str(tmp_path / "f.txt")
        assert next_available_path(p) == p
        open(p, "w").close()
        assert next_available_path(p) == str(tmp_path / "f_1.txt")
        assert find_available_path is next_available_path  # deprecated alias

    def test_now_and_random_string(self):
        assert len(now("%Y")) == 4
        s = random_string(12)
        assert len(s) == 12 and s.isalnum()


class TestTimers:
    def test_tick(self, capsys):
        with Tick("blk") as t:
            pass
        assert t.delta >= 0 and t.fps > 0
        assert "blk" in capsys.readouterr().out

    def test_tock(self):
        t = Tock(silent=True)
        d = t.tock("x")
        assert d >= 0


class TestSeeding:
    def test_reproducible_numpy(self):
        seed_all(123)
        a = np.random.rand(5)
        seed_all(123)
        b = np.random.rand(5)
        np.testing.assert_array_equal(a, b)

    def test_returns_prng_key(self):
        import jax

        k = seed_all(0)
        k2 = seed_all(0)
        assert np.array_equal(jax.random.key_data(k), jax.random.key_data(k2))


class TestConfig:
    def test_defaults(self, model_config):
        assert model_config.n_tokens == 5  # (800-250)//125 + 1
        assert model_config.n_zones == 8
        assert model_config.n_channels == 64

    def test_frozen_and_replace(self, model_config):
        with pytest.raises(Exception):
            model_config.dim_cnn = 64  # type: ignore[misc]
        c2 = model_config.replace(dim_cnn=64)
        assert c2.dim_cnn == 64 and model_config.dim_cnn == 32

    def test_yaml_load(self):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = load_config(os.path.join(root, "configs", "default.yaml"))
        assert cfg.model.dim_cnn == 32
        assert cfg.model.head == "Conv4Layers"
        assert cfg.train.max_epochs == 200
        assert cfg.train.n_folds == 5
        assert cfg.model.n_tokens == 5

    def test_overrides_beat_yaml(self):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = load_config(
            os.path.join(root, "configs", "default.yaml"),
            overrides={"max_epochs": 3, "dim_cnn": 16},
        )
        assert cfg.train.max_epochs == 3
        assert cfg.model.dim_cnn == 16

    def test_no_yaml(self):
        cfg = load_config(None, overrides={"batch_size": 32})
        assert cfg.train.batch_size == 32
        assert cfg.model.n_channels == 64  # defaults filled from constants

    def test_small_config_tokens(self, small_config):
        assert small_config.n_tokens == 3  # (200-100)//50 + 1
