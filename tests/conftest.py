"""Test fixtures.

All tests run on CPU with a virtual 8-device mesh (the idiomatic JAX
fake-multi-device backend), so sharding code paths are exercised without
TPU hardware. The env vars MUST be set before jax import — hence this
conftest sets them at collection time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's axon sitecustomize force-registers the TPU backend and
# overrides JAX_PLATFORMS; post-import config.update wins it back to CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat suite runs skip XLA compiles (the
# dominant cost of this suite), keyed on program + flags. The dir is
# salted per host (and foreign-host dirs pruned): XLA:CPU AOT entries
# encode the compile host's features and can SIGILL when loaded on a
# different machine (this checkout persists across possibly-
# heterogeneous hosts). See imagined_speech_decoding_tpu/_hostid.py.
from imagined_speech_decoding_tpu._hostid import salted_cache_dir  # noqa: E402

_cache_dir = salted_cache_dir(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".pytest_jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from imagined_speech_decoding_tpu.config import FASTConfig, TrainConfig  # noqa: E402
from imagined_speech_decoding_tpu.data.constants import Electrodes, Zones  # noqa: E402


@pytest.fixture(scope="session")
def model_config() -> FASTConfig:
    """Full 64-channel / 8-zone production config."""
    return FASTConfig(electrodes=Electrodes, zone_dict=Zones)


SMALL_ELECTRODES = ("C1", "C2", "C3", "C4", "P1", "P2", "O1", "O2")
SMALL_ZONES = {
    "Central": ("C1", "C2", "C3", "C4"),
    "Parietal": ("P1", "P2"),
    "Occipital": ("O1", "O2"),
}


@pytest.fixture(scope="session")
def small_config() -> FASTConfig:
    """8 electrodes, 3 zones, 1 layer, no dropout — fast tests."""
    return FASTConfig(
        electrodes=SMALL_ELECTRODES,
        zone_dict=SMALL_ZONES,
        dim_cnn=8,
        dim_token=16,
        seq_len=200,
        window_len=100,
        slide_step=50,
        head="Conv4Layers",
        n_classes=5,
        num_layers=1,
        num_heads=4,
        dropout=0.0,
    )


@pytest.fixture(scope="session")
def small_train_config() -> TrainConfig:
    return TrainConfig(max_epochs=3, batch_size=8, warmup_epochs=1, n_folds=3, precision="f32")


@pytest.fixture
def dummy_eeg_batch(model_config) -> np.ndarray:
    rng = np.random.default_rng(0)
    return rng.normal(size=(4, model_config.n_channels, model_config.seq_len)).astype(np.float32)


@pytest.fixture
def dummy_eeg_small(small_config) -> np.ndarray:
    rng = np.random.default_rng(1)
    return rng.normal(size=(6, small_config.n_channels, small_config.seq_len)).astype(np.float32)


@pytest.fixture
def tmp_dir(tmp_path):
    return str(tmp_path)
