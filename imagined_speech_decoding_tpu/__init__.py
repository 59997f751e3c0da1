"""imagined_speech_decoding_tpu — TPU-native imagined-speech EEG decoding.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
FAST codebase (kidusabe1/Imagined-Speech-Decoding): decoding 5-class
imagined speech from 64-channel, 250 Hz EEG (BCI Competition 2020
Track #3) with the FAST spatio-temporal transformer and baseline models.

Design principles (TPU-first, not a port):
  * the whole corpus lives in HBM as one batched array — no host
    DataLoader workers, batching is a jitted index gather;
  * preprocessing (filtering, windowing, spectral features, CSP) is a
    set of pure, batched, jittable ops with SciPy-parity tests;
  * the reference's per-subject/per-fold Python loops become a single
    ``vmap``-stacked training program: all subject x fold models train
    simultaneously inside one ``lax.scan``;
  * multi-chip scaling is expressed with ``jax.sharding.Mesh`` +
    ``shard_map`` collectives over ICI.

Reference parity map lives in each module's docstring (file:line
citations into /root/reference).
"""

__version__ = "0.1.0"

from .utils import (  # noqa: F401
    Tick,
    Tock,
    green,
    yellow,
    red,
    cyan,
    seed_all,
    now,
    random_string,
    find_available_path,
    first_existing_path,
    next_available_path,
    convert_to_number,
)
from .config import FASTConfig, TrainConfig, ExperimentConfig, load_config  # noqa: F401

__all__ = [
    "__version__",
    "FASTConfig",
    "TrainConfig",
    "ExperimentConfig",
    "load_config",
    "Tick",
    "Tock",
    "green",
    "yellow",
    "red",
    "cyan",
    "seed_all",
    "now",
    "random_string",
    "find_available_path",
    "first_existing_path",
    "next_available_path",
    "convert_to_number",
]
