"""Data layer: dataset constants, raw ingest, HDF5 cache, device batching.

Public surface mirrors the reference data package
(``src/fast/data/__init__.py:5-16``) plus the TPU-native additions
(zone layout builders, device batching, synthetic generator).
"""

from .constants import (  # noqa: F401
    CLASSES,
    Electrodes,
    NAME,
    SFREQ,
    SUBJECTS,
    TARGET_TIMEPOINTS,
    ZoneLayout,
    Zones,
    validate_atlas,
    zone_layout,
)
from .ingest import (  # noqa: F401
    load_excel_labels,
    load_subject_train_val,
    load_test_set,
    load_test_set_per_subject,
    load_training_set,
    load_validation_set,
    resolve_data_folder,
    resolve_excel_path,
)
from .cache import (  # noqa: F401
    build_official_cache,
    build_subject_cache,
    load_official_h5,
    load_standardized_h5,
)
from .arrays import (  # noqa: F401
    flatten_subjects,
    num_batches,
    sequential_batch_indices,
    shuffled_epoch_indices,
    to_device,
)
from .synthetic import synthetic_corpus, synthetic_trials  # noqa: F401

__all__ = [
    "CLASSES",
    "Electrodes",
    "NAME",
    "SFREQ",
    "SUBJECTS",
    "TARGET_TIMEPOINTS",
    "ZoneLayout",
    "Zones",
    "validate_atlas",
    "zone_layout",
    "load_excel_labels",
    "load_subject_train_val",
    "load_test_set",
    "load_test_set_per_subject",
    "load_training_set",
    "load_validation_set",
    "resolve_data_folder",
    "resolve_excel_path",
    "build_official_cache",
    "build_subject_cache",
    "load_official_h5",
    "load_standardized_h5",
    "flatten_subjects",
    "num_batches",
    "sequential_batch_indices",
    "shuffled_epoch_indices",
    "to_device",
    "synthetic_corpus",
    "synthetic_trials",
]
