"""Data-layer tests: constants invariants, zone layout, cache round-trip,
batching semantics, synthetic generator.

Mirrors the reference test strategy (``tests/test_data.py``): invariants
on the dataset constants, and HDF5 round-trips on synthetic arrays so no
real dataset is required.
"""

import numpy as np
import pytest

from imagined_speech_decoding_tpu.data import (
    CLASSES,
    Electrodes,
    SUBJECTS,
    TARGET_TIMEPOINTS,
    Zones,
    build_subject_cache,
    flatten_subjects,
    load_standardized_h5,
    num_batches,
    sequential_batch_indices,
    shuffled_epoch_indices,
    synthetic_corpus,
    synthetic_trials,
    validate_atlas,
    zone_layout,
)


class TestConstants:
    def test_subject_count(self):
        assert len(SUBJECTS) == 15
        assert SUBJECTS[0] == "01" and SUBJECTS[-1] == "15"

    def test_class_count(self):
        assert len(CLASSES) == 5
        assert CLASSES == ("hello", "help-me", "stop", "thank-you", "yes")

    def test_montage(self):
        assert len(Electrodes) == 64
        assert len(set(Electrodes)) == 64

    def test_zone_partition(self):
        validate_atlas()  # raises on overlap/missing
        assert len(Zones) == 8
        assert sum(len(v) for v in Zones.values()) == 64

    def test_target_timepoints(self):
        assert TARGET_TIMEPOINTS == 800


class TestZoneLayout:
    def test_shapes(self):
        zl = zone_layout()
        assert zl.n_zones == 8
        assert zl.c_max == 15  # Parietal is the widest zone
        assert zl.indices.shape == (8, 15)
        assert zl.mask.shape == (8, 15)
        assert zl.counts.tolist() == [6, 9, 6, 7, 7, 10, 15, 4]

    def test_indices_match_names(self):
        zl = zone_layout()
        for zi, zname in enumerate(zl.names):
            chans = Zones[zname]
            for ci, ch in enumerate(chans):
                assert Electrodes[zl.indices[zi, ci]] == ch
                assert zl.mask[zi, ci]
            # padded slots are masked out
            assert not zl.mask[zi, len(chans):].any()

    def test_mask_counts(self):
        zl = zone_layout()
        assert (zl.mask.sum(axis=1) == zl.counts).all()

    def test_unknown_channel_raises(self):
        with pytest.raises(ValueError):
            zone_layout(["A", "B"], {"z": ["A", "NOPE"]})

    def test_c_max_override(self):
        zl = zone_layout(c_max=16)
        assert zl.c_max == 16
        with pytest.raises(ValueError):
            zone_layout(c_max=3)


class TestCacheRoundTrip:
    def test_subject_cache_round_trip(self, tmp_dir, monkeypatch):
        # Synthesize per-subject arrays, write via the cache writer by
        # monkeypatching ingest, then read back and compare exactly.
        from imagined_speech_decoding_tpu.data import ingest

        rng = np.random.default_rng(0)
        data = {
            sid: (
                rng.normal(size=(7, 4, 20)).astype(np.float32),
                rng.integers(0, 5, 7).astype(np.uint8),
            )
            for sid in SUBJECTS[:3]
        }
        monkeypatch.setattr(
            ingest, "load_subject_train_val",
            lambda folder, sid, strict=False: data[sid],
        )

        path = f"{tmp_dir}/cache.h5"
        build_subject_cache("unused", path, subjects=SUBJECTS[:3], verbose=False)
        x, y = load_standardized_h5(path, verbose=False)
        assert x.shape == (3, 7, 4, 20)
        for i, sid in enumerate(sorted(data.keys())):
            np.testing.assert_array_equal(x[i], data[sid][0])
            np.testing.assert_array_equal(y[i], data[sid][1])


class TestBatching:
    def test_num_batches(self):
        assert num_batches(280, 64) == 5
        assert num_batches(64, 64) == 1
        assert num_batches(65, 64) == 2

    def test_shuffled_epoch_covers_all(self):
        import jax

        idx, w = shuffled_epoch_indices(jax.random.PRNGKey(0), 280, 64)
        assert idx.shape == (5, 64) and w.shape == (5, 64)
        real = np.asarray(idx).ravel()[np.asarray(w).ravel() > 0]
        assert sorted(real.tolist()) == list(range(280))
        assert float(np.asarray(w).sum()) == 280.0

    def test_shuffled_differs_by_key(self):
        import jax

        i1, _ = shuffled_epoch_indices(jax.random.PRNGKey(0), 100, 10)
        i2, _ = shuffled_epoch_indices(jax.random.PRNGKey(1), 100, 10)
        assert not np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_sequential_indices(self):
        idx, w = sequential_batch_indices(10, 4)
        assert idx.shape == (3, 4)
        np.testing.assert_array_equal(idx[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(w[2], [1, 1, 0, 0])

    def test_flatten_subjects(self):
        x = np.zeros((3, 5, 4, 10), np.float32)
        y = np.zeros((3, 5), np.uint8)
        xf, yf = flatten_subjects(x, y)
        assert xf.shape == (15, 4, 10) and yf.shape == (15,)
        x3, y3 = flatten_subjects(xf, yf)  # 3-D passes through
        assert x3.shape == (15, 4, 10) and y3.shape == (15,)


class TestSynthetic:
    def test_shapes_and_labels(self):
        x, y = synthetic_trials(0, 20, n_channels=8, n_samples=100)
        assert x.shape == (20, 8, 100) and x.dtype == np.float32
        assert y.shape == (20,) and y.max() < 5

    def test_deterministic(self):
        x1, y1 = synthetic_trials(7, 10, 4, 50)
        x2, y2 = synthetic_trials(7, 10, 4, 50)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)

    def test_corpus(self):
        x, y = synthetic_corpus(0, n_subjects=2, n_trials=6, n_channels=4, n_samples=50)
        assert x.shape == (2, 6, 4, 50) and y.shape == (2, 6)
        assert not np.array_equal(x[0], x[1])  # per-subject seeds differ

    def test_class_signal_present(self):
        # Class-conditional structure: within-class mean power at the class
        # frequencies should exceed cross-class, crude sanity check.
        x, y = synthetic_trials(3, 200, n_channels=16, n_samples=256, snr=2.0)
        m0 = x[y == 0].mean(axis=0)
        m1 = x[y == 1].mean(axis=0)
        assert np.abs(m0 - m1).mean() > 0.05
