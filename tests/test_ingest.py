"""Ingest-path tests on synthetic fixtures (no real dataset needed).

Covers the raw ``.mat`` v5 struct parsing, v7.3 (HDF5) test files, and
the CSV answer-sheet fallback — the reference test idiom of exercising
I/O with generated files (``/root/reference/tests/test_data.py:187-230``
round-trips HDF5 the same way).
"""

import os

import numpy as np
import pytest

from imagined_speech_decoding_tpu.data.constants import SUBJECTS, TARGET_TIMEPOINTS
from imagined_speech_decoding_tpu.data.ingest import (
    load_excel_labels,
    load_subject_train_val,
    load_test_set,
    load_test_set_per_subject,
    load_training_set,
    load_validation_set,
    resolve_excel_path,
)

N_CH, T_RAW, N_TRIALS, K = 6, 795, 10, 5


def _write_mat_v5(path: str, struct: str, n_trials: int, seed: int):
    """Synthetic v5 .mat with the competition layout: x (T, C, N), one-hot y."""
    import scipy.io

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(T_RAW, N_CH, n_trials)).astype(np.float64)
    labels = rng.integers(0, K, n_trials)
    y = np.eye(K)[labels].T  # (K, N) one-hot
    scipy.io.savemat(path, {struct: {"x": x, "y": y}})
    return np.transpose(x, (2, 1, 0)).astype(np.float32), labels


def _write_mat73(path: str, n_trials: int, seed: int):
    """Synthetic v7.3-style test file: h5py with epo_test/x (N, C, T)."""
    import h5py

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_trials, N_CH, T_RAW)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("epo_test/x", data=x)
    return x


def _write_answer_csv(path: str, labels_per_subject):
    """Answer-sheet layout: subject i in column 2*(i+1), rows 3..52, 1-5."""
    n_rows = 3 + 50
    n_cols = 2 * (len(SUBJECTS) + 1)
    grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for i, labels in enumerate(labels_per_subject):
        col = 2 * (i + 1)
        for r, lab in enumerate(labels):
            grid[3 + r][col] = str(int(lab) + 1)
    with open(path, "w") as f:
        for row in grid:
            f.write(",".join(row) + "\n")


@pytest.fixture
def dataset_tree(tmp_path):
    """A miniature BCIC2020 tree: 2 subjects with train/val/test + answers."""
    base = str(tmp_path)
    expected = {}
    for split, struct in (("Training set", "epo_train"), ("Validation set", "epo_validation")):
        os.makedirs(os.path.join(base, split))
        for j, sid in enumerate(SUBJECTS[:2]):
            x, y = _write_mat_v5(
                os.path.join(base, split, f"Data_Sample{sid}.mat"),
                struct, N_TRIALS, seed=hash((split, j)) % 2**31,
            )
            expected[(split, sid)] = (x, y)
    os.makedirs(os.path.join(base, "Test set"))
    test_labels = []
    for j, sid in enumerate(SUBJECTS):
        lab = np.random.default_rng(100 + j).integers(0, K, 50)
        test_labels.append(lab)
        if j < 2:
            x = _write_mat73(
                os.path.join(base, "Test set", f"Data_Sample{sid}.mat"), 50, 200 + j
            )
            expected[("Test set", sid)] = (x, lab)
    csv = os.path.join(base, "Test set", "Track3_Answer Sheet_Test.csv")
    _write_answer_csv(csv, test_labels)
    return base, csv, expected


class TestMatV5:
    def test_training_set_shapes_and_padding(self, dataset_tree):
        base, _, expected = dataset_tree
        x, y = load_training_set(base, verbose=False)
        assert x.shape == (2 * N_TRIALS, N_CH, TARGET_TIMEPOINTS)
        assert x.dtype == np.float32 and y.dtype == np.uint8
        # edge padding repeats the last raw sample
        np.testing.assert_array_equal(x[..., T_RAW - 1], x[..., -1])
        # content round-trips: first subject's block matches the fixture
        ref_x, ref_y = expected[("Training set", SUBJECTS[0])]
        np.testing.assert_allclose(x[:N_TRIALS, :, :T_RAW], ref_x, rtol=1e-6)
        np.testing.assert_array_equal(y[:N_TRIALS], ref_y)

    def test_validation_set(self, dataset_tree):
        base, _, expected = dataset_tree
        x, y = load_validation_set(base, verbose=False)
        ref_x, ref_y = expected[("Validation set", SUBJECTS[1])]
        np.testing.assert_allclose(x[N_TRIALS:, :, :T_RAW], ref_x, rtol=1e-6)
        np.testing.assert_array_equal(y[N_TRIALS:], ref_y)

    def test_subject_train_val_merge(self, dataset_tree):
        base, _, expected = dataset_tree
        x, y = load_subject_train_val(base, SUBJECTS[0])
        assert x.shape == (2 * N_TRIALS, N_CH, TARGET_TIMEPOINTS)
        tr_y = expected[("Training set", SUBJECTS[0])][1]
        va_y = expected[("Validation set", SUBJECTS[0])][1]
        np.testing.assert_array_equal(y, np.concatenate([tr_y, va_y]))

    def test_missing_subject_raises(self, dataset_tree):
        base, _, _ = dataset_tree
        with pytest.raises(FileNotFoundError):
            load_subject_train_val(base, SUBJECTS[5])


class TestMat73AndLabels:
    def test_csv_answer_sheet(self, dataset_tree):
        base, csv, expected = dataset_tree
        labels = load_excel_labels(csv)
        assert set(labels) == set(SUBJECTS)
        np.testing.assert_array_equal(labels[SUBJECTS[0]], expected[("Test set", SUBJECTS[0])][1])
        assert labels[SUBJECTS[0]].dtype == np.uint8
        assert labels[SUBJECTS[0]].min() >= 0 and labels[SUBJECTS[0]].max() <= K - 1

    def test_test_set_per_subject(self, dataset_tree):
        base, csv, expected = dataset_tree
        per = load_test_set_per_subject(base, csv, verbose=False)
        assert set(per) == set(SUBJECTS[:2])
        x, y = per[SUBJECTS[1]]
        ref_x, ref_y = expected[("Test set", SUBJECTS[1])]
        assert x.shape == (50, N_CH, TARGET_TIMEPOINTS)
        np.testing.assert_allclose(x[..., :T_RAW], ref_x, rtol=1e-6)
        np.testing.assert_array_equal(y, ref_y)

    def test_test_set_concatenated(self, dataset_tree):
        base, csv, _ = dataset_tree
        x, y = load_test_set(base, csv, verbose=False)
        assert x.shape == (100, N_CH, TARGET_TIMEPOINTS)
        assert y.shape == (100,)

    def test_resolve_excel_falls_back_to_csv(self, dataset_tree):
        base, csv, _ = dataset_tree
        assert resolve_excel_path(base) == os.path.abspath(csv) or resolve_excel_path(
            base
        ).endswith(".csv")


class TestLabelValidation:
    def test_blank_cell_raises_not_class0(self, tmp_path):
        """A blank answer-sheet cell must raise, not silently become
        class 0 via the NaN -> uint8 cast."""
        from imagined_speech_decoding_tpu.data.ingest import load_excel_labels

        labels = [np.random.default_rng(i).integers(0, K, 50) for i in range(len(SUBJECTS))]
        csv = str(tmp_path / "answers.csv")
        _write_answer_csv(csv, labels)
        # blank out one cell of subject 3's column
        rows = open(csv).read().splitlines()
        cells = rows[10].split(",")
        cells[2 * 3] = ""
        rows[10] = ",".join(cells)
        open(csv, "w").write("\n".join(rows) + "\n")
        with pytest.raises(ValueError, match="invalid label cells"):
            load_excel_labels(csv)

    def test_out_of_range_raises(self, tmp_path):
        from imagined_speech_decoding_tpu.data.ingest import load_excel_labels

        labels = [np.random.default_rng(i).integers(0, K, 50) for i in range(len(SUBJECTS))]
        csv = str(tmp_path / "answers.csv")
        _write_answer_csv(csv, labels)
        rows = open(csv).read().splitlines()
        cells = rows[5].split(",")
        cells[2] = "9"  # label must be 1-5
        rows[5] = ",".join(cells)
        open(csv, "w").write("\n".join(rows) + "\n")
        with pytest.raises(ValueError, match="invalid label cells"):
            load_excel_labels(csv)
