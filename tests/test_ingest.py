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
    """Byte-layout MATLAB v7.3 test fixture (VERDICT r3 item 8).

    Reproduces what ``save -v7.3`` actually writes, not just "an HDF5
    file with the right group": a 512-byte userblock carrying the
    MATLAB MAT-file text header + version word 0x0200 + 'IM' endian
    marker at offset 124 (HDF5 finds its superblock at offset 512);
    ``epo_test`` as an HDF5 GROUP with ``MATLAB_class=b'struct'``; and
    ``x`` stored the way MATLAB stores a column-major (T, C, N) double
    array — dims REVERSED to h5py's row-major view (N, C, T), float64,
    ``MATLAB_class=b'double'``. The loader must see (N, C, T) and cast
    to f32 (reference read: ``src/fast/data/preprocess.py:109-116``).
    """
    import h5py

    rng = np.random.default_rng(seed)
    x_matlab = rng.normal(size=(T_RAW, N_CH, n_trials))  # MATLAB-side (T, C, N)
    with h5py.File(path, "w", userblock_size=512) as f:
        g = f.create_group("epo_test")
        g.attrs["MATLAB_class"] = np.bytes_("struct")
        d = g.create_dataset("x", data=np.transpose(x_matlab, (2, 1, 0)))
        d.attrs["MATLAB_class"] = np.bytes_("double")
    header = (
        "MATLAB 7.3 MAT-file, Platform: GLNXA64, Created on: Wed Aug 19 "
        "00:00:00 2026 HDF5 schema 1.00 ."
    ).encode()
    block = header[:116].ljust(116, b" ") + b"\x00" * 8
    block += (0x0200).to_bytes(2, "little") + b"IM"
    with open(path, "r+b") as fo:
        fo.write(block.ljust(512, b"\x00"))
    return np.transpose(x_matlab, (2, 1, 0)).astype(np.float32)


def _col_name(c: int) -> str:
    s = ""
    c += 1
    while c:
        c, r = divmod(c - 1, 26)
        s = chr(65 + r) + s
    return s


def _write_xlsx(path: str, grid):
    """A REAL OOXML ``.xlsx`` workbook, written with the stdlib
    (zipfile + hand-built sheet XML) — the answer sheet's actual
    container format, exercised end-to-end without openpyxl. Numeric
    cells are ``t="n"``, text cells ``inlineStr``."""
    import zipfile

    rows_xml = []
    for r, row in enumerate(grid):
        cells = []
        for c, val in enumerate(row):
            if val is None or val == "":
                continue
            ref = f"{_col_name(c)}{r + 1}"
            try:
                float(val)
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            except (TypeError, ValueError):
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>')
        rows_xml.append(f'<row r="{r + 1}">{"".join(cells)}</row>')
    m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{m}"><sheetData>{"".join(rows_xml)}</sheetData></worksheet>'
    )
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{m}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


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
    # The REAL container format too: the same sheet as an OOXML workbook
    # (numeric label cells + a text header row like the shipped sheet).
    xlsx = os.path.join(base, "Test set", "Track3_Answer Sheet_Test.xlsx")
    n_cols = 2 * (len(SUBJECTS) + 1)
    grid = [["" for _ in range(n_cols)] for _ in range(3 + 50)]
    grid[0][0] = "Track#3 Imagined speech answer sheet"
    for i, labels in enumerate(test_labels):
        grid[2][2 * (i + 1)] = f"Data_Sample{SUBJECTS[i]}"
        for r, lab in enumerate(labels):
            grid[3 + r][2 * (i + 1)] = str(int(lab) + 1)
    _write_xlsx(xlsx, grid)
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

    def test_resolve_excel_prefers_xlsx(self, dataset_tree):
        base, _, _ = dataset_tree
        assert resolve_excel_path(base).endswith(".xlsx")

    def test_resolve_excel_falls_back_to_csv(self, dataset_tree):
        base, csv, _ = dataset_tree
        os.remove(os.path.join(base, "Test set", "Track3_Answer Sheet_Test.xlsx"))
        assert resolve_excel_path(base).endswith(".csv")

    def test_xlsx_answer_sheet(self, dataset_tree):
        """The REAL .xlsx container read without openpyxl: both through
        load_excel_labels' dispatch and the stdlib OOXML reader directly
        (mixed text + numeric cells, 1-5 -> 0-4)."""
        from imagined_speech_decoding_tpu.data.ingest import _read_xlsx_stdlib

        base, csv, expected = dataset_tree
        xlsx = os.path.join(base, "Test set", "Track3_Answer Sheet_Test.xlsx")
        via_dispatch = load_excel_labels(xlsx)
        via_csv = load_excel_labels(csv)
        for sid in SUBJECTS:
            np.testing.assert_array_equal(via_dispatch[sid], via_csv[sid])
        df = _read_xlsx_stdlib(xlsx)
        assert df.iloc[0, 0].startswith("Track#3")  # text cells survive
        np.testing.assert_array_equal(
            df.iloc[3:53, 2].to_numpy(np.float64) - 1,
            expected[("Test set", SUBJECTS[0])][1],
        )

    def test_mat73_byte_layout(self, dataset_tree):
        """The v7.3 fixture is MATLAB-shaped on disk: 512-byte userblock
        with the MAT-file text header, version 0x0200, 'IM' endianness,
        HDF5 superblock at offset 512, struct group + double dataset
        tagged with MATLAB_class."""
        import h5py

        base, _, _ = dataset_tree
        path = os.path.join(base, "Test set", f"Data_Sample{SUBJECTS[0]}.mat")
        with open(path, "rb") as f:
            head = f.read(516)
        assert head.startswith(b"MATLAB 7.3 MAT-file")
        assert head[124:126] == (0x0200).to_bytes(2, "little")
        assert head[126:128] == b"IM"
        assert head[512:516] == b"\x89HDF"  # superblock after the userblock
        with h5py.File(path, "r") as f:
            assert f["epo_test"].attrs["MATLAB_class"] == b"struct"
            assert f["epo_test"]["x"].attrs["MATLAB_class"] == b"double"
            assert f["epo_test"]["x"].dtype == np.float64
            assert f.userblock_size == 512


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


class TestStrictSchema:
    """``strict=True`` fails LOUDLY on schema deviations the reference
    (``src/fast/data/preprocess.py:49-129``) silently mis-loads: wrong
    montage width, wrong sample count, missing keys, non-one-hot labels,
    sheet/trial count mismatches (VERDICT r4 item 7). File-level checks
    guard against silently WRONG arrays; per-split trial totals are the
    cache manifest's job (``manifest_check``)."""

    def _v5(self, path, struct="epo_train", n=4, n_ch=64, t=795, mutate=None):
        import scipy.io

        rng = np.random.default_rng(0)
        x = rng.normal(size=(t, n_ch, n))
        labels = rng.integers(0, K, n)
        y = np.eye(K)[labels].T
        payload = {"x": x, "y": y}
        if mutate:
            mutate(payload)
        scipy.io.savemat(path, {struct: payload})
        return labels

    def test_accepts_documented_schema(self, tmp_path):
        from imagined_speech_decoding_tpu.data.ingest import _load_mat_epochs

        p = str(tmp_path / "good.mat")
        labels = self._v5(p)
        x, y = _load_mat_epochs(p, "epo_train", strict=True)
        assert x.shape == (4, 64, TARGET_TIMEPOINTS)
        np.testing.assert_array_equal(y, labels)

    def test_default_mode_stays_permissive(self, tmp_path):
        """strict=False keeps the reference's permissive contract — a
        6-channel fixture (this suite's own idiom) still loads."""
        from imagined_speech_decoding_tpu.data.ingest import _load_mat_epochs

        p = str(tmp_path / "small.mat")
        self._v5(p, n_ch=6)
        x, _ = _load_mat_epochs(p, "epo_train", strict=False)
        assert x.shape == (4, 6, TARGET_TIMEPOINTS)

    def test_wrong_channel_count(self, tmp_path):
        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            _load_mat_epochs,
        )

        p = str(tmp_path / "bad_ch.mat")
        self._v5(p, n_ch=6)
        with pytest.raises(SchemaError, match="6 channels.*64"):
            _load_mat_epochs(p, "epo_train", strict=True)

    def test_wrong_sample_count(self, tmp_path):
        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            _load_mat_epochs,
        )

        p = str(tmp_path / "bad_t.mat")
        self._v5(p, t=700)
        with pytest.raises(SchemaError, match="700 samples.*795"):
            _load_mat_epochs(p, "epo_train", strict=True)

    def test_missing_struct(self, tmp_path):
        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            _load_mat_epochs,
        )

        p = str(tmp_path / "wrong_struct.mat")
        self._v5(p, struct="epo_other")
        with pytest.raises(SchemaError, match="missing 'epo_train'.*epo_other"):
            _load_mat_epochs(p, "epo_train", strict=True)

    def test_missing_field(self, tmp_path):
        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            _load_mat_epochs,
        )

        p = str(tmp_path / "no_y.mat")
        self._v5(p, mutate=lambda d: d.pop("y"))
        with pytest.raises(SchemaError, match="'x' and 'y' fields"):
            _load_mat_epochs(p, "epo_train", strict=True)

    def test_non_one_hot_labels(self, tmp_path):
        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            _load_mat_epochs,
        )

        def corrupt(d):
            d["y"][:, 1] = 0.0  # a column with no 1 — argmax would fake class 0

        p = str(tmp_path / "bad_y.mat")
        self._v5(p, mutate=corrupt)
        with pytest.raises(SchemaError, match="one-hot"):
            _load_mat_epochs(p, "epo_train", strict=True)

    def test_mat73_wrong_channels(self, tmp_path):
        import h5py

        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            _load_mat73_test,
        )

        p = str(tmp_path / "t.mat")
        with h5py.File(p, "w") as f:
            f.create_group("epo_test").create_dataset(
                "x", data=np.zeros((50, 6, 795), np.float32)
            )
        with pytest.raises(SchemaError, match="6 channels.*64"):
            _load_mat73_test(p, strict=True)

    def test_mat73_missing_group(self, tmp_path):
        import h5py

        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            _load_mat73_test,
        )

        p = str(tmp_path / "t.mat")
        with h5py.File(p, "w") as f:
            f.create_dataset("other", data=np.zeros((3,)))
        with pytest.raises(SchemaError, match="no 'epo_test' group.*other"):
            _load_mat73_test(p, strict=True)

    def test_sheet_short_column(self, tmp_path):
        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            load_excel_labels,
        )

        labels = [np.random.default_rng(i).integers(0, K, 50) for i in range(len(SUBJECTS))]
        csv = str(tmp_path / "answers.csv")
        _write_answer_csv(csv, labels)
        rows = open(csv).read().splitlines()
        open(csv, "w").write("\n".join(rows[:-2]) + "\n")  # drop 2 label rows
        with pytest.raises(SchemaError, match="48 label rows.*50"):
            load_excel_labels(csv, strict=True)

    def test_test_trials_vs_sheet_mismatch(self, tmp_path):
        import h5py

        from imagined_speech_decoding_tpu.data.ingest import (
            SchemaError,
            load_test_set_per_subject,
        )

        base = str(tmp_path)
        os.makedirs(os.path.join(base, "Test set"))
        labels = [np.random.default_rng(i).integers(0, K, 50) for i in range(len(SUBJECTS))]
        csv = os.path.join(base, "Test set", "Track3_Answer Sheet_Test.csv")
        _write_answer_csv(csv, labels)
        p = os.path.join(base, "Test set", f"Data_Sample{SUBJECTS[0]}.mat")
        with h5py.File(p, "w") as f:
            f.create_group("epo_test").create_dataset(
                "x", data=np.zeros((10, 64, 795), np.float32)
            )
        with pytest.raises(SchemaError, match="10 test trials.*50 labels"):
            load_test_set_per_subject(base, csv, verbose=False, strict=True)


class TestManifestCheck:
    """Cache-level manifest validation (``data.cache.manifest_check``):
    per-split totals and tensor geometry must match the documented
    dataset (VERDICT r4 item 7's 'manifest check')."""

    def _official(self, path, n_train=600, n_ch=64, t=800):
        import h5py

        with h5py.File(path, "w") as f:
            # gzip+chunked with no writes: shapes exist, no data stored
            f.create_dataset(
                "X_train", shape=(n_train, n_ch, t), dtype="f4",
                compression="gzip", chunks=(1, n_ch, t),
            )
            f.create_dataset("Y_train", shape=(n_train,), dtype="u1",
                             compression="gzip", chunks=(n_train,))

    def test_official_ok(self, tmp_path):
        from imagined_speech_decoding_tpu.data.cache import manifest_check

        p = str(tmp_path / "c.h5")
        self._official(p)
        shapes = manifest_check(p, verbose=False)
        assert shapes["X_train"] == (600, 64, 800)

    def test_official_bad_trial_total(self, tmp_path):
        from imagined_speech_decoding_tpu.data.cache import manifest_check
        from imagined_speech_decoding_tpu.data.ingest import SchemaError

        p = str(tmp_path / "c.h5")
        self._official(p, n_train=590)  # not a multiple of 300
        with pytest.raises(SchemaError, match="train"):
            manifest_check(p, verbose=False)

    def test_official_bad_channels(self, tmp_path):
        from imagined_speech_decoding_tpu.data.cache import manifest_check
        from imagined_speech_decoding_tpu.data.ingest import SchemaError

        p = str(tmp_path / "c.h5")
        self._official(p, n_ch=32)
        with pytest.raises(SchemaError, match="expected"):
            manifest_check(p, verbose=False)

    def test_subjects_layout(self, tmp_path):
        import h5py

        from imagined_speech_decoding_tpu.data.cache import manifest_check
        from imagined_speech_decoding_tpu.data.ingest import SchemaError

        p = str(tmp_path / "s.h5")
        with h5py.File(p, "w") as f:
            for sid, n in (("01", 350), ("02", 340)):  # 02 deviates
                g = f.create_group(sid)
                g.create_dataset("X", shape=(n, 64, 800), dtype="f4",
                                 compression="gzip", chunks=(1, 64, 800))
                g.create_dataset("Y", shape=(n,), dtype="u1",
                                 compression="gzip", chunks=(n,))
        with pytest.raises(SchemaError, match="02"):
            manifest_check(p, verbose=False)

    def test_subjects_layout_partial_pool_ok(self, tmp_path):
        """A 300-trial pool (train split only — missing valid is
        TOLERATED, not deviating) passes the manifest."""
        import h5py

        from imagined_speech_decoding_tpu.data.cache import manifest_check

        p = str(tmp_path / "s.h5")
        with h5py.File(p, "w") as f:
            g = f.create_group("01")
            g.create_dataset("X", shape=(300, 64, 800), dtype="f4",
                             compression="gzip", chunks=(1, 64, 800))
            g.create_dataset("Y", shape=(300,), dtype="u1",
                             compression="gzip", chunks=(300,))
        shapes = manifest_check(p, verbose=False)
        assert shapes["01/X"] == (300, 64, 800)

    def test_official_missing_y_raises_schema_error(self, tmp_path):
        import h5py

        from imagined_speech_decoding_tpu.data.cache import manifest_check
        from imagined_speech_decoding_tpu.data.ingest import SchemaError

        p = str(tmp_path / "c.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("X_train", shape=(600, 64, 800), dtype="f4",
                             compression="gzip", chunks=(1, 64, 800))
        with pytest.raises(SchemaError, match="no Y_train"):
            manifest_check(p, verbose=False)
