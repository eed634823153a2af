"""Native C++ LIBSVM parser/writer: parity with the NumPy implementation.

The native path (plssvm_tpu/native/libsvm_parser.cpp) must be perfectly
interchangeable with the Python parser — same matrices, same labels, same
exception messages on every invalid-file fixture.
"""

import glob
import os

import numpy as np
import pytest

from plssvm_tpu.exceptions import InvalidFileFormatError
from plssvm_tpu.io.file_reader import read_lines
from plssvm_tpu.io.libsvm import (
    parse_libsvm_lines,
    write_libsvm_file,
    write_libsvm_lines,
)
from plssvm_tpu.native import (
    native_available,
    parse_libsvm_native,
    write_libsvm_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no toolchain)"
)

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data", "libsvm")


def _python_parse(path):
    return parse_libsvm_lines(read_lines(path, comment="#"))


@pytest.mark.parametrize(
    "name",
    ["6x3.libsvm", "6x3_sparse.libsvm", "6x3_string_labels.libsvm",
     "3x2_without_label.libsvm"],
)
def test_valid_files_match_python(name):
    path = os.path.join(DATA, name)
    X_native, labels_native = parse_libsvm_native(path)
    X_py, labels_py = _python_parse(path)
    np.testing.assert_array_equal(X_native, X_py)
    assert labels_native == labels_py


def test_reference_500x200(reference_data_dir):
    path = os.path.join(reference_data_dir, "libsvm", "500x200.libsvm")
    X_native, labels_native = parse_libsvm_native(path)
    X_py, labels_py = _python_parse(path)
    np.testing.assert_array_equal(X_native, X_py)
    assert labels_native == labels_py


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(DATA, "invalid", "*.libsvm")))
)
def test_invalid_corpus_same_error_message(path):
    with pytest.raises(InvalidFileFormatError) as native_err:
        parse_libsvm_native(path)
    with pytest.raises(InvalidFileFormatError) as py_err:
        _python_parse(path)
    assert str(native_err.value) == str(py_err.value)


def test_write_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(20, 7))
    X[rng.random(X.shape) < 0.3] = 0.0
    labels = np.asarray([1, -1] * 10)

    native_file = tmp_path / "native.libsvm"
    assert write_libsvm_native(str(native_file), X, labels)
    py_lines = write_libsvm_lines(X, labels)
    native_lines = native_file.read_text().splitlines()
    # python lines carry a trailing space before the newline; strip both
    assert [l.rstrip() for l in native_lines] == [l.rstrip() for l in py_lines]


def test_write_without_labels(tmp_path):
    X = np.asarray([[1.5, 0.0], [0.0, -2.0]])
    f = tmp_path / "nolabel.libsvm"
    assert write_libsvm_native(str(f), X, None)
    X2, labels2 = parse_libsvm_native(str(f))
    np.testing.assert_array_equal(X2, X)
    assert labels2 is None


def test_roundtrip_via_public_writer(tmp_path):
    """write_libsvm_file (native-first) content parses back identically."""
    rng = np.random.default_rng(1)
    X = rng.normal(size=(50, 9))
    labels = np.asarray(["a", "b"] * 25, dtype=object)
    f = tmp_path / "round.libsvm"
    write_libsvm_file(str(f), X, labels)
    X2, labels2 = parse_libsvm_native(str(f))
    np.testing.assert_allclose(X2, X, rtol=1e-9)  # %.10e keeps 11 significant digits
    assert labels2 == list(labels)


def test_empty_file(tmp_path):
    f = tmp_path / "empty.libsvm"
    f.write_text("")
    with pytest.raises(InvalidFileFormatError, match="no data points"):
        parse_libsvm_native(str(f))


def test_comments_and_blank_lines(tmp_path):
    f = tmp_path / "comments.libsvm"
    f.write_text("# header comment\n\n1 1:1.0 3:2.0\n   \n-1 2:4.0\n# tail\n")
    X, labels = parse_libsvm_native(str(f))
    np.testing.assert_array_equal(X, [[1.0, 0.0, 2.0], [0.0, 4.0, 0.0]])
    assert labels == ["1", "-1"]


class TestWindowedParse:
    """Offset-window native parsing (multi-host sharded ingest, round 2)."""

    def test_window_matches_full_parse(self, data_dir):
        from plssvm_tpu.native.loader import (
            native_available, parse_libsvm_native, parse_libsvm_native_window,
        )

        if not native_available():
            pytest.skip("native parser unavailable")
        f = os.path.join(data_dir, "libsvm", "6x3.libsvm")
        full, labels = parse_libsvm_native(f)
        Xw, labels_all, n_total, d = parse_libsvm_native_window(f, 2, 5)
        assert n_total == full.shape[0] and d == full.shape[1]
        np.testing.assert_array_equal(Xw, full[2:5])
        assert labels_all == labels  # labels are always the FULL file's

    def test_zero_row_window_is_metadata_scan(self, data_dir):
        from plssvm_tpu.native.loader import (
            native_available, parse_libsvm_native_window,
        )

        if not native_available():
            pytest.skip("native parser unavailable")
        f = os.path.join(data_dir, "libsvm", "6x3.libsvm")
        Xw, labels_all, n_total, d = parse_libsvm_native_window(f, 0, 0)
        assert Xw.shape == (0, d)
        assert n_total == 6
        assert labels_all is not None and len(labels_all) == 6

    def test_window_clamps_past_eof(self, data_dir):
        from plssvm_tpu.native.loader import (
            native_available, parse_libsvm_native, parse_libsvm_native_window,
        )

        if not native_available():
            pytest.skip("native parser unavailable")
        f = os.path.join(data_dir, "libsvm", "6x3.libsvm")
        full, _ = parse_libsvm_native(f)
        Xw, _, n_total, _ = parse_libsvm_native_window(f, 4, 100)
        np.testing.assert_array_equal(Xw, full[4:])

    def test_window_still_validates_whole_file(self, data_dir):
        """A parse error OUTSIDE the window must still be reported — d and
        label consistency are global properties."""
        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.native.loader import (
            native_available, parse_libsvm_native_window,
        )

        if not native_available():
            pytest.skip("native parser unavailable")
        import tempfile

        with tempfile.NamedTemporaryFile(
            "w", suffix=".libsvm", delete=False
        ) as fh:
            fh.write("1 1:1.0 2:2.0\n")
            fh.write("-1 1:0.5 2:1.5\n")
            fh.write("1 2:1.0 1:2.0\n")  # decreasing indices -> invalid
            bad = fh.name
        try:
            with pytest.raises(InvalidFileFormatError):
                parse_libsvm_native_window(bad, 0, 2)  # error is in row 2
        finally:
            os.unlink(bad)
