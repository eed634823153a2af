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


class TestNativeModelIO:
    """Native model-file write/parse vs the Python path — byte parity."""

    def _make_model_arrays(self, n=60, d=7, C=1, seed=0, dtype=np.float64):
        rng = np.random.default_rng(seed)
        sv = rng.normal(size=(n, d)).astype(dtype)
        sv[rng.random(size=sv.shape) < 0.3] = 0.0  # sparse rows
        alpha = (
            rng.normal(size=n) if C == 1 else rng.normal(size=(n, C))
        ).astype(dtype)
        # repr edge cases: integral floats, tiny/huge magnitudes, -0.0,
        # non-finite values (a diverged solve must still round-trip)
        flat = alpha.reshape(-1)
        flat[0] = 1.0
        flat[1] = -0.0
        flat[2] = 1e16
        flat[3] = 1e-5
        flat[4] = 0.0001
        flat[5] = 9999999999999998.0
        flat[6] = np.inf
        flat[7] = -np.inf
        flat[8] = np.nan
        labels = np.asarray(["1" if i % 2 == 0 else "-1" for i in range(n)])
        return sv, alpha, labels

    @pytest.mark.parametrize("n_classes", [2, 3])
    @pytest.mark.parametrize("dtype", [np.float64, np.float32])
    def test_write_byte_identical_to_python(
        self, tmp_path, monkeypatch, n_classes, dtype
    ):
        from plssvm_tpu.io.model_file import write_model_file
        from plssvm_tpu.parameter import Parameter
        import plssvm_tpu.native as native_mod

        if not native_mod.native_available():
            pytest.skip("native library unavailable")
        C = 1 if n_classes == 2 else n_classes
        sv, alpha, labels = self._make_model_arrays(C=C, dtype=dtype)
        if n_classes == 3:
            labels = np.asarray([str(i % 3) for i in range(len(labels))])
        params = Parameter(kernel_type="rbf", gamma=0.25)
        rho = 0.5 if n_classes == 2 else np.asarray([0.5, -0.25, 1.0])
        diff = ["1", "-1"] if n_classes == 2 else ["0", "1", "2"]

        f_native = str(tmp_path / "native.model")
        write_model_file(f_native, params, rho, alpha, sv, labels, diff)

        f_python = str(tmp_path / "python.model")
        monkeypatch.setattr(
            native_mod, "write_model_native", lambda *a, **k: False
        )
        write_model_file(f_python, params, rho, alpha, sv, labels, diff)

        nat = open(f_native, "rb").read()
        pyt = open(f_python, "rb").read()
        # the creation-timestamp comment differs; compare from line 2 on
        assert nat.split(b"\n", 1)[1] == pyt.split(b"\n", 1)[1]

    @pytest.mark.parametrize("n_classes", [2, 3])
    def test_parse_native_matches_python(self, tmp_path, monkeypatch, n_classes):
        from plssvm_tpu.io.model_file import parse_model_file, write_model_file
        from plssvm_tpu.parameter import Parameter
        import plssvm_tpu.native as native_mod

        if not native_mod.native_available():
            pytest.skip("native library unavailable")
        C = 1 if n_classes == 2 else n_classes
        sv, alpha, labels = self._make_model_arrays(C=C, seed=3)
        if n_classes == 3:
            labels = np.asarray([str(i % 3) for i in range(len(labels))])
        params = Parameter(kernel_type="polynomial", degree=2, gamma=0.1,
                           coef0=1.5)
        rho = -0.75 if n_classes == 2 else np.asarray([0.5, -0.25, 1.0])
        diff = ["1", "-1"] if n_classes == 2 else ["0", "1", "2"]
        path = str(tmp_path / "m.model")
        write_model_file(path, params, rho, alpha, sv, labels, diff)

        got = parse_model_file(path)

        calls = {"native": 0}
        orig = native_mod.parse_model_svs_native

        def no_native(*a, **k):
            calls["native"] += 1
            return None

        monkeypatch.setattr(native_mod, "parse_model_svs_native", no_native)
        want = parse_model_file(path)
        assert calls["native"] == 1  # the fast path was attempted + bypassed

        np.testing.assert_array_equal(got[2], want[2])  # support vectors
        np.testing.assert_array_equal(got[3], want[3])  # alpha
        np.testing.assert_array_equal(got[1], want[1])  # rho
        assert got[4] == want[4]                        # labels
        assert got[0].equivalent(want[0])

    def test_parse_invalid_models_raise_same_errors(self):
        # the native fast path must bail out to the Python parser on every
        # invalid fixture so the exact reference error message survives
        import glob

        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.model_file import parse_model_file

        fixtures = sorted(glob.glob("tests/data/model/invalid/*.model"))
        assert len(fixtures) >= 20
        for path in fixtures:
            with pytest.raises(InvalidFileFormatError):
                parse_model_file(path)


class TestNativeArff:
    """Native ARFF data-section parse vs the Python path."""

    def _write(self, path, body, labels="{A,B}"):
        header = (
            "% comment\n@RELATION test\n"
            "@ATTRIBUTE f0 NUMERIC\n@ATTRIBUTE f1 NUMERIC\n"
            "@ATTRIBUTE f2 NUMERIC\n"
            + (f"@ATTRIBUTE class {labels}\n" if labels else "")
            + "@DATA\n" + body
        )
        open(path, "w").write(header)

    def test_dense_and_sparse_match_python(self, tmp_path, monkeypatch):
        from plssvm_tpu.io.arff import parse_arff_file
        import plssvm_tpu.native as native_mod

        if not native_mod.native_available():
            pytest.skip("native library unavailable")
        path = str(tmp_path / "t.arff")
        self._write(path, "1.0,2.5,-3.0,A\n"
                          "{0 4.0, 3 B}\n"
                          "{1 -1.5, 2 2.0, 3 A}\n"
                          "% mid-data comment\n"
                          "0.0,0.0,1.0,B\n")
        got = parse_arff_file(path)
        monkeypatch.setattr(
            native_mod, "parse_arff_data_native", lambda *a, **k: None
        )
        want = parse_arff_file(path)
        np.testing.assert_array_equal(got[0], want[0])
        assert got[1] == want[1]
        assert got[0].shape == (4, 3)

    def test_unlabeled_and_class_position(self, tmp_path, monkeypatch):
        from plssvm_tpu.io.arff import parse_arff_file
        import plssvm_tpu.native as native_mod

        if not native_mod.native_available():
            pytest.skip("native library unavailable")
        # CLASS attribute in the MIDDLE of the attribute list
        path = str(tmp_path / "mid.arff")
        open(path, "w").write(
            "@RELATION r\n@ATTRIBUTE a NUMERIC\n@ATTRIBUTE class {x,y}\n"
            "@ATTRIBUTE b NUMERIC\n@DATA\n"
            "1.0,x,2.0\n{0 3.0, 1 y, 2 4.0}\n"
        )
        got = parse_arff_file(path)
        monkeypatch.setattr(
            native_mod, "parse_arff_data_native", lambda *a, **k: None
        )
        want = parse_arff_file(path)
        np.testing.assert_array_equal(got[0], want[0])
        assert got[1] == want[1] == ["x", "y"]

        # unlabeled file
        path2 = str(tmp_path / "nolabel.arff")
        self._write(path2, "1.0,2.0,3.0\n{1 5.0}\n", labels=None)
        got2 = parse_arff_file(path2)
        want2 = parse_arff_file(path2)  # still monkeypatched -> python
        np.testing.assert_array_equal(got2[0], want2[0])
        assert got2[1] is None

    def test_invalid_arff_fixtures_raise_same_errors(self):
        import glob

        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.arff import parse_arff_file

        fixtures = sorted(glob.glob("tests/data/arff/invalid/*.arff"))
        assert len(fixtures) >= 20
        for path in fixtures:
            with pytest.raises(InvalidFileFormatError):
                parse_arff_file(path)


def test_native_arff_write_byte_identical(tmp_path, monkeypatch):
    from plssvm_tpu.io.arff import parse_arff_file, write_arff_file
    import plssvm_tpu.native as native_mod

    if not native_mod.native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    X = rng.normal(size=(40, 6))
    y = np.asarray(["A" if i % 2 == 0 else "B" for i in range(40)])

    f_nat = str(tmp_path / "nat.arff")
    write_arff_file(f_nat, X, y)
    f_py = str(tmp_path / "py.arff")
    monkeypatch.setattr(native_mod, "write_arff_native", lambda *a, **k: False)
    write_arff_file(f_py, X, y)
    assert open(f_nat, "rb").read() == open(f_py, "rb").read()

    # unlabeled variant (no trailing comma)
    f_nat2 = str(tmp_path / "nat2.arff")
    monkeypatch.undo()
    write_arff_file(f_nat2, X)
    f_py2 = str(tmp_path / "py2.arff")
    monkeypatch.setattr(native_mod, "write_arff_native", lambda *a, **k: False)
    write_arff_file(f_py2, X)
    assert open(f_nat2, "rb").read() == open(f_py2, "rb").read()
    # round-trips through the parser
    data, labels = parse_arff_file(f_nat)
    np.testing.assert_allclose(data, X, rtol=1e-10)
    assert labels == list(y)


class TestArffWindow:
    """Windowed native ARFF ingest (round 7 — streaming ARFF)."""

    def test_window_matches_full_parse(self, data_dir, reference_data_dir):
        import os

        from plssvm_tpu.io.arff import (
            parse_arff_file, parse_arff_file_window,
        )

        files = [
            os.path.join(data_dir, "arff", "6x3.arff"),
            os.path.join(data_dir, "arff", "6x3_sparse.arff"),
            os.path.join(reference_data_dir, "arff", "5x4.arff"),
            os.path.join(reference_data_dir, "arff", "5x4_sparse.arff"),
        ]
        for f in files:
            full, labels_full = parse_arff_file(f)
            n, d = full.shape
            # metadata scan: zero rows materialized, full label column
            meta = parse_arff_file_window(f, 0, 0)
            if meta is None:
                pytest.skip("native library unavailable")
            Xm, labs, n_total, nf = meta
            assert Xm.shape == (0, d) and (n_total, nf) == (n, d)
            if labels_full is None:
                assert labs is None
            else:
                assert labs == labels_full
            # interior window
            Xw, labs2, n2, _ = parse_arff_file_window(f, 1, n - 1)
            assert n2 == n
            np.testing.assert_allclose(Xw, full[1:n - 1])
            # window past the end clamps
            Xe, _, _, _ = parse_arff_file_window(f, n - 1, n + 5)
            np.testing.assert_allclose(Xe, full[n - 1:])

    def test_streaming_nystroem_arff_fallback(self, tmp_path):
        """nystroem_fit_from_file on an .arff file routes to the
        host-resident path (the byte-span index is LIBSVM-specific) and
        matches the in-memory fit exactly."""
        import plssvm_tpu
        from plssvm_tpu import DataSet, nystroem_fit, nystroem_fit_from_file
        from plssvm_tpu.io.arff import write_arff_file

        rng = np.random.default_rng(35)
        X = rng.normal(size=(90, 4))
        y = (X[:, 0] > 0).astype(np.int64)
        f = str(tmp_path / "ny.arff")
        write_arff_file(f, X, y)
        svm = plssvm_tpu.CSVM(backend="xla", dtype=np.float64,
                              kernel_type="rbf", gamma=0.3)
        m_file = nystroem_fit_from_file(
            svm, f, n_landmarks=16, random_state=3
        )
        m_mem = nystroem_fit(
            svm, DataSet(f, dtype=np.float64), n_landmarks=16,
            random_state=3,
        )
        np.testing.assert_allclose(m_file.alpha, m_mem.alpha,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(m_file.rho, m_mem.rho, rtol=1e-10)
