"""Parser/writer tests over the fixture corpus.

reference analog: tests/detail/io/{libsvm_parsing,arff_parsing,
libsvm_model_parsing,scaling_factors_parsing}.cpp — every invalid fixture
asserts the exact exception class.
"""

import os

import numpy as np
import pytest

from plssvm_tpu.exceptions import FileNotFoundError_, InvalidFileFormatError
from plssvm_tpu.io import (
    parse_arff_lines,
    parse_libsvm_lines,
    parse_model_file,
    parse_scaling_factors,
    read_lines,
    write_scaling_factors,
)
from plssvm_tpu.io.libsvm import write_libsvm_lines
from plssvm_tpu.io.model_file import parse_model_header

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _fixture_names(kind: str, suffix: str):
    """All invalid-fixture base names under tests/data/<kind>/invalid/."""
    directory = os.path.join(_DATA_DIR, kind, "invalid")
    return sorted(
        f[: -len(suffix)] for f in os.listdir(directory) if f.endswith(suffix)
    )


class TestFileReader:
    def test_missing_file(self):
        with pytest.raises(FileNotFoundError_):
            read_lines("/nonexistent/file.libsvm")

    def test_comments_and_blank_lines_skipped(self, tmp_path):
        f = tmp_path / "x.libsvm"
        f.write_text("# comment\n\n1 1:2.0\n   \n# another\n-1 1:3.0\n")
        assert len(read_lines(str(f))) == 2


class TestLibsvmParser:
    def test_dense(self, data_dir):
        lines = read_lines(os.path.join(data_dir, "libsvm", "6x3.libsvm"))
        X, labels = parse_libsvm_lines(lines)
        assert X.shape == (6, 3)
        assert labels == ["1", "1", "1", "-1", "-1", "-1"]
        np.testing.assert_allclose(X[0], [0.5, -1.25, 2.0])

    def test_sparse(self, data_dir):
        lines = read_lines(os.path.join(data_dir, "libsvm", "6x3_sparse.libsvm"))
        X, labels = parse_libsvm_lines(lines)
        assert X.shape == (6, 3)
        np.testing.assert_allclose(X[0], [0.0, -1.25, 0.0])
        np.testing.assert_allclose(X[2], [0.0, 0.0, 1.0])

    def test_without_labels(self, data_dir):
        lines = read_lines(os.path.join(data_dir, "libsvm", "3x2_without_label.libsvm"))
        X, labels = parse_libsvm_lines(lines)
        assert labels is None
        assert X.shape == (3, 2)

    @pytest.mark.parametrize("name", _fixture_names("libsvm", ".libsvm"))
    def test_invalid(self, data_dir, name):
        path = os.path.join(data_dir, "libsvm", "invalid", f"{name}.libsvm")
        lines = read_lines(path)
        with pytest.raises(InvalidFileFormatError):
            parse_libsvm_lines(lines)

    def test_write_round_trip(self):
        X = np.array([[0.5, 0.0, -2.0], [0.0, 1.25, 0.0]])
        labels = np.array([1, -1])
        lines = write_libsvm_lines(X, labels)
        # zeros must be omitted (sparse writer)
        assert "2:" not in lines[0]
        X2, labels2 = parse_libsvm_lines(lines)
        np.testing.assert_allclose(X2, X)
        assert labels2 == ["1", "-1"]

    def test_reference_fixture_parity(self, reference_data_dir):
        lines = read_lines(os.path.join(reference_data_dir, "libsvm", "5x4.libsvm"))
        X, labels = parse_libsvm_lines(lines)
        assert X.shape == (5, 4)
        assert labels == ["1", "1", "-1", "-1", "-1"]

    @pytest.mark.parametrize(
        "name",
        [
            "zero_based_features",
            "non_increasing_indices",
            "non_strictly_increasing_indices",
            "inconsistent_label_specification",
            "missing_feature_value",
            "feature_with_alpha_char_at_the_beginning",
            "index_with_alpha_char_at_the_beginning",
            "invalid_colon_at_the_beginning",
            "invalid_colon_in_the_middle",
            "missing_index_value",
        ],
    )
    def test_reference_invalid_corpus(self, reference_data_dir, name):
        path = os.path.join(reference_data_dir, "libsvm", "invalid", f"{name}.libsvm")
        if not os.path.isfile(path):
            pytest.skip(f"fixture {name} absent")
        with pytest.raises(InvalidFileFormatError):
            parse_libsvm_lines(read_lines(path))


class TestArffParser:
    def test_dense(self, data_dir):
        lines = read_lines(os.path.join(data_dir, "arff", "6x3.arff"), comment="%")
        X, labels = parse_arff_lines(lines)
        assert X.shape == (6, 3)
        assert labels == ["1", "1", "1", "-1", "-1", "-1"]

    def test_sparse_with_class_mid_attributes(self, data_dir):
        lines = read_lines(os.path.join(data_dir, "arff", "6x3_sparse.arff"), comment="%")
        X, labels = parse_arff_lines(lines)
        assert X.shape == (4, 3)
        # class attr at header index 1 shifts later features down
        np.testing.assert_allclose(X[0], [0.5, -1.25, 2.0])
        assert labels == ["1", "1", "-1", "-1"]
        np.testing.assert_allclose(X[3], [0.0, 0.5, 0.0])

    @pytest.mark.parametrize("name", _fixture_names("arff", ".arff"))
    def test_invalid(self, data_dir, name):
        path = os.path.join(data_dir, "arff", "invalid", f"{name}.arff")
        with pytest.raises(InvalidFileFormatError):
            parse_arff_lines(read_lines(path, comment="%"))

    def test_reference_arff_parity(self, reference_data_dir):
        lines = read_lines(
            os.path.join(reference_data_dir, "arff", "5x4.arff"), comment="%"
        )
        X, labels = parse_arff_lines(lines)
        assert X.shape == (5, 4)

    def test_reference_sparse_arff(self, reference_data_dir):
        lines = read_lines(
            os.path.join(reference_data_dir, "arff", "5x4_sparse.arff"), comment="%"
        )
        X, labels = parse_arff_lines(lines)
        assert X.shape == (5, 4)
        # row 0: only class (index 2) set -> all features zero
        np.testing.assert_allclose(X[0], [0.0, 0.0, 0.0, 0.0])
        assert labels[0] == "-1"

    @pytest.mark.parametrize(
        "name",
        [
            "@_inside_data_section", "class_same_label_multiple_times",
            "class_unquoted_nominal_attribute", "class_with_only_one_label",
            "class_with_wrong_label", "class_without_label",
            "dense_missing_value", "dense_too_many_values", "multiple_classes",
            "no_data_attribute", "no_features",
            "nominal_attribute_with_wrong_name", "numeric_unquoted",
            "numeric_without_name", "relation_not_at_beginning",
            "relation_unquoted", "relation_without_name",
            "sparse_invalid_feature_index", "sparse_missing_closing_brace",
            "sparse_missing_label", "sparse_missing_opening_brace",
            "string_label_with_whitespace", "usage_of_undefined_label",
            "wrong_line",
        ],
    )
    def test_reference_invalid_arff_corpus(self, reference_data_dir, name):
        path = os.path.join(reference_data_dir, "arff", "invalid", f"{name}.arff")
        if not os.path.isfile(path):
            pytest.skip(f"fixture {name} absent")
        with pytest.raises(InvalidFileFormatError):
            parse_arff_lines(read_lines(path, comment="%"))


class TestModelParser:
    def test_valid(self, data_dir):
        params, rho, sv, alpha, labels, prob, svm_type = parse_model_file(
            os.path.join(data_dir, "model", "6x3_linear.libsvm.model")
        )
        assert prob is None
        assert rho == pytest.approx(0.1234567890123456)
        assert sv.shape == (6, 3)
        assert alpha.shape == (6,)
        assert labels == ["-1", "-1", "-1", "1", "1", "1"]
        assert params.gamma.is_default()

    @pytest.mark.parametrize("name", _fixture_names("model", ".libsvm.model"))
    def test_invalid(self, data_dir, name):
        path = os.path.join(data_dir, "model", "invalid", f"{name}.libsvm.model")
        with pytest.raises(InvalidFileFormatError):
            parse_model_file(path)

    def test_reference_model_parity(self, reference_data_dir):
        params, rho, sv, alpha, labels, prob, svm_type = parse_model_file(
            os.path.join(reference_data_dir, "model", "5x4_rbf.libsvm.model")
        )
        assert prob is None
        assert rho == pytest.approx(0.37330625882191915)
        assert params.gamma.value == pytest.approx(0.025)
        assert sv.shape == (5, 4)

    @pytest.mark.parametrize(
        "name",
        [
            "explicit_coef0_in_linear_kernel", "explicit_coef0_in_rbf_kernel",
            "explicit_degree_in_linear_kernel", "explicit_degree_in_rbf_kernel",
            "explicit_gamma_in_linear_kernel", "missing_kernel_type",
            "missing_label", "missing_nr_class", "missing_nr_sv", "missing_rho",
            "missing_support_vectors", "missing_sv", "missing_svm_type",
            "missing_total_sv", "nr_class_and_label_mismatch",
            "nr_class_and_nr_sv_mismatch", "same_class_multiple_times",
            "too_few_label", "too_few_nr_sv", "too_many_classes",
            "total_sv_and_nr_sv_mismatch", "unrecognized_header_entry",
            "wrong_kernel_type", "wrong_nr_class", "wrong_svm_type",
            "wrong_total_sv",
        ],
    )
    def test_reference_invalid_model_corpus(self, reference_data_dir, name):
        path = os.path.join(
            reference_data_dir, "model", "invalid", f"{name}.libsvm.model"
        )
        if not os.path.isfile(path):
            pytest.skip(f"fixture {name} absent")
        with pytest.raises(InvalidFileFormatError):
            parse_model_file(path)


class TestScalingFactors:
    def test_valid(self, data_dir):
        (lo, hi), factors = parse_scaling_factors(
            os.path.join(data_dir, "scaling", "valid.txt")
        )
        assert (lo, hi) == (-1.0, 1.0)
        assert factors.shape == (2, 3)
        # one-based in the file, zero-based in memory
        assert factors[0, 0] == 0 and factors[1, 0] == 2

    @pytest.mark.parametrize("name", ["zero_based", "no_header", "bad_interval"])
    def test_invalid(self, data_dir, name):
        with pytest.raises(InvalidFileFormatError):
            parse_scaling_factors(os.path.join(data_dir, "scaling", f"{name}.txt"))

    def test_round_trip(self, tmp_path):
        f = str(tmp_path / "factors.txt")
        factors = np.array([[0, -1.5, 2.5], [4, 0.0, 1.0]])
        write_scaling_factors(f, (-1.0, 1.0), factors)
        (lo, hi), read_back = parse_scaling_factors(f)
        np.testing.assert_allclose(read_back, factors)

    def test_reference_scaling_parity(self, reference_data_dir):
        (lo, hi), factors = parse_scaling_factors(
            os.path.join(reference_data_dir, "scaling_factors", "scaling_factors.txt")
        )
        assert (lo, hi) == (-1.4, 2.6)
        assert factors.shape == (4, 3)

    def test_reference_invalid_scaling_corpus(self, reference_data_dir):
        """Every file in the reference's invalid scaling-factors corpus
        (9 distinct parser-error shapes, tests/data/scaling_factors/invalid)
        must be rejected."""
        import glob

        corpus = sorted(
            glob.glob(
                os.path.join(
                    reference_data_dir, "scaling_factors", "invalid", "*.txt"
                )
            )
        )
        assert len(corpus) >= 9
        for path in corpus:
            with pytest.raises(InvalidFileFormatError):
                parse_scaling_factors(path)


class TestModelHeaderOrdering:
    def test_header_entries_any_order(self):
        # rho/label/nr_sv order varies across files (cf. 5x4 vs 500x200 models)
        lines = [
            "svm_type c_svc", "kernel_type rbf", "gamma 0.25", "nr_class 2",
            "total_sv 3", "rho 1.5", "label a b", "nr_sv 1 2", "SV", "dummy",
        ]
        hdr = parse_model_header(lines)
        assert hdr.rho == 1.5
        assert hdr.per_point_labels == ["a", "b", "b"]
        assert hdr.num_header_lines == 9
        assert hdr.nr_class == 2 and hdr.labels == ["a", "b"]
        assert hdr.total_sv == 3 and hdr.svm_type == "c_svc"


class TestModelHeaderRobustness:
    def test_tab_separated_header_values(self, tmp_path):
        # libsvm tokenizes with fscanf — tabs between key and value are legal
        path = str(tmp_path / "tabs.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type\tc_svc\nkernel_type\trbf\ngamma\t0.25\n"
                "nr_class\t2\ntotal_sv\t2\nrho\t1.5\nlabel\t1 -1\n"
                "nr_sv\t1 1\nSV\n"
                "0.5 1:1.0 2:2.0\n-0.5 1:3.0 2:4.0\n"
            )
        params, rho, sv, alpha, labels, prob, svm_type = parse_model_file(path)
        assert float(rho[0]) == 1.5
        assert params.gamma.value == 0.25
        assert labels == ["1", "-1"]
        assert sv.shape == (2, 2)

    def test_zero_nr_sv_count_rejected(self, tmp_path):
        # a zero class count would desync nr_class from the SV block
        path = str(tmp_path / "zero_count.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\nkernel_type linear\nnr_class 3\n"
                "total_sv 2\nrho 1 2 3\nlabel 0 1 2\nnr_sv 1 0 1\nSV\n"
                "0.5 0.1 0.2 1:1.0\n-0.5 0.3 -0.1 1:2.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="greater than 0"):
            parse_model_file(path)

    def test_regression_vector_probA_rejected(self, tmp_path):
        # SVR/one-class models carry ONE probA (the Laplace noise scale)
        path = str(tmp_path / "svr_vec_probA.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type epsilon_svr\nkernel_type linear\nnr_class 2\n"
                "total_sv 2\nrho 0.5\nprobA 0.1 0.2\nSV\n"
                "0.5 1:1.0\n-0.5 1:2.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="probA"):
            parse_model_file(path)


class TestIOReviewRegressions:
    """Round-8 IO review findings, pinned."""

    def _no_native(self, monkeypatch):
        import plssvm_tpu.native as native_mod

        def none(*a, **k):
            return None

        for fn in (
            "parse_libsvm_native", "parse_model_svs_native",
        ):
            if hasattr(native_mod, fn):
                monkeypatch.setattr(native_mod, fn, none)

    def test_model_fallback_all_zero_sv_row(self, tmp_path, monkeypatch):
        """A multiclass SV row with only alpha columns (an all-zero SV —
        legal: the writer omits zero features) must parse in the Python
        fallback like it does natively (was IndexError)."""
        from plssvm_tpu.io.model_file import parse_model_file

        content = (
            "svm_type c_svc\nkernel_type linear\nnr_class 3\ntotal_sv 3\n"
            "rho 0.1 0.2 0.3\nlabel 0 1 2\nnr_sv 1 1 1\nSV\n"
            "0.5 -0.3 1:1.0 2:2.0\n"
            "0.1 0.2\n"            # all-zero SV: alphas only
            "-0.2 0.4 2:3.0\n"
        )
        f = str(tmp_path / "zero_sv.model")
        open(f, "w").write(content)
        native = parse_model_file(f, dtype=np.float64)
        self._no_native(monkeypatch)
        fallback = parse_model_file(f, dtype=np.float64)
        np.testing.assert_array_equal(native[2], fallback[2])  # SVs
        np.testing.assert_array_equal(native[3], fallback[3])  # alpha
        assert fallback[2].shape == (3, 2)
        np.testing.assert_array_equal(fallback[2][1], [0.0, 0.0])

    def test_scaling_rejects_negative_and_fractional_index(self, tmp_path):
        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.scaling_file import parse_scaling_factors

        for bad_line in ("-1 0.0 1.0", "2.7 0.0 1.0"):
            f = str(tmp_path / "bad.txt")
            open(f, "w").write(f"x\n-1.0 1.0\n{bad_line}\n")
            with pytest.raises(InvalidFileFormatError):
                parse_scaling_factors(f)

    def test_header_stream_bounds_newline_less_files(self, tmp_path):
        """A newline-less prefix must respect the byte budget instead of
        buffering the whole file (was unbounded)."""
        from plssvm_tpu.io.file_reader import stream_header_lines

        f = str(tmp_path / "oneline.bin")
        open(f, "wb").write(b"x" * (4 << 20))  # 4 MB, no newline
        out = stream_header_lines(
            f, is_terminator=lambda s: s == "SV", comment="#",
            max_bytes=1024,
        )
        assert out is None

    def test_python_parser_error_order_matches_native(self, monkeypatch):
        """The FIRST bad line wins (native from_chars order): a value
        error on line 1 must not be shadowed by a structural error on
        line 2 discovered during the loop."""
        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.libsvm import parse_libsvm_lines

        with pytest.raises(
            InvalidFileFormatError, match="Can't convert 'abc'"
        ):
            parse_libsvm_lines(["1 1:abc", "1:5.0"], dtype=np.float64)

    def test_python_parser_rejects_underscored_literals(self):
        """std::from_chars rejects '1_5'; the Python fallback must too
        (accept/reject divergence, not just message parity)."""
        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.libsvm import parse_libsvm_lines

        with pytest.raises(
            InvalidFileFormatError, match="Can't convert '1_5'"
        ):
            parse_libsvm_lines(["1 1:1_5", "2 1:2.0"], dtype=np.float64)

    def test_plus_prefixed_index_accepted_like_native(self):
        """The native parse_index strips ONE leading '+' (Python-compat
        by design) — the fallback must accept '+5:' too; '++5'/'-5'
        stay rejected."""
        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.libsvm import parse_libsvm_lines

        data, _ = parse_libsvm_lines(["1 +5:1.0", "2 1:2.0"])
        assert data.shape == (2, 5)
        for bad in ("++5", "-5"):
            with pytest.raises(InvalidFileFormatError):
                parse_libsvm_lines([f"1 {bad}:1.0"])

    def test_python_parser_huge_index_raises_format_error(self):
        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.libsvm import parse_libsvm_lines

        with pytest.raises(InvalidFileFormatError, match="unsigned long"):
            parse_libsvm_lines(
                ["1 1:1.0 99999999999999999999999999:2.0"],
                dtype=np.float64,
            )

    def test_model_header_prefix_keys_rejected(self, tmp_path):
        """'gamma_x 0.5' must hit the unrecognized-header error, not be
        prefix-matched as gamma (token-exact fscanf semantics)."""
        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.model_file import parse_model_file

        content = (
            "svm_type c_svc\nkernel_type rbf\ngamma_x 0.5\nnr_class 2\n"
            "total_sv 1\nrho 0.1\nlabel 1 -1\nnr_sv 1 0\nSV\n"
            "0.5 1:1.0\n"
        )
        f = str(tmp_path / "prefix.model")
        open(f, "w").write(content)
        with pytest.raises(InvalidFileFormatError):
            parse_model_file(f, dtype=np.float64)

    def test_write_model_rejects_label_outside_class_list(self, tmp_path):
        """A shorter different_labels than the label set must raise (was
        an OOB read natively / a truncated file in the fallback)."""
        from plssvm_tpu.exceptions import InvalidFileFormatError
        from plssvm_tpu.io.model_file import write_model_file
        from plssvm_tpu.parameter import Parameter

        with pytest.raises(InvalidFileFormatError, match="class list"):
            write_model_file(
                str(tmp_path / "trunc.model"), Parameter(), 0.0,
                np.ones(3), np.ones((3, 2)),
                labels=np.asarray(["a", "b", "c"]),
                different_labels=["a", "b"],
            )
