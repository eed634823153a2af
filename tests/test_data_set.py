"""DataSet / LabelMapper / Scaling tests.

reference analog: tests/data_set.cpp.
"""

import os

import numpy as np
import pytest

from plssvm_tpu import DataSet, LabelMapper, Scaling
from plssvm_tpu.exceptions import DataSetError


class TestLabelMapper:
    def test_smaller_label_maps_to_minus_one(self):
        mapper = LabelMapper(np.array([5, 2, 5, 2]))
        assert mapper.mapped_value(2) == -1.0
        assert mapper.mapped_value(5) == +1.0
        assert mapper.label_by_mapped_value(-1.0) == 2

    def test_string_labels(self):
        mapper = LabelMapper(np.array(["dog", "cat"], dtype=object))
        assert mapper.mapped_value("cat") == -1.0  # lexicographically smaller
        assert mapper.labels() == ["cat", "dog"]

    def test_requires_at_least_two(self):
        # > 2 labels is supported since the one-vs-all multiclass extension
        # (tests/test_multiclass.py); a single label is still rejected
        assert LabelMapper(np.array([1, 2, 3])).num_mappings == 3
        with pytest.raises(DataSetError):
            LabelMapper(np.array([1, 1]))

    def test_unknown_label(self):
        mapper = LabelMapper(np.array([1, -1]))
        with pytest.raises(DataSetError):
            mapper.mapped_value(7)

    def test_map_labels_vectorized(self):
        mapper = LabelMapper(np.array([1, -1]))
        y = mapper.map_labels(np.array([1, -1, -1, 1]), dtype=np.float32)
        assert y.dtype == np.float32
        np.testing.assert_array_equal(y, [1.0, -1.0, -1.0, 1.0])

    def test_map_labels_unknown_raises(self):
        mapper = LabelMapper(np.array([1, -1]))
        with pytest.raises(DataSetError, match='Label "7" unknown'):
            mapper.map_labels(np.array([1, 7, -1]))

    def test_map_labels_string(self):
        mapper = LabelMapper(np.array(["dog", "cat"], dtype=object))
        np.testing.assert_array_equal(
            mapper.map_labels(np.asarray(["dog", "cat", "dog"], dtype=object)),
            [1.0, -1.0, 1.0],
        )


class TestDataSet:
    def test_from_arrays(self):
        X = np.array([[1.0, 2.0], [3.0, 4.0]])
        ds = DataSet(X, [1, -1])
        assert ds.num_data_points == 2
        assert ds.num_features == 2
        np.testing.assert_array_equal(ds.y, [1.0, -1.0])
        assert ds.different_labels == [-1, 1]

    def test_from_arrays_no_labels(self):
        ds = DataSet(np.ones((3, 2)))
        assert not ds.has_labels()
        assert ds.y is None

    def test_label_count_mismatch(self):
        with pytest.raises(DataSetError):
            DataSet(np.ones((3, 2)), [1, -1])

    def test_never_mutates_caller_array(self):
        # regression: a scaled DataSet constructed from a matching-dtype
        # contiguous array must NOT scale the caller's array in place
        X = np.array([[0.0, 10.0], [4.0, 20.0]], dtype=np.float64)
        original = X.copy()
        ds = DataSet(X, [1, -1], scaling=(-1.0, 1.0))
        np.testing.assert_array_equal(X, original)
        assert ds.data is not X
        assert not np.array_equal(ds.data, original)  # scaling did apply

    def test_from_file_autodetect(self, data_dir):
        ds_libsvm = DataSet(os.path.join(data_dir, "libsvm", "6x3.libsvm"))
        ds_arff = DataSet(os.path.join(data_dir, "arff", "6x3.arff"))
        np.testing.assert_allclose(ds_libsvm.data, ds_arff.data)
        assert list(ds_libsvm.labels) == list(ds_arff.labels)

    def test_label_type_inference(self, data_dir):
        ds = DataSet(os.path.join(data_dir, "libsvm", "6x3.libsvm"))
        assert ds.labels.dtype.kind == "i"
        ds = DataSet(os.path.join(data_dir, "libsvm", "6x3_string_labels.libsvm"))
        assert ds.labels[0] == "cat"
        assert ds.different_labels == ["cat", "dog"]

    def test_string_label_forced(self, data_dir):
        ds = DataSet(os.path.join(data_dir, "libsvm", "6x3.libsvm"), label_type=str)
        assert ds.labels[0] == "1"
        # "-1" < "1" lexicographically
        assert ds.different_labels == ["-1", "1"]

    def test_save_round_trip(self, data_dir, tmp_path):
        ds = DataSet(os.path.join(data_dir, "libsvm", "6x3.libsvm"))
        for fmt in ("libsvm", "arff"):
            out = str(tmp_path / f"out.{fmt}")
            ds.save(out, file_format=fmt)
            back = DataSet(out)
            np.testing.assert_allclose(back.data, ds.data, rtol=1e-9)
            assert list(back.labels) == list(ds.labels)


class TestScaling:
    def test_scale_to_interval(self):
        X = np.array([[0.0, 10.0], [5.0, 20.0], [10.0, 30.0]])
        ds = DataSet(X, [1, -1, 1], scaling=(-1.0, 1.0))
        np.testing.assert_allclose(ds.data.min(axis=0), [-1.0, -1.0])
        np.testing.assert_allclose(ds.data.max(axis=0), [1.0, 1.0])

    def test_all_zero_feature_untouched(self):
        """A feature with min == max == 0 gets no scaling factor
        (reference: data_set.hpp:692-695)."""
        X = np.array([[1.0, 0.0], [2.0, 0.0]])
        ds = DataSet(X, [1, -1], scaling=(-1.0, 1.0))
        np.testing.assert_array_equal(ds.data[:, 1], [0.0, 0.0])
        assert ds.scaling_factors.factors.shape[0] == 1

    def test_factors_save_restore(self, tmp_path):
        X = np.array([[0.0, 10.0], [5.0, 20.0], [10.0, 30.0]])
        ds = DataSet(X.copy(), [1, -1, 1], scaling=(-1.0, 1.0))
        f = str(tmp_path / "factors.txt")
        ds.scaling_factors.save(f)
        ds2 = DataSet(X.copy(), [1, -1, 1], scaling=Scaling(restore_filename=f))
        np.testing.assert_allclose(ds.data, ds2.data)

    def test_restore_too_many_factors(self, tmp_path):
        f = str(tmp_path / "factors.txt")
        with open(f, "w") as fh:
            fh.write("x\n-1 1\n1 0 1\n2 0 1\n3 0 1\n")
        with pytest.raises(DataSetError):
            DataSet(np.ones((2, 2)), [1, -1], scaling=Scaling(restore_filename=f))

    def test_restore_duplicate_factor(self, tmp_path):
        f = str(tmp_path / "factors.txt")
        with open(f, "w") as fh:
            fh.write("x\n-1 1\n1 0 1\n1 0 2\n")
        with pytest.raises(DataSetError):
            DataSet(np.ones((2, 2)), [1, -1], scaling=Scaling(restore_filename=f))

    def test_invalid_interval(self):
        with pytest.raises(DataSetError):
            Scaling(1.0, -1.0)
