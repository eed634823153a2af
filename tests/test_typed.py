"""Typed test matrix: every core pipeline over real_type x label_type.

reference analog: tests/types_to_test.hpp:46-49 — the reference instantiates
its DataSet / CSVM / IO suites as TEMPLATE tests over
{float, double} x {bool, ..., int, ..., std::string}.  The runtime label
types here are int / float / str / bool (data_set.py:39-64); the real-type
axis is the ``real_dtype`` fixture, the label axis ``label_case``.
"""

import numpy as np
import pytest

from conftest import typed_blobs
from plssvm_tpu import CSVM, DataSet, Model


def _label_type_of(name):
    return {"int": int, "float": float, "str": str, "bool": bool}[name]


class TestTypedDataSet:
    def test_from_arrays_preserves_labels(self, real_dtype, label_case):
        name, _, neg, pos = label_case
        X, labels = typed_blobs(24, 4, (neg, pos), seed=31, dtype=real_dtype)
        ds = DataSet(X, labels, dtype=real_dtype)
        assert ds.labels is not None
        assert list(ds.different_labels) == sorted([neg, pos])
        assert set(ds.labels.tolist()) == {neg, pos}
        assert ds.data.dtype == real_dtype

    def test_label_mapping_round_trip(self, real_dtype, label_case):
        name, _, neg, pos = label_case
        X, labels = typed_blobs(16, 3, (neg, pos), seed=32, dtype=real_dtype)
        ds = DataSet(X, labels)
        mapped = ds.mapper.map_labels(labels)
        assert set(np.unique(mapped).tolist()) == {-1.0, 1.0}
        back = [ds.mapper.label_by_mapped_value(v) for v in mapped]
        assert back == labels.tolist()


class TestTypedIO:
    @pytest.mark.parametrize("fmt", ["libsvm", "arff"])
    def test_write_read_round_trip(self, tmp_path, real_dtype, label_case, fmt):
        """File round-trip preserves data (to dtype precision) and labels
        (via an explicit label_type, as the reference's template param)."""
        name, _, neg, pos = label_case
        X, labels = typed_blobs(20, 5, (neg, pos), seed=33, dtype=real_dtype)
        ds = DataSet(X, labels, dtype=real_dtype)
        path = str(tmp_path / f"rt.{fmt}")
        ds.save(path, file_format=fmt)
        loaded = DataSet(
            path, dtype=real_dtype, label_type=_label_type_of(name)
        )
        # the writers emit {:.10e} (the reference's format) — 10 significant
        # digits bound the f64 round-trip error
        rtol = 1e-6 if real_dtype == np.float32 else 1e-9
        np.testing.assert_allclose(loaded.data, ds.data, rtol=rtol)
        assert loaded.labels.tolist() == labels.tolist()

    def test_label_type_mismatch_raises(self, tmp_path, label_case):
        """Reading non-bool-convertible labels as bool must raise, like the
        reference's label conversion errors (libsvm_parsing.hpp)."""
        name, _, neg, pos = label_case
        if name == "bool":
            pytest.skip("bool labels convert to bool by definition")
        X, labels = typed_blobs(10, 3, (neg, pos), seed=34)
        path = str(tmp_path / "m.libsvm")
        DataSet(X, labels).save(path, file_format="libsvm")
        from plssvm_tpu.exceptions import DataSetError

        with pytest.raises(DataSetError):
            DataSet(path, label_type=bool)


class TestTypedCSVM:
    def test_fit_predict_score(self, real_dtype, label_case):
        """End-to-end train/predict over the full typed matrix; predictions
        come back in the ORIGINAL label type (reference: GenericCSVM typed
        suites, tests/csvm.cpp)."""
        name, _, neg, pos = label_case
        X, labels = typed_blobs(60, 6, (neg, pos), seed=35, dtype=real_dtype)
        ds = DataSet(X, labels)
        svm = CSVM(backend="xla", dtype=real_dtype, kernel_type="rbf")
        model = svm.fit(ds)
        pred = svm.predict(model, ds)
        assert set(pred.tolist()) <= {neg, pos}
        assert type(pred.tolist()[0]) is type(labels.tolist()[0])
        assert svm.score(model) >= 0.9

    def test_model_file_round_trip(self, tmp_path, real_dtype, label_case):
        """Model save/load preserves labels and predictions for every
        real x label combination (reference: model file typed suites)."""
        name, _, neg, pos = label_case
        X, labels = typed_blobs(30, 4, (neg, pos), seed=36, dtype=real_dtype)
        ds = DataSet(X, labels)
        svm = CSVM(backend="xla", dtype=real_dtype, kernel_type="linear")
        model = svm.fit(ds)
        path = str(tmp_path / "typed.model")
        model.save(path)
        loaded = Model.load(path, label_type=_label_type_of(name))
        assert loaded.rho == pytest.approx(model.rho, rel=1e-5, abs=1e-6)
        test_ds = DataSet(X[:7], dtype=real_dtype)
        np.testing.assert_array_equal(
            svm.predict(model, test_ds), svm.predict(loaded, test_ds)
        )
