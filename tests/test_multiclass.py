"""One-vs-all multiclass classification (block CG) — EXTENSION tests.

The reference rejects > 2 labels (data_set.hpp:443,
libsvm_model_parsing.hpp:268); this framework lifts the restriction with a
one-vs-all block-CG solve that shares the kernel matvec across all C classes
(solver/cg.py::cg_ls_svm_multi_core).  These tests pin the extension's
semantics: block CG == C independent binary solves, argmax prediction,
model-file round trips, sharded parity, sklearn facade behavior.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_blobs
from plssvm_tpu import CSVM, DataSet, Model
from plssvm_tpu.data_set import LabelMapper
from plssvm_tpu.exceptions import InvalidFileFormatError
from plssvm_tpu.parameter import KernelFunctionType


def make_multiclass_blobs(n, d, n_classes=3, seed=0, dtype=np.float64,
                          labels=None):
    """C separable Gaussian blobs with arbitrary class labels."""
    rng = np.random.default_rng(seed)
    centers = 3.0 * rng.normal(size=(n_classes, d))
    assignment = np.repeat(np.arange(n_classes), -(-n // n_classes))[:n]
    X = (centers[assignment] + 0.5 * rng.normal(size=(n, d))).astype(dtype)
    if labels is None:
        labels = np.arange(n_classes)
    label_dtype = object if isinstance(labels[0], str) else None
    y = np.asarray([labels[a] for a in assignment], dtype=label_dtype)
    perm = rng.permutation(n)
    return X[perm], y[perm]


class TestMulticlassLabelMapper:
    def test_class_indices_and_round_trip(self):
        mapper = LabelMapper(np.asarray([2, 0, 1, 2, 0]))
        assert mapper.num_mappings == 3
        assert mapper.labels() == [0, 1, 2]
        np.testing.assert_array_equal(
            mapper.map_labels(np.asarray([0, 2, 1])), [0.0, 2.0, 1.0]
        )
        assert mapper.label_by_mapped_value(2.0) == 2
        assert mapper.mapped_value(1) == 1.0

    def test_oaa_targets(self):
        mapper = LabelMapper(np.asarray(["a", "b", "c"]))
        T = mapper.oaa_targets(np.asarray(["b", "a", "c"], dtype=object))
        np.testing.assert_array_equal(
            T, [[-1, 1, -1], [1, -1, -1], [-1, -1, 1]]
        )

    def test_unknown_label_raises(self):
        from plssvm_tpu.exceptions import DataSetError

        mapper = LabelMapper(np.asarray([0, 1, 2]))
        with pytest.raises(DataSetError, match="unknown"):
            mapper.map_labels(np.asarray([0, 3]))

    def test_single_label_raises(self):
        from plssvm_tpu.exceptions import DataSetError

        with pytest.raises(DataSetError, match="At least two"):
            LabelMapper(np.asarray([1, 1, 1]))


class TestBlockCGEquivalence:
    """The block solve must equal C independent binary CG solves — same
    system matrix, per-column right-hand sides (the correctness contract
    of the shared-Gram formulation)."""

    @pytest.mark.parametrize("kernel_name", ["linear", "polynomial", "rbf"])
    def test_block_equals_sequential(self, kernel_name):
        from plssvm_tpu.solver.cg import solve_ls_svm, solve_ls_svm_multi

        rng = np.random.default_rng(7)
        n, d, C = 41, 5, 3
        X = rng.normal(size=(n, d))
        idx = rng.integers(0, C, size=n)
        Y = np.where(idx[:, None] == np.arange(C)[None, :], 1.0, -1.0)

        dept = n - 1
        m_pad = 48
        Xp = np.zeros((m_pad, d))
        Xp[:dept] = X[:dept]
        Yp = np.zeros((m_pad, C))
        Yp[:dept] = Y[:dept]
        mask = np.zeros(m_pad)
        mask[:dept] = 1.0

        kind = KernelFunctionType.from_string(kernel_name)
        args = dict(kind=kind, degree=3)
        gamma = jnp.float64(1.0 / d)
        coef0 = jnp.float64(1.0)
        cost = jnp.float64(10.0)
        eps = jnp.float64(1e-8)
        mi = jnp.asarray(200, jnp.int32)

        multi = solve_ls_svm_multi(
            jnp.asarray(Xp), jnp.asarray(X[-1]), jnp.asarray(Yp),
            jnp.asarray(Y[-1]), jnp.asarray(mask),
            gamma, coef0, cost, eps, mi, row_block=16, **args,
        )
        for c in range(C):
            single = solve_ls_svm(
                jnp.asarray(Xp), jnp.asarray(X[-1]), jnp.asarray(Yp[:, c]),
                jnp.asarray(Y[-1, c]), jnp.asarray(mask),
                gamma, coef0, cost, eps, mi, row_block=16, **args,
            )
            # tolerance: the two paths accumulate the Gram contraction in
            # different orders (matmat vs matvec) and CG amplifies the last
            # digits; eps=1e-8 (squared) bounds agreement at ~1e-4 relative
            np.testing.assert_allclose(
                np.asarray(multi.x[:, c]), np.asarray(single.x),
                rtol=1e-4, atol=1e-7,
            )
            assert float(multi.rho[c]) == pytest.approx(
                float(single.rho), rel=1e-4, abs=1e-7
            )
            assert float(multi.alpha_last[c]) == pytest.approx(
                float(single.alpha_last), rel=1e-4, abs=1e-7
            )

    def test_frozen_columns_do_not_drift(self):
        """A class that converges early must keep its solution while the
        others keep iterating (the freeze mask in the block body)."""
        from plssvm_tpu.solver.cg import solve_ls_svm_multi

        rng = np.random.default_rng(11)
        n, d = 33, 4
        X = rng.normal(size=(n, d))
        # class 0: trivially-separable targets (converges in few iters);
        # class 1/2: noisy targets (converge later)
        Y = np.stack(
            [
                np.where(X[:, 0] > 0, 1.0, -1.0),
                np.where(rng.normal(size=n) > 0, 1.0, -1.0),
                np.where(rng.normal(size=n) > 0.5, 1.0, -1.0),
            ],
            axis=1,
        )
        m_pad = 40
        Xp = np.zeros((m_pad, d))
        Xp[: n - 1] = X[: n - 1]
        Yp = np.zeros((m_pad, 3))
        Yp[: n - 1] = Y[: n - 1]
        mask = np.zeros(m_pad)
        mask[: n - 1] = 1.0
        res = solve_ls_svm_multi(
            jnp.asarray(Xp), jnp.asarray(X[-1]), jnp.asarray(Yp),
            jnp.asarray(Y[-1]), jnp.asarray(mask),
            jnp.float64(0.25), jnp.float64(0.0), jnp.float64(100.0),
            jnp.float64(1e-10), jnp.asarray(500, jnp.int32),
            kind=KernelFunctionType.RBF, degree=3, row_block=8,
        )
        itpc = np.asarray(res.iterations_per_class)
        # every class individually satisfies the stop criterion
        assert (
            np.asarray(res.delta)
            <= 1e-20 * np.asarray(res.delta0) + 1e-24
        ).all()
        # per-class counts are tracked and bounded by the block total
        assert (itpc <= int(res.iterations)).all()
        assert itpc.max() == int(res.iterations)


class TestMulticlassCSVM:
    @pytest.mark.parametrize("kernel_name", ["linear", "polynomial", "rbf"])
    def test_fit_predict_score(self, kernel_name):
        X, y = make_multiclass_blobs(90, 6, n_classes=3, seed=1)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type=kernel_name)
        model = svm.fit(ds)
        assert model.num_classes == 3
        assert np.asarray(model.alpha).shape == (90, 3)
        assert np.asarray(model.rho).shape == (3,)
        pred = svm.predict(model, ds)
        assert set(pred.tolist()) <= {0, 1, 2}
        assert svm.score(model) >= 0.95

    def test_decision_values_shape_and_argmax(self):
        X, y = make_multiclass_blobs(60, 4, n_classes=4, seed=2)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(ds)
        vals = svm.predict_values(model, ds)
        assert vals.shape == (60, 4)
        pred = svm.predict(model, ds)
        np.testing.assert_array_equal(
            pred, np.asarray(model.data.different_labels)[np.argmax(vals, 1)]
        )

    def test_binary_shape_unchanged(self):
        X, y = make_blobs(40, 4, seed=3)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64)
        model = svm.fit(ds)
        assert svm.predict_values(model, ds).shape == (40,)
        assert np.asarray(model.alpha).shape == (40,)
        assert isinstance(model.rho, float)

    def test_string_labels(self):
        X, y = make_multiclass_blobs(
            60, 5, n_classes=3, seed=4, labels=["ant", "bee", "cat"]
        )
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(ds)
        pred = svm.predict(model, ds)
        assert set(pred.tolist()) <= {"ant", "bee", "cat"}
        assert svm.score(model) >= 0.95

    def test_linear_w_fast_path_matches_kernel_path(self):
        """The (d, C) w matrix fast path == the explicit kernel contraction."""
        X, y = make_multiclass_blobs(50, 4, n_classes=3, seed=5)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
        model = svm.fit(ds)
        vals = svm.predict_values(model, ds)
        alpha = np.asarray(model.alpha)
        want = X @ (X.T @ alpha) - np.asarray(model.rho)[None, :]
        np.testing.assert_allclose(vals, want, rtol=1e-8, atol=1e-10)


class TestMulticlassModelFile:
    def test_round_trip(self, tmp_path):
        X, y = make_multiclass_blobs(45, 5, n_classes=3, seed=6)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(ds)
        path = str(tmp_path / "mc.model")
        model.save(path)

        with open(path) as fh:
            content = fh.read()
        assert "nr_class 3" in content
        # 3 rho values on one line
        rho_line = [l for l in content.splitlines() if l.startswith("rho ")][0]
        assert len(rho_line.split()) == 4

        loaded = Model.load(path, label_type=int)
        assert loaded.num_classes == 3
        np.testing.assert_allclose(
            np.sort(np.asarray(loaded.rho)), np.sort(np.asarray(model.rho)),
            rtol=1e-9,
        )
        test_ds = DataSet(X[:11], dtype=np.float64)
        np.testing.assert_array_equal(
            svm.predict(model, test_ds), svm.predict(loaded, test_ds)
        )

    def test_round_trip_string_labels(self, tmp_path):
        X, y = make_multiclass_blobs(
            30, 4, n_classes=3, seed=7, labels=["x", "y", "z"]
        )
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
        model = svm.fit(ds)
        path = str(tmp_path / "mcs.model")
        model.save(path)
        loaded = Model.load(path, label_type=str)
        test_ds = DataSet(X[:9], dtype=np.float64)
        np.testing.assert_array_equal(
            svm.predict(model, test_ds), svm.predict(loaded, test_ds)
        )

    def test_wrong_rho_count_raises(self, tmp_path):
        """nr_class 3 with a single rho value must be rejected."""
        path = str(tmp_path / "bad.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\nkernel_type linear\nnr_class 3\n"
                "total_sv 3\nrho 0.5\nlabel a b c\nnr_sv 1 1 1\nSV\n"
                "1 0 0 1:1.0\n0 1 0 1:2.0\n0 0 1 1:3.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="rho"):
            Model.load(path)

    def test_missing_alpha_columns_raises(self, tmp_path):
        path = str(tmp_path / "bad2.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type c_svc\nkernel_type linear\nnr_class 3\n"
                "total_sv 3\nrho 0.5 0.25 -0.5\nlabel a b c\nnr_sv 1 1 1\nSV\n"
                "1 0 1:1.0\n0 1 0 1:2.0\n0 0 1 1:3.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="alpha"):
            Model.load(path)


@pytest.mark.skipif(
    len(jax.devices("cpu")) < 4, reason="needs >= 4 virtual CPU devices"
)
class TestMulticlassSharded:
    def test_sharded_fit_matches_single_device(self):
        X, y = make_multiclass_blobs(70, 5, n_classes=3, seed=8)
        ds = DataSet(X, y)
        single = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        m1 = single.fit(ds, epsilon=1e-8)

        ds2 = DataSet(X, y)
        devs = jax.devices("cpu")[:4]
        sharded = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", devices=devs
        )
        m2 = sharded.fit(ds2, epsilon=1e-8)
        np.testing.assert_allclose(
            np.asarray(m2.rho), np.asarray(m1.rho), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(m2.alpha), np.asarray(m1.alpha), rtol=1e-5, atol=1e-7
        )

    def test_sharded_predict_matches_single_device(self):
        X, y = make_multiclass_blobs(64, 4, n_classes=3, seed=9)
        ds = DataSet(X, y)
        single = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = single.fit(ds)
        want = single.predict_values(model, ds)

        devs = jax.devices("cpu")[:4]
        sharded = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", devices=devs
        )
        got = sharded.predict_values(model, ds)
        assert got.shape == (64, 3)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


class TestMulticlassSVC:
    def test_sklearn_facade(self):
        from plssvm_tpu.sklearn import SVC

        X, y = make_multiclass_blobs(60, 5, n_classes=3, seed=10)
        clf = SVC(kernel="rbf", C=10.0).fit(X, y)
        assert list(clf.classes_) == [0, 1, 2]
        assert clf.decision_function(X[:7]).shape == (7, 3)
        assert clf.dual_coef_.shape == (3, 60)
        assert clf.intercept_.shape == (3,)
        assert clf.n_support_.shape == (3,)
        assert clf.score(X, y) >= 0.95


class TestMulticlassPallasPredict:
    def test_pallas_predict_matches_blocked(self):
        """The rect-matmat multiclass predict (interpret mode) must equal
        the XLA blocked-streaming decision values."""
        from jax.experimental.pallas import tpu as pltpu

        X, y = make_multiclass_blobs(640, 12, n_classes=3, seed=9,
                                     dtype=np.float32)
        data = DataSet(X, y)
        svm = CSVM(target="cpu", kernel_type="rbf", cost=10.0,
                   dtype=np.float32)
        model = svm.fit(data, epsilon=1e-6)
        want = svm.predict_values(model, data)  # blocked XLA path on CPU

        sv = jnp.asarray(model.support_vectors, jnp.float32)
        alpha = jnp.asarray(model.alpha, jnp.float32)
        points = jnp.asarray(data.data, jnp.float32)
        gamma = jnp.asarray(model.params.resolved_gamma(X.shape[1]),
                            jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = svm._predict_values_pallas(
                sv, alpha, points, jnp.asarray(model.rho, jnp.float32),
                gamma, jnp.float32(0.0), KernelFunctionType.RBF, 3,
            )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=5e-4, atol=5e-4
        )
        assert np.asarray(got).shape == (640, 3)


class TestOAODeviceStaging:
    """The OAO device-resident pair gather (csvm._fit_oao stages the parent
    data once; each pair machine gathers its padded row subset ON DEVICE)
    must be bit-identical to the host-staged padding it replaces."""

    def test_gather_matches_host_staging_exactly(self):
        rng = np.random.default_rng(44)
        X = np.concatenate(
            [rng.normal(2.0 * c, 0.8, (40, 7)) for c in range(3)]
        )
        y = np.repeat([0, 1, 2], 40)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", target="cpu", dtype=np.float64,
                   kernel_type="rbf")
        m_gather = svm.fit(ds, epsilon=1e-10, classification="oao")

        # strip the device staging each pair fit would use -> host path
        orig_fit = CSVM.fit

        def fit_no_gather(self, data, **kw):
            if hasattr(data, "_device_rows"):
                del data._device_rows
            return orig_fit(self, data, **kw)

        CSVM.fit = fit_no_gather
        try:
            m_host = svm.fit(DataSet(X, y), epsilon=1e-10,
                             classification="oao")
        finally:
            CSVM.fit = orig_fit

        np.testing.assert_array_equal(
            np.asarray(m_gather.alpha), np.asarray(m_host.alpha)
        )
        np.testing.assert_array_equal(
            np.asarray(m_gather.rho), np.asarray(m_host.rho)
        )

    def test_gather_with_explicit_solver_and_weights(self):
        """The gather composes with solver='cg_explicit' and sample_weight
        (both flow through the same fit front end per pair machine)."""
        rng = np.random.default_rng(45)
        X = np.concatenate(
            [rng.normal(2.0 * c, 0.8, (30, 5)) for c in range(3)]
        )
        y = np.repeat([0, 1, 2], 30)
        s = rng.uniform(0.5, 2.0, size=90)
        svm = CSVM(backend="xla", target="cpu", dtype=np.float64,
                   kernel_type="rbf", solver="cg_explicit")
        model = svm.fit(DataSet(X, y), epsilon=1e-10,
                        classification="oao", sample_weight=s)
        ref = CSVM(backend="xla", target="cpu", dtype=np.float64,
                   kernel_type="rbf", solver="cg_implicit")
        m_ref = ref.fit(DataSet(X, y), epsilon=1e-10,
                        classification="oao", sample_weight=s)
        np.testing.assert_allclose(
            np.asarray(model.alpha), np.asarray(m_ref.alpha),
            rtol=1e-6, atol=1e-8,
        )
        assert svm.score(model) == 1.0
