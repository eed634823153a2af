"""Explicit-kernel-matrix solver (cg_explicit) — upstream PLSSVM v3 parity.

The bundled reference has only the implicit solve (every CG iteration
recomputes the kernel matrix, gpu_csvm.hpp:477-654); upstream v3 added the
solver-type choice.  These tests pin: numerical parity with the implicit
solve for every kernel, the build correctness of the materialized matrix,
automatic selection rules, memory-budget errors, multiclass block solves,
OAO pair fits, and checkpoint/resume bit-identity.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plssvm_tpu import CSVM, DataSet, Model
from plssvm_tpu.exceptions import InvalidParameterError
from plssvm_tpu.parameter import KernelFunctionType
from plssvm_tpu.solver.explicit import build_kernel_matrix

from test_multiclass import make_multiclass_blobs


def _binary_data(n=200, d=12, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = np.where(rng.random(n) > 0.5, 1, -1)
    X[y > 0] += 1.5
    return X, y


ALL_KERNELS = [
    "linear", "polynomial", "rbf", "sigmoid", "laplacian", "chi_squared"
]


class TestBuildKernelMatrix:
    @pytest.mark.parametrize("kern", ALL_KERNELS)
    def test_matches_pairwise_golden(self, kern):
        from plssvm_tpu.kernel_functions import kernel_function
        from plssvm_tpu.parameter import Parameter

        rng = np.random.default_rng(1)
        X = np.abs(rng.normal(size=(17, 5))) if kern == "chi_squared" \
            else rng.normal(size=(17, 5))
        kind = KernelFunctionType.from_string(kern)
        params = Parameter(kernel_type=kind, gamma=0.3, coef0=0.5, degree=2)
        K = np.asarray(build_kernel_matrix(
            jnp.asarray(X, jnp.float64), jnp.float64(0.3), jnp.float64(0.5),
            kind=kind, degree=2,
        ))
        golden = np.asarray([
            [kernel_function(X[i], X[j], params) for j in range(17)]
            for i in range(17)
        ])
        np.testing.assert_allclose(K, golden, rtol=1e-12, atol=1e-14)

    def test_distance_kernel_row_blocked_build(self):
        # m divisible by the row block: exercises the scan path
        rng = np.random.default_rng(2)
        X = jnp.asarray(rng.normal(size=(512, 7)), jnp.float64)
        K = np.asarray(build_kernel_matrix(
            X, jnp.float64(0.2), jnp.float64(0.0),
            kind=KernelFunctionType.LAPLACIAN, degree=3, row_block=128,
        ))
        Xn = np.asarray(X)
        golden = np.exp(-0.2 * np.abs(
            Xn[:64, None, :] - Xn[None, :, :]
        ).sum(-1))
        np.testing.assert_allclose(K[:64], golden, rtol=1e-12)

    def test_bf16_storage(self):
        rng = np.random.default_rng(3)
        X = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
        K = build_kernel_matrix(
            X, jnp.float32(0.5), jnp.float32(0.0),
            kind=KernelFunctionType.RBF, degree=3, precision="bf16",
        )
        assert K.dtype == jnp.bfloat16


class TestExplicitSolveParity:
    @pytest.mark.parametrize("kern", ALL_KERNELS)
    def test_matches_implicit(self, kern):
        X, y = _binary_data(seed=4)
        if kern == "chi_squared":
            X = np.abs(X)
        ds = DataSet(X, y)
        common = dict(
            backend="xla", dtype=np.float64, kernel_type=kern, gamma=0.1
        )
        mi = CSVM(solver="cg_implicit", **common).fit(
            ds, epsilon=1e-10, max_iter=500
        )
        me = CSVM(solver="cg_explicit", **common).fit(
            ds, epsilon=1e-10, max_iter=500
        )
        np.testing.assert_allclose(me.rho, mi.rho, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(me.alpha), np.asarray(mi.alpha), rtol=1e-5, atol=1e-7
        )

    def test_multiclass_block_solve(self):
        X, y = make_multiclass_blobs(75, 6, n_classes=3, seed=5)
        ds = DataSet(X, y)
        common = dict(
            backend="xla", dtype=np.float64, kernel_type="rbf"
        )
        mi = CSVM(solver="cg_implicit", **common).fit(ds, epsilon=1e-10)
        me = CSVM(solver="cg_explicit", **common).fit(ds, epsilon=1e-10)
        np.testing.assert_allclose(
            np.asarray(me.rho), np.asarray(mi.rho), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(me.alpha), np.asarray(mi.alpha), rtol=1e-6, atol=1e-9
        )

    def test_oao_pair_machines_ride_explicit(self):
        X, y = make_multiclass_blobs(60, 5, n_classes=3, seed=6)
        ds = DataSet(X, y)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            solver="cg_explicit",
        )
        model = svm.fit(ds, classification="oao", epsilon=1e-10)
        assert svm.score(model) == 1.0

    def test_jacobi_preconditioner(self):
        X, y = _binary_data(seed=7)
        ds = DataSet(X, y)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="polynomial",
            degree=3, cost=100.0, solver="cg_explicit",
            preconditioner="jacobi",
        )
        model = svm.fit(ds, epsilon=1e-8, max_iter=3000)
        assert svm.score(model) >= 0.99

    def test_checkpoint_segments_bit_identical(self, tmp_path):
        X, y = _binary_data(seed=8)
        ds = DataSet(X, y)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.1,
            solver="cg_explicit",
        )
        m1 = svm.fit(ds, epsilon=1e-10)
        m2 = svm.fit(
            ds, epsilon=1e-10,
            checkpoint_path=str(tmp_path / "ck"), checkpoint_interval=4,
        )
        np.testing.assert_array_equal(
            np.asarray(m1.alpha), np.asarray(m2.alpha)
        )
        assert m1.rho == m2.rho


class TestSolverSelection:
    def test_invalid_solver_rejected(self):
        with pytest.raises(InvalidParameterError, match="solver"):
            CSVM(solver="bogus")

    def test_over_budget_forced_explicit_raises(self, monkeypatch):
        monkeypatch.setenv("PLSSVM_TPU_EXPLICIT_BUDGET", str(1 << 10))
        X, y = _binary_data(n=150, seed=9)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            solver="cg_explicit",
        )
        with pytest.raises(InvalidParameterError, match="budget"):
            svm.fit(DataSet(X, y))

    def test_automatic_skips_when_over_budget(self, monkeypatch):
        monkeypatch.setenv("PLSSVM_TPU_EXPLICIT_BUDGET", str(1 << 10))
        X, y = _binary_data(n=150, seed=9)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        assert svm._use_explicit_solver(149, 12, KernelFunctionType.RBF, 1) \
            is False

    def test_automatic_rules(self):
        svm = CSVM(backend="xla", dtype=np.float64)
        rbf = KernelFunctionType.RBF
        lin = KernelFunctionType.LINEAR
        lap = KernelFunctionType.LAPLACIAN
        # narrow Gram kernel: implicit; wide: explicit (xla threshold 512)
        assert svm._use_explicit_solver(1000, 100, rbf, 1) is False
        assert svm._use_explicit_solver(1000, 600, rbf, 1) is True
        # linear never; distance kernels always (when they fit)
        assert svm._use_explicit_solver(1000, 600, lin, 1) is False
        assert svm._use_explicit_solver(1000, 10, lap, 1) is True
        # multi-device: the per-chip budget applies (row-sharded K)
        assert svm._use_explicit_solver(1000, 600, rbf, 4) is True
        # bf16-stored K halves the crossover width (2x faster iterations)
        svm_bf16 = CSVM(
            backend="xla", dtype=np.float64, gram_precision="bf16"
        )
        assert svm_bf16._use_explicit_solver(1000, 300, rbf, 1) is True
        assert svm._use_explicit_solver(1000, 300, rbf, 1) is False

    def test_sharded_explicit_matches_single_device(self):
        devs = jax.devices("cpu")[:4]
        if len(devs) < 4:
            pytest.skip("needs >= 4 virtual CPU devices")
        X, y = _binary_data(n=180, seed=10)
        ds = DataSet(X, y)
        single = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.1,
            solver="cg_explicit",
        )
        m1 = single.fit(ds, epsilon=1e-10)
        sharded = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.1,
            solver="cg_explicit", devices=devs,
        )
        m2 = sharded.fit(DataSet(X, y), epsilon=1e-10)
        np.testing.assert_allclose(m2.rho, m1.rho, rtol=1e-8)
        np.testing.assert_allclose(
            np.asarray(m2.alpha), np.asarray(m1.alpha), rtol=1e-6, atol=1e-9
        )

    def test_sharded_explicit_multiclass(self):
        devs = jax.devices("cpu")[:4]
        if len(devs) < 4:
            pytest.skip("needs >= 4 virtual CPU devices")
        X, y = make_multiclass_blobs(80, 5, n_classes=3, seed=11)
        single = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            solver="cg_explicit",
        )
        m1 = single.fit(DataSet(X, y), epsilon=1e-10)
        sharded = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            solver="cg_explicit", devices=devs,
        )
        m2 = sharded.fit(DataSet(X, y), epsilon=1e-10)
        np.testing.assert_allclose(
            np.asarray(m2.rho), np.asarray(m1.rho), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(m2.alpha), np.asarray(m1.alpha), rtol=1e-6, atol=1e-9
        )

    def test_sharded_explicit_checkpoint_bit_identical(self, tmp_path):
        devs = jax.devices("cpu")[:4]
        if len(devs) < 4:
            pytest.skip("needs >= 4 virtual CPU devices")
        X, y = _binary_data(n=160, seed=12)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.1,
            solver="cg_explicit", devices=devs,
        )
        m1 = svm.fit(DataSet(X, y), epsilon=1e-10)
        m2 = svm.fit(
            DataSet(X, y), epsilon=1e-10,
            checkpoint_path=str(tmp_path / "ck"), checkpoint_interval=4,
        )
        np.testing.assert_array_equal(
            np.asarray(m1.alpha), np.asarray(m2.alpha)
        )
        assert m1.rho == m2.rho

    def test_multihost_explicit_matches_regular_fit(self, tmp_path):
        """fit_multihost supports cg_explicit: K row-shards over the global
        mesh; at process_count()==1 the result equals the plain fit."""
        import plssvm_tpu

        X, y = _binary_data(n=160, d=6, seed=13)
        ds = plssvm_tpu.DataSet(X, y)
        f = str(tmp_path / "mh_exp.libsvm")
        ds.save(f)

        devs = jax.devices("cpu")[:8]
        if len(devs) < 8:
            pytest.skip("needs 8 virtual CPU devices")
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.1,
            solver="cg_explicit", devices=devs,
        )
        from plssvm_tpu.parallel import multihost as mh
        from plssvm_tpu.parallel.sharded import make_row_mesh

        orig = mh.global_row_mesh
        mh.global_row_mesh = lambda: make_row_mesh(devs)
        try:
            model = svm.fit_multihost(f, epsilon=1e-9)
        finally:
            mh.global_row_mesh = orig
        ref = CSVM(
            backend="xla", target="cpu", dtype=np.float64,
            kernel_type="rbf", gamma=0.1, solver="cg_explicit",
        ).fit(plssvm_tpu.DataSet(f), epsilon=1e-9)
        np.testing.assert_allclose(
            np.asarray(model.alpha), np.asarray(ref.alpha),
            rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(model.rho, ref.rho, rtol=1e-6)

    def test_tracker_records_solver(self):
        from plssvm_tpu.utils.tracker import global_tracker

        X, y = _binary_data(n=80, seed=11)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            solver="cg_explicit",
        )
        global_tracker.clear()
        svm.fit(DataSet(X, y), epsilon=1e-8)
        cg = dict(global_tracker.entries().get("cg", []))
        assert cg.get("solver") == "cg_explicit"
        assert "kernel_matrix_build_time" in cg
