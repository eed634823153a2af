"""Composition matrix: every (solver x mesh x weights x warm x checkpoint)
cell solves the SAME linear system, so every cell must land on the same
dense-golden answer.

The per-feature suites pin each capability in isolation; this matrix pins
the CROSS PRODUCT, where integration bugs hide (a flag silently dropped on
one path, a trailing-argument protocol mis-bound, a checkpoint fingerprint
missing a weights digest).  Cells are tiny (n = 96) so the whole matrix
stays fast; tolerances are f64-CG-level.
"""

import os

import jax
import numpy as np
import pytest

import golden
import plssvm_tpu
from plssvm_tpu import DataSet, fit_one_class


def _need8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs[:8]


N, D, GAMMA, COST = 96, 5, 0.25, 20.0


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(77)
    X = np.abs(rng.normal(size=(N, D)))
    y = np.where(X[:, 0] + X[:, 1] > 1.4, 1, -1)
    if len(np.unique(y)) < 2:  # pragma: no cover - seed guard
        y[0] = -y[0]
    s = rng.uniform(0.5, 2.0, size=N)
    return X, y, s


def _svm(devices=None, solver="cg_implicit"):
    return plssvm_tpu.CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=GAMMA,
        cost=COST, devices=devices, solver=solver,
    )


def _golden_binary(X, y, s=None):
    """Dense LS-SVM saddle solve (weighted regularizers 1/(C s_i))."""
    n = X.shape[0]
    K = golden.kernel_matrix(X, "rbf", gamma=GAMMA)
    reg = 1.0 / (COST * (s if s is not None else np.ones(n)))
    A = np.zeros((n + 1, n + 1))
    A[0, 1:] = 1.0
    A[1:, 0] = 1.0
    A[1:, 1:] = K + np.diag(reg)
    sol = np.linalg.solve(
        A, np.concatenate([[0.0], y.astype(np.float64)])
    )
    return sol[1:], -sol[0]  # (alpha, rho = -bias)


@pytest.mark.parametrize("n_dev", [1, 8])
@pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("mode", ["plain", "warm", "checkpoint"])
def test_binary_matrix(problem, tmp_path, n_dev, solver, weighted, mode):
    X, y, s = problem
    devices = _need8() if n_dev == 8 else None
    sw = s if weighted else None
    want_alpha, want_rho = _golden_binary(X, y, sw)

    svm = _svm(devices=devices, solver=solver)
    ds = DataSet(X, y, dtype=np.float64)
    kwargs = dict(epsilon=1e-12, max_iter=2000, sample_weight=sw)
    if mode == "warm":
        base = svm.fit(ds, **kwargs)
        model = svm.fit(ds, initial_model=base, **kwargs)
        assert model.n_iter == 0
    elif mode == "checkpoint":
        model = svm.fit(
            ds, checkpoint_path=str(tmp_path / "m.ckpt"),
            checkpoint_interval=5, **kwargs,
        )
        assert not os.path.exists(str(tmp_path / "m.ckpt"))
    else:
        model = svm.fit(ds, **kwargs)
    np.testing.assert_allclose(
        model.alpha, want_alpha, rtol=1e-5, atol=1e-7,
        err_msg=f"binary {solver} x {n_dev}dev x w={weighted} x {mode}",
    )
    assert model.rho == pytest.approx(want_rho, rel=1e-6, abs=1e-8)


@pytest.mark.parametrize("n_dev", [1, 8])
@pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("mode", ["plain", "warm", "checkpoint"])
def test_one_class_matrix(problem, tmp_path, n_dev, solver, weighted, mode):
    X, _, s = problem
    devices = _need8() if n_dev == 8 else None
    sw = s if weighted else None
    K = golden.kernel_matrix(X, "rbf", gamma=GAMMA)
    reg = 1.0 / (COST * (s if weighted else np.ones(N)))
    want = np.linalg.solve(K + np.diag(reg), np.ones(N))

    svm = _svm(devices=devices, solver=solver)
    ds = DataSet(X, dtype=np.float64)
    kwargs = dict(nu=0.2, epsilon=1e-10, sample_weight=sw)
    if mode == "warm":
        base = fit_one_class(svm, ds, **kwargs)
        model = fit_one_class(svm, ds, initial_model=base, **kwargs)
        assert model.n_iter == 0
    elif mode == "checkpoint":
        model = fit_one_class(
            svm, ds, checkpoint_path=str(tmp_path / "oc.ckpt"),
            checkpoint_interval=5, **kwargs,
        )
        assert not os.path.exists(str(tmp_path / "oc.ckpt"))
    else:
        model = fit_one_class(svm, ds, **kwargs)
    np.testing.assert_allclose(
        model.alpha, want, rtol=1e-6, atol=1e-8,
        err_msg=f"one-class {solver} x {n_dev}dev x w={weighted} x {mode}",
    )
    assert model.rho == pytest.approx(
        float(np.quantile(K @ want, 0.2)), rel=1e-6
    )


@pytest.mark.parametrize("n_dev", [1, 8])
@pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
def test_regression_matrix(problem, n_dev, solver):
    X, _, _ = problem
    rng = np.random.default_rng(78)
    t = X @ rng.normal(size=D) + 0.1 * rng.normal(size=N)
    devices = _need8() if n_dev == 8 else None
    K = golden.kernel_matrix(X, "rbf", gamma=GAMMA)
    # bordered system [0 1'; 1 K+I/C][b; a] = [0; t]
    H = np.zeros((N + 1, N + 1))
    H[0, 1:] = 1.0
    H[1:, 0] = 1.0
    H[1:, 1:] = K + np.eye(N) / COST
    sol = np.linalg.solve(H, np.concatenate([[0.0], t]))
    want_b, want_alpha = sol[0], sol[1:]

    svm = _svm(devices=devices, solver=solver)
    ds = DataSet(X, t, dtype=np.float64, regression=True)
    model = svm.fit(ds, epsilon=1e-11)
    np.testing.assert_allclose(
        model.alpha, want_alpha, rtol=1e-5, atol=1e-7,
        err_msg=f"svr {solver} x {n_dev}dev",
    )
    assert model.rho == pytest.approx(-want_b, rel=1e-5, abs=1e-8)
