"""Weighted LS-SVM (per-sample regularizers 1/(C s_i)) — EXTENSION tests.

Suykens' weighted LS-SVM: `fit(sample_weight=)` scales each point's
diagonal regularizer, the standard recipe for class imbalance (LIBSVM's
-wi) and robust fits.  Neither the reference nor upstream supports weights.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from plssvm_tpu import CSVM, DataSet
from plssvm_tpu.exceptions import InvalidParameterError


def _data(n=90, d=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = np.where(rng.random(n) > 0.5, 1, -1)
    X[y > 0] += 1.0
    return X, y, rng.uniform(0.5, 3.0, size=n)


def _dense_weighted(X, y, s, gamma, cost):
    n = X.shape[0]
    K = np.exp(-gamma * ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    A = np.zeros((n + 1, n + 1))
    A[0, 1:] = 1.0
    A[1:, 0] = 1.0
    A[1:, 1:] = K + np.diag(1.0 / (cost * s))
    sol = np.linalg.solve(A, np.concatenate([[0.0], y.astype(np.float64)]))
    return sol[0], sol[1:]


@pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
def test_matches_dense_weighted_solution(solver):
    X, y, s = _data(seed=1)
    bias, alpha = _dense_weighted(X, y, s, 0.3, 10.0)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.3,
        cost=10.0, solver=solver,
    )
    model = svm.fit(
        DataSet(X, y), epsilon=1e-12, max_iter=5000, sample_weight=s
    )
    np.testing.assert_allclose(model.rho, -bias, atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.alpha), alpha, atol=1e-7)


def test_unit_weights_equal_unweighted():
    X, y, _ = _data(seed=2)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.3)
    m1 = svm.fit(DataSet(X, y), epsilon=1e-10)
    m2 = svm.fit(
        DataSet(X, y), epsilon=1e-10, sample_weight=np.ones(len(y))
    )
    np.testing.assert_allclose(m2.rho, m1.rho, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(m2.alpha), np.asarray(m1.alpha), rtol=1e-9, atol=1e-12
    )


def test_weighted_with_jacobi_preconditioner():
    X, y, s = _data(seed=3)
    bias, alpha = _dense_weighted(X, y, s, 0.3, 100.0)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.3,
        cost=100.0, preconditioner="jacobi",
    )
    model = svm.fit(
        DataSet(X, y), epsilon=1e-12, max_iter=5000, sample_weight=s
    )
    np.testing.assert_allclose(model.rho, -bias, atol=1e-7)


def test_weighted_multiclass_and_oao():
    rng = np.random.default_rng(4)
    X = np.concatenate([rng.normal(3 * c, 0.6, (30, 5)) for c in range(3)])
    y = np.repeat([0, 1, 2], 30)
    s = rng.uniform(0.5, 2.0, size=90)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    for kwargs in ({}, {"classification": "oao"}):
        model = svm.fit(
            DataSet(X, y), epsilon=1e-10, sample_weight=s, **kwargs
        )
        assert svm.score(model) == 1.0


def test_weighted_regression():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(80, 3))
    y = X @ [1.0, -1.0, 0.5]
    s = rng.uniform(0.5, 2.0, size=80)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.5,
        cost=100.0,
    )
    bias, alpha = _dense_weighted(X, y, s, 0.5, 100.0)
    model = svm.fit(
        DataSet(X, y, regression=True), epsilon=1e-12, max_iter=5000,
        sample_weight=s,
    )
    np.testing.assert_allclose(model.rho, -bias, atol=1e-8)


def test_validation_errors():
    X, y, s = _data(n=50, seed=6)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    with pytest.raises(InvalidParameterError, match="one entry per"):
        svm.fit(DataSet(X, y), sample_weight=s[:10])
    with pytest.raises(InvalidParameterError, match="positive"):
        bad = s.copy()
        bad[3] = 0.0
        svm.fit(DataSet(X, y), sample_weight=bad)


def test_weighted_checkpointed_fit(tmp_path):
    """Weighted fits compose with CG-state checkpointing: segments are
    bit-identical to the unsegmented solve, and a checkpoint written
    UNWEIGHTED must not resume a weighted run (fingerprint differs)."""
    X, y, s = _data(n=140, seed=8)
    ds = DataSet(X, y)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.1,
        cost=50.0,
    )
    m1 = svm.fit(ds, epsilon=1e-10, sample_weight=s)
    path = str(tmp_path / "wck")
    m2 = svm.fit(
        ds, epsilon=1e-10, sample_weight=s,
        checkpoint_path=path, checkpoint_interval=4,
    )
    np.testing.assert_array_equal(np.asarray(m1.alpha), np.asarray(m2.alpha))
    assert m1.rho == m2.rho

    # interrupted-unweighted checkpoint must not poison a weighted fit:
    # run an unweighted segmented fit far from convergence, keep its file
    svm_un = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.1,
        cost=50.0,
    )
    path2 = str(tmp_path / "wck2")
    svm_un.fit(ds, epsilon=1e-30, max_iter=4,
               checkpoint_path=path2, checkpoint_interval=2)
    # max_iter reached -> checkpoint remains; now fit WEIGHTED with the
    # same file: the fingerprint differs, so it starts fresh and matches
    # the clean weighted solve
    m3 = svm.fit(
        DataSet(X, y), epsilon=1e-10, sample_weight=s,
        checkpoint_path=path2, checkpoint_interval=1000,
    )
    np.testing.assert_allclose(m3.rho, m1.rho, rtol=1e-10)


def test_cli_weight_flag(tmp_path):
    """plssvm-train --weight LABEL=W (LIBSVM's -wi equivalent)."""
    X, y, _ = _data(n=60, d=3, seed=7)
    from plssvm_tpu.io.libsvm import write_libsvm_file

    f = str(tmp_path / "w.libsvm")
    write_libsvm_file(f, X, y)
    m = str(tmp_path / "w.model")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    out = subprocess.run(
        # negative labels need the --weight=LABEL=W form (argparse would
        # read a bare '-1=3.0' as an option)
        [sys.executable, "-m", "plssvm_tpu.cli.train", "-t", "2",
         "--weight=-1=3.0", "--weight", "1=1.0", "-p", "cpu",
         "--use_double_as_real_type", f, m],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.isfile(m)
