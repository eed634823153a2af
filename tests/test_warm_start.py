"""Warm-started fits (initial_model=) and the explicit kernel-matrix cache.

EXTENSIONS — the reference always cold-starts CG at x = 1 and rebuilds all
device state per fit.  Key semantic: the relative stop target is anchored to
the COLD start's residual, so a warm fit terminates at exactly the accuracy
a cold fit would (and a warm start from a converged solution stops after 0
iterations).
"""

import numpy as np
import pytest

from plssvm_tpu import CSVM, DataSet
from plssvm_tpu.exceptions import InvalidParameterError
from plssvm_tpu.utils.tracker import global_tracker

from test_multiclass import make_multiclass_blobs


def _binary(n=300, d=16, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = np.where(rng.random(n) > 0.5, 1, -1)
    X[y > 0] += 1.2
    return X, y


@pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
def test_warm_restart_converges_immediately(solver):
    X, y = _binary(seed=1)
    ds = DataSet(X, y)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.05,
        cost=10.0, solver=solver,
    )
    m1 = svm.fit(ds, epsilon=1e-10)
    m2 = svm.fit(ds, epsilon=1e-10, initial_model=m1)
    assert m2.n_iter == 0
    np.testing.assert_allclose(m2.rho, m1.rho, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(m2.alpha), np.asarray(m1.alpha), rtol=1e-9
    )


def test_warm_start_after_cost_change_matches_cold():
    X, y = _binary(seed=2)
    ds = DataSet(X, y)
    base = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.05,
        cost=10.0, solver="cg_explicit",
    ).fit(ds, epsilon=1e-10)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.05,
        cost=20.0, solver="cg_explicit",
    )
    warm = svm.fit(ds, epsilon=1e-10, initial_model=base)
    cold = svm.fit(DataSet(X, y), epsilon=1e-10)
    np.testing.assert_allclose(warm.rho, cold.rho, rtol=1e-6)
    # warm and cold take different CG paths to the same eps ball — only
    # near-zero coefficients differ beyond rtol
    np.testing.assert_allclose(
        np.asarray(warm.alpha), np.asarray(cold.alpha), rtol=1e-5, atol=1e-7
    )


def test_warm_start_multiclass_oaa():
    X, y = make_multiclass_blobs(90, 6, n_classes=3, seed=3)
    ds = DataSet(X, y)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    m1 = svm.fit(ds, epsilon=1e-10)
    m2 = svm.fit(ds, epsilon=1e-10, initial_model=m1)
    assert m2.n_iter == 0
    np.testing.assert_allclose(
        np.asarray(m2.rho), np.asarray(m1.rho), rtol=1e-9
    )


def test_warm_start_oao_converges_immediately():
    X, y = make_multiclass_blobs(90, 6, n_classes=3, seed=12)
    ds = DataSet(X, y)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    m1 = svm.fit(ds, classification="oao", epsilon=1e-10)
    assert m1.n_iter > 0
    m2 = svm.fit(ds, classification="oao", epsilon=1e-10, initial_model=m1)
    assert m2.n_iter == 0  # every pair machine restarts converged
    np.testing.assert_allclose(
        np.asarray(m2.rho), np.asarray(m1.rho), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(m2.alpha), np.asarray(m1.alpha), rtol=1e-9
    )


def test_warm_start_oao_from_model_file(tmp_path):
    """A file-loaded OAO model (class-grouped SVs, header label order) must
    warm-start the pair machines to 0 iterations — exercises the sv_coef
    inversion, row realignment, and the layout-order sign rule."""
    X, y = make_multiclass_blobs(60, 5, n_classes=3, seed=13)
    ds = DataSet(X, y)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    m1 = svm.fit(ds, classification="oao", epsilon=1e-10)
    path = str(tmp_path / "oao_warm.model")
    m1.save(path)
    from plssvm_tpu import Model

    loaded = Model.load(path, label_type=int)
    assert not np.array_equal(
        np.asarray(loaded.data.labels), np.asarray(ds.labels)
    )  # the file IS class-grouped — realignment is actually exercised
    m2 = svm.fit(ds, classification="oao", epsilon=1e-10, initial_model=loaded)
    assert m2.n_iter == 0
    np.testing.assert_allclose(
        np.asarray(m2.rho), np.asarray(m1.rho), rtol=1e-8
    )


def test_warm_start_oao_after_cost_change_matches_cold():
    X, y = make_multiclass_blobs(75, 6, n_classes=3, seed=14)
    base = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", cost=1.0,
    ).fit(DataSet(X, y), classification="oao", epsilon=1e-10)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf", cost=5.0)
    warm = svm.fit(
        DataSet(X, y), classification="oao", epsilon=1e-10,
        initial_model=base,
    )
    cold = svm.fit(DataSet(X, y), classification="oao", epsilon=1e-10)
    assert warm.n_iter <= cold.n_iter
    np.testing.assert_allclose(
        np.asarray(warm.rho), np.asarray(cold.rho), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(warm.alpha), np.asarray(cold.alpha), rtol=1e-5, atol=1e-7
    )


def test_warm_start_tighter_epsilon_refines():
    X, y = _binary(seed=4)
    ds = DataSet(X, y)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.05,
    )
    rough = svm.fit(ds, epsilon=1e-2)
    refined = svm.fit(ds, epsilon=1e-10, initial_model=rough)
    cold = svm.fit(DataSet(X, y), epsilon=1e-10)
    # a restart discards the Krylov subspace, so the saving is bounded —
    # but refining must never cost MORE than a cold solve, and must land
    # in the same eps ball
    assert 0 < refined.n_iter <= cold.n_iter
    np.testing.assert_allclose(refined.rho, cold.rho, rtol=1e-6)


def test_warm_start_from_model_file_realigns_rows(tmp_path):
    """Model files store SVs class-grouped; the warm start must re-align
    the loaded alpha to the training data's row order (review finding:
    a misaligned warm start is correct but saves nothing — 61/62
    iterations instead of 0)."""
    X, y = _binary(seed=11)
    ds = DataSet(X, y)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.05,
    )
    m1 = svm.fit(ds, epsilon=1e-10)
    assert m1.n_iter > 5
    path = str(tmp_path / "warm.model")
    m1.save(path)
    from plssvm_tpu import Model

    loaded = Model.load(path, label_type=int)
    assert not np.array_equal(
        np.asarray(loaded.data.labels), np.asarray(ds.labels)
    )  # the file IS class-grouped — alignment is actually exercised
    m2 = svm.fit(ds, epsilon=1e-10, initial_model=loaded)
    assert m2.n_iter == 0
    np.testing.assert_allclose(m2.rho, m1.rho, rtol=1e-8)


def test_warm_start_errors():
    X, y = _binary(n=100, seed=5)
    ds = DataSet(X, y)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    model = svm.fit(ds, epsilon=1e-8)
    # checkpointing + warm start are mutually exclusive
    with pytest.raises(InvalidParameterError, match="checkpoint"):
        svm.fit(ds, initial_model=model, checkpoint_path="/tmp/nope")
    # size mismatch
    X2, y2 = _binary(n=60, seed=6)
    with pytest.raises(InvalidParameterError, match="support vectors"):
        svm.fit(DataSet(X2, y2), initial_model=model)
    # OAO warm starts need an OAO model (an OAA one has the wrong layout)
    Xm, ym = make_multiclass_blobs(45, 4, n_classes=3, seed=7)
    dsm = DataSet(Xm, ym)
    mc = svm.fit(dsm, epsilon=1e-8)
    with pytest.raises(InvalidParameterError, match="one-vs-one"):
        svm.fit(dsm, classification="oao", initial_model=mc)
    # binary fit with a multiclass initial model
    with pytest.raises(InvalidParameterError, match="binary"):
        svm.fit(DataSet(*_binary(n=Xm.shape[0], seed=8)), initial_model=mc)


class TestKernelMatrixCache:
    def test_cost_sweep_reuses_k(self):
        X, y = _binary(seed=9)
        ds = DataSet(X, y)
        builds = []
        for cost in (1.0, 10.0, 100.0):
            svm = CSVM(
                backend="xla", dtype=np.float64, kernel_type="rbf",
                gamma=0.05, cost=cost, solver="cg_explicit",
            )
            global_tracker.clear()
            svm.fit(ds, epsilon=1e-8)
            cg = dict(global_tracker.entries().get("cg", []))
            builds.append(cg["kernel_matrix_build_time"])
        assert builds[0] > 0.0
        assert builds[1] == 0.0 and builds[2] == 0.0  # cache hits

    def test_gamma_change_rebuilds(self):
        X, y = _binary(seed=10)
        ds = DataSet(X, y)
        for gamma in (0.05, 0.1):
            svm = CSVM(
                backend="xla", dtype=np.float64, kernel_type="rbf",
                gamma=gamma, solver="cg_explicit",
            )
            global_tracker.clear()
            m = svm.fit(ds, epsilon=1e-8)
            cg = dict(global_tracker.entries().get("cg", []))
            assert cg["kernel_matrix_build_time"] > 0.0
        # and the cached-K solution stays correct
        svm2 = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf",
            gamma=0.1, solver="cg_explicit",
        )
        m2 = svm2.fit(ds, epsilon=1e-8)  # cache hit for gamma=0.1
        cold = svm2.fit(DataSet(X, y), epsilon=1e-8)
        np.testing.assert_allclose(m2.rho, cold.rho, rtol=1e-9)
