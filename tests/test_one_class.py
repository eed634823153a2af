"""One-class LS-SVM (novelty detection) — plssvm_tpu/one_class.py.

EXTENSION coverage: golden ridge-system validation, nu-quantile threshold
semantics, LIBSVM one_class model-file interop (models written by the REAL
libsvm load and reproduce its decision function), and the CLI path.
"""

import os

import jax
import numpy as np
import pytest

import golden
from plssvm_tpu import CSVM, DataSet, Model, fit_one_class
from plssvm_tpu.exceptions import InvalidParameterError


def _cloud(n=150, d=4, seed=0, outliers=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    if outliers:
        X = np.vstack([X, rng.normal(size=(outliers, d)) * 8.0])
    return X


def _svm(**kw):
    kw.setdefault("backend", "xla")
    kw.setdefault("dtype", np.float64)
    return CSVM(**kw)


@pytest.mark.parametrize("kind", ["linear", "rbf"])
def test_one_class_alpha_solves_ridge_system(kind):
    X = _cloud(n=60, d=3, seed=1)
    gamma, cost = 0.4, 5.0
    svm = _svm(kernel_type=kind, gamma=gamma, cost=cost)
    ds = DataSet(X, dtype=np.float64)
    model = fit_one_class(svm, ds, nu=0.1, epsilon=1e-10)

    K = golden.kernel_matrix(X, kind, gamma=gamma)
    want_alpha = np.linalg.solve(K + np.eye(60) / cost, np.ones(60))
    np.testing.assert_allclose(model.alpha, want_alpha, rtol=1e-6, atol=1e-8)
    # rho = nu-quantile of the training scores g = K @ alpha
    g = K @ want_alpha
    assert model.rho == pytest.approx(float(np.quantile(g, 0.1)), rel=1e-6)
    # decision values through the ordinary predict path
    got = svm.predict_values(model, ds)
    np.testing.assert_allclose(got, g - model.rho, rtol=1e-6, atol=1e-8)


def test_one_class_nu_fraction_and_outlier_detection():
    X = _cloud(n=200, d=5, seed=2, outliers=20)
    svm = _svm(kernel_type="rbf", gamma=0.2, cost=10.0)
    ds = DataSet(X, dtype=np.float64)
    model = fit_one_class(svm, ds, nu=0.1)
    assert model.is_one_class and not model.is_regression
    pred = svm.predict(model, ds)
    assert set(np.unique(pred)) <= {-1, 1}
    # ~nu of the training points are flagged outliers ...
    assert abs(float(np.mean(pred == -1)) - 0.1) < 0.03
    # ... and they are overwhelmingly the gross appended outliers
    assert float(np.mean(pred[-20:] == -1)) >= 0.9


def test_one_class_model_file_roundtrip(tmp_path):
    X = _cloud(n=80, d=4, seed=3)
    svm = _svm(kernel_type="rbf", gamma=0.5, cost=2.0)
    ds = DataSet(X, dtype=np.float64)
    model = fit_one_class(svm, ds, nu=0.25)
    path = os.fspath(tmp_path / "oc.model")
    model.save(path)
    with open(path) as fh:
        content = fh.read()
    assert "svm_type one_class" in content
    assert "label" not in content.split("SV")[0]
    loaded = Model.load(path)
    assert loaded.is_one_class and not loaded.is_regression
    np.testing.assert_allclose(
        svm.predict_values(loaded, ds), svm.predict_values(model, ds),
        rtol=1e-10, atol=1e-10,
    )
    np.testing.assert_array_equal(svm.predict(loaded, ds),
                                  svm.predict(model, ds))


def test_real_libsvm_one_class_model_interop(tmp_path):
    """A model trained by the REAL libsvm (sklearn.svm.OneClassSVM) written
    in LIBSVM's one_class layout must reproduce libsvm's decision function
    and predictions exactly."""
    sklearn = pytest.importorskip("sklearn")
    from sklearn.svm import OneClassSVM

    rng = np.random.default_rng(4)
    X = rng.normal(size=(60, 3))
    gamma = 0.5
    clf = OneClassSVM(kernel="rbf", gamma=gamma, nu=0.2).fit(X)

    # serialize exactly like libsvm's svm_save_model for -s 2
    path = os.fspath(tmp_path / "libsvm_oc.model")
    lines = [
        "svm_type one_class",
        "kernel_type rbf",
        f"gamma {gamma}",
        "nr_class 2",
        f"total_sv {clf.support_vectors_.shape[0]}",
        f"rho {float(clf.offset_[0]):.17g}",
        "SV",
    ]
    for coef, sv in zip(clf.dual_coef_[0], clf.support_vectors_):
        feats = " ".join(
            f"{j + 1}:{v:.17g}" for j, v in enumerate(sv)
        )
        lines.append(f"{coef:.17g} {feats}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    model = Model.load(path)
    assert model.is_one_class
    svm = _svm(kernel_type="rbf", gamma=gamma)
    ds = DataSet(X, dtype=np.float64)
    np.testing.assert_allclose(
        svm.predict_values(model, ds), clf.decision_function(X),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_array_equal(svm.predict(model, ds), clf.predict(X))


def test_one_class_validation_errors():
    X = _cloud(n=30, d=3)
    svm = _svm()
    ds = DataSet(X, dtype=np.float64)
    with pytest.raises(InvalidParameterError, match="nu must be in"):
        fit_one_class(svm, ds, nu=0.0)
    with pytest.raises(InvalidParameterError, match="nu must be in"):
        fit_one_class(svm, ds, nu=1.0)
    with pytest.raises(InvalidParameterError, match="epsilon"):
        fit_one_class(svm, ds, epsilon=0.0)
    with pytest.raises(InvalidParameterError, match="max_iter"):
        fit_one_class(svm, ds, max_iter=0)


# ---------------------------------------------------------------------------
# CLI: plssvm-train -s one_class / plssvm-predict on the model
# ---------------------------------------------------------------------------


def test_cli_one_class_train_and_predict(tmp_path):
    from plssvm_tpu.cli import predict as cli_predict
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X = _cloud(n=60, d=4, seed=5)
    train_path = os.fspath(tmp_path / "oc.libsvm")
    # one-class training files conventionally carry a single +1 label class
    write_libsvm_file(train_path, X, np.ones(60, dtype=np.int64))
    model_path = os.fspath(tmp_path / "oc.model")
    rc = cli_train.main(
        ["-q", "--use_double_as_real_type", "-s", "one_class",
         "-n", "0.2", "-t", "2", "-g", "0.3", train_path, model_path]
    )
    assert rc == 0
    with open(model_path) as fh:
        assert "svm_type one_class" in fh.read()

    out_path = os.fspath(tmp_path / "oc.predict")
    rc = cli_predict.main(
        ["-q", "--use_double_as_real_type", train_path, model_path, out_path]
    )
    assert rc == 0
    pred = np.loadtxt(out_path, dtype=np.int64)
    assert set(np.unique(pred)) <= {-1, 1}
    assert abs(float(np.mean(pred == -1)) - 0.2) < 0.05


def test_cli_one_class_flag_conflicts(tmp_path, capsys):
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X = _cloud(n=20, d=3, seed=6)
    train_path = os.fspath(tmp_path / "oc.libsvm")
    write_libsvm_file(train_path, X, np.ones(20, dtype=np.int64))
    rc = cli_train.main(
        ["-q", "-s", "one_class", "-n", "1.5", train_path]
    )
    assert rc == 1
    assert "nu must be in" in capsys.readouterr().err
    rc = cli_train.main(
        ["-q", "-s", "one_class", "--weight", "1=2.0", train_path]
    )
    assert rc == 1
    assert "--weight" in capsys.readouterr().err
    rc = cli_train.main(
        ["-q", "-s", "one_class", "--probability", train_path]
    )
    assert rc == 1
    assert "--probability" in capsys.readouterr().err
    # --max_sv and --nystroem now COMPOSE with one_class (compact novelty
    # models) but remain mutually exclusive
    rc = cli_train.main(
        ["-q", "-s", "one_class", "--max_sv", "5", "--nystroem", "5",
         train_path]
    )
    assert rc == 1
    assert "mutually exclusive" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# sklearn facade: plssvm_tpu.OneClassSVM
# ---------------------------------------------------------------------------


def test_sklearn_one_class_facade_basics():
    from plssvm_tpu import OneClassSVM

    X = _cloud(n=120, d=4, seed=7, outliers=12)
    clf = OneClassSVM(kernel="rbf", gamma=0.3, nu=0.1, C=10.0)
    pred = clf.fit_predict(X)
    assert set(np.unique(pred)) <= {-1, 1}
    assert abs(float(np.mean(pred == -1)) - 0.1) < 0.05
    # sklearn contract: decision_function = score_samples - offset_
    df = clf.decision_function(X)
    np.testing.assert_allclose(clf.score_samples(X) - clf.offset_, df,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.where(df > 0, 1, -1), pred)
    assert clf.dual_coef_.shape == (1, 132)
    assert clf.intercept_[0] == pytest.approx(-clf.offset_)
    assert clf.n_features_in_ == 4
    assert clf.n_iter_ >= 1


def test_sklearn_one_class_facade_param_contract():
    from plssvm_tpu import OneClassSVM

    with pytest.raises(AttributeError, match="Invalid parameter"):
        OneClassSVM(bogus=1)
    with pytest.raises(AttributeError, match="not implemented"):
        OneClassSVM(shrinking=True)
    clf = OneClassSVM(nu=0.2)
    params = clf.get_params()
    assert params["nu"] == 0.2 and params["gamma"] == "scale"
    clf.set_params(nu=0.3)
    assert clf.get_params()["nu"] == 0.3
    with pytest.raises(AttributeError, match="not fitted"):
        OneClassSVM().predict(np.zeros((2, 2)))


def test_one_class_score_against_labeled_data():
    X = _cloud(n=100, d=4, seed=8, outliers=10)
    svm = _svm(kernel_type="rbf", gamma=0.3, cost=10.0)
    model = fit_one_class(svm, DataSet(X, dtype=np.float64), nu=0.1)
    truth = np.concatenate([np.ones(100, np.int64), -np.ones(10, np.int64)])
    acc = svm.score(model, DataSet(X, truth, dtype=np.float64))
    assert acc >= 0.9
    with pytest.raises(InvalidParameterError, match="must have labels"):
        svm.score(model)  # the model's own data carries no labels


# ---------------------------------------------------------------------------
# composition (round-4 verdict item 2): sharded / multihost / compact
# one-class — the classifier had all of these, the novelty detector none
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oc_problem():
    X = _cloud(n=200, d=6, seed=10)
    return X, DataSet(X, dtype=np.float64)


@pytest.mark.parametrize("kind", ["linear", "rbf", "polynomial"])
@pytest.mark.parametrize("n_dev", [4, 8])
def test_one_class_sharded_matches_single_device(oc_problem, kind, n_dev):
    import jax

    X, ds = oc_problem
    kw = dict(kernel_type=kind, gamma=0.2, cost=10.0, coef0=1.0)
    single = _svm(**kw)
    m1 = fit_one_class(single, ds, nu=0.2, epsilon=1e-10)
    devs = jax.devices("cpu")[:n_dev]
    sharded = _svm(devices=devs, **kw)
    m2 = fit_one_class(sharded, ds, nu=0.2, epsilon=1e-10)
    np.testing.assert_allclose(m2.alpha, m1.alpha, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(m2.rho, m1.rho, rtol=1e-7)
    v1 = single.predict_values(m1, ds)
    v2 = single.predict_values(m2, ds)
    np.testing.assert_allclose(v2, v1, rtol=1e-6, atol=1e-8)


def test_one_class_multihost_single_process(oc_problem, tmp_path):
    import jax

    from plssvm_tpu import fit_one_class_multihost
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X, ds = oc_problem
    fname = os.fspath(tmp_path / "oc_mh.libsvm")
    write_libsvm_file(fname, X, np.ones(X.shape[0]))
    single = _svm(kernel_type="rbf", gamma=0.2, cost=10.0)
    m1 = fit_one_class(single, ds, nu=0.2, epsilon=1e-10)
    devs = jax.devices("cpu")[:8]
    sharded = _svm(kernel_type="rbf", gamma=0.2, cost=10.0, devices=devs)
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(devs)
    try:
        m2 = fit_one_class_multihost(sharded, fname, nu=0.2, epsilon=1e-10)
    finally:
        mh.global_row_mesh = orig
    np.testing.assert_allclose(m2.alpha, m1.alpha, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(m2.rho, m1.rho, rtol=1e-7)
    assert m2.is_one_class


def test_one_class_warm_start_zero_iterations(oc_problem):
    X, ds = oc_problem
    svm = _svm(kernel_type="rbf", gamma=0.2, cost=10.0)
    m1 = fit_one_class(svm, ds, nu=0.2, epsilon=1e-10)
    m2 = fit_one_class(svm, ds, nu=0.2, epsilon=1e-10, initial_model=m1)
    assert m2.n_iter == 0
    np.testing.assert_allclose(m2.alpha, m1.alpha, rtol=1e-9)
    with pytest.raises(InvalidParameterError, match="initial_model"):
        fit_one_class(
            svm, DataSet(X[:50], dtype=np.float64), initial_model=m1
        )


def test_nystroem_one_class_full_landmarks_matches_exact(oc_problem):
    import golden

    from plssvm_tpu import nystroem_fit_one_class

    X, ds = oc_problem
    n = X.shape[0]
    svm = _svm(kernel_type="rbf", gamma=0.2, cost=5.0)
    exact = fit_one_class(svm, ds, nu=0.2, epsilon=1e-12)
    compact = nystroem_fit_one_class(
        svm, ds, landmarks=np.arange(n), nu=0.2, rcond=1e-12
    )
    np.testing.assert_allclose(
        svm.predict_values(compact, ds), svm.predict_values(exact, ds),
        rtol=1e-6, atol=1e-7,
    )
    assert compact.is_one_class and compact.n_iter == 0


def test_nystroem_one_class_subsampled(oc_problem):
    from plssvm_tpu import nystroem_fit_one_class

    X, ds = oc_problem
    svm = _svm(kernel_type="rbf", gamma=0.2, cost=10.0)
    model, idx = nystroem_fit_one_class(
        svm, ds, n_landmarks=48, nu=0.2, random_state=0, return_indices=True
    )
    assert model.num_support_vectors == 48 and idx.shape == (48,)
    pred = svm.predict(model, ds)
    # the nu-quantile threshold is computed on the FULL data's scores
    assert abs(float(np.mean(pred == -1)) - 0.2) < 0.03


def test_nystroem_one_class_sharded_matches_single(oc_problem):
    import jax

    from plssvm_tpu import nystroem_fit_one_class

    X, ds = oc_problem
    kw = dict(kernel_type="rbf", gamma=0.2, cost=10.0)
    m1 = nystroem_fit_one_class(
        _svm(**kw), ds, n_landmarks=32, nu=0.2, random_state=1, row_block=32
    )
    devs = jax.devices("cpu")[:4]
    m2 = nystroem_fit_one_class(
        _svm(devices=devs, **kw), ds, n_landmarks=32, nu=0.2,
        random_state=1, row_block=32,
    )
    np.testing.assert_allclose(m2.alpha, m1.alpha, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(m2.rho, m1.rho, rtol=1e-7)


def test_pruned_one_class(oc_problem):
    from plssvm_tpu import pruned_fit_one_class

    X, ds = oc_problem
    svm = _svm(kernel_type="rbf", gamma=0.2, cost=10.0)
    model, idx = pruned_fit_one_class(
        svm, ds, n_sv=50, nu=0.2, epsilon=1e-8, return_indices=True
    )
    assert model.num_support_vectors == 50 and idx.shape == (50,)
    np.testing.assert_allclose(X[idx], np.asarray(model.support_vectors))
    pred = svm.predict(model, ds)
    assert abs(float(np.mean(pred == -1)) - 0.2) < 0.05
    with pytest.raises(InvalidParameterError, match="n_sv must be in"):
        pruned_fit_one_class(svm, ds, n_sv=0)


def test_one_class_model_file_roundtrip_compact(tmp_path, oc_problem):
    from plssvm_tpu import nystroem_fit_one_class

    X, ds = oc_problem
    svm = _svm(kernel_type="rbf", gamma=0.2, cost=10.0)
    model = nystroem_fit_one_class(
        svm, ds, n_landmarks=24, nu=0.3, random_state=0
    )
    path = os.fspath(tmp_path / "oc_compact.model")
    model.save(path)
    loaded = Model.load(path)
    assert loaded.is_one_class
    np.testing.assert_allclose(
        svm.predict_values(loaded, ds), svm.predict_values(model, ds),
        rtol=1e-6, atol=1e-8,
    )


def test_cli_one_class_compact(tmp_path):
    from plssvm_tpu.cli import predict as cli_predict
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X = _cloud(n=80, d=4, seed=12)
    train_path = os.fspath(tmp_path / "occ.libsvm")
    write_libsvm_file(train_path, X, np.ones(80, dtype=np.int64))
    for flag, value in (("--nystroem", "16"), ("--max_sv", "16")):
        model_path = os.fspath(tmp_path / f"occ{flag[2:4]}.model")
        rc = cli_train.main(
            ["-q", "--use_double_as_real_type", "-s", "one_class",
             "-n", "0.2", "-t", "2", "-g", "0.3", flag, value,
             train_path, model_path]
        )
        assert rc == 0, flag
        with open(model_path) as fh:
            content = fh.read()
        assert "svm_type one_class" in content
        assert "total_sv 16" in content
        out_path = os.fspath(tmp_path / "occ.predict")
        rc = cli_predict.main(
            ["-q", "--use_double_as_real_type", train_path, model_path,
             out_path]
        )
        assert rc == 0
        pred = np.loadtxt(out_path, dtype=np.int64)
        assert set(np.unique(pred)) <= {-1, 1}


def test_sklearn_one_class_compact_kwargs(oc_problem):
    from plssvm_tpu import OneClassSVM

    X, _ = oc_problem
    clf = OneClassSVM(kernel="rbf", gamma=0.2, nu=0.2, n_landmarks=32,
                      random_state=0)
    clf.fit(X)
    assert clf.support_vectors_.shape[0] == 32
    np.testing.assert_allclose(X[clf.support_], clf.support_vectors_)
    pred = clf.predict(X)
    assert abs(float(np.mean(pred == -1)) - 0.2) < 0.05

    clf2 = OneClassSVM(kernel="rbf", gamma=0.2, nu=0.2, max_sv=40)
    clf2.fit(X)
    assert clf2.support_vectors_.shape[0] == 40
    with pytest.raises(AttributeError, match="mutually exclusive"):
        OneClassSVM(max_sv=8, n_landmarks=8).fit(X)
    from sklearn.base import clone

    assert clone(clf).get_params()["n_landmarks"] == 32


def test_nystroem_one_class_streaming(tmp_path):
    """Streaming one-class fixed-size fit == in-memory on the same
    landmarks; CLI -s one_class --nystroem --streaming."""
    from plssvm_tpu import (
        nystroem_fit_one_class,
        nystroem_fit_one_class_from_file,
    )
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X = _cloud(n=400, d=6, seed=40)
    path = os.fspath(tmp_path / "oc_stream.libsvm")
    write_libsvm_file(path, X, np.ones(400))
    svm = _svm(kernel_type="rbf", gamma=0.2, cost=10.0)
    model, idx = nystroem_fit_one_class_from_file(
        svm, path, n_landmarks=48, nu=0.2, random_state=0,
        row_block=128, return_indices=True,
    )
    ds = DataSet(X, dtype=np.float64)
    ref = nystroem_fit_one_class(
        svm, ds, landmarks=idx, nu=0.2
    )
    np.testing.assert_allclose(
        np.asarray(model.alpha), np.asarray(ref.alpha),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(model.rho, ref.rho, rtol=1e-8)
    pred = svm.predict(model, ds)
    assert abs(float(np.mean(pred == -1)) - 0.2) < 0.04

    from plssvm_tpu.cli import train as cli_train

    mf = os.fspath(tmp_path / "oc_stream.model")
    rc = cli_train.main(
        ["-q", "--use_double_as_real_type", "-s", "one_class", "-n", "0.2",
         "-t", "2", "-g", "0.2", "--nystroem", "32", "--streaming",
         path, mf]
    )
    assert rc == 0
    with open(mf) as fh:
        content = fh.read()
    assert "svm_type one_class" in content and "total_sv 32" in content


@pytest.mark.parametrize("kind", ["rbf", "laplacian", "chi_squared"])
def test_one_class_explicit_solver_matches_implicit(kind):
    """Solver types apply to one-class like everything else (round 6):
    cg_explicit materializes K once (memoized on the DataSet) and must
    match cg_implicit to fp tolerance; warm starts ride it too."""
    rng = np.random.default_rng(50)
    X = np.abs(rng.normal(size=(200, 6)))
    ds_i = DataSet(X, dtype=np.float64)
    ds_e = DataSet(X, dtype=np.float64)
    kw = dict(kernel_type=kind, gamma=0.1, cost=10.0)
    mi = fit_one_class(
        _svm(solver="cg_implicit", **kw), ds_i, nu=0.25, epsilon=1e-10
    )
    svm_e = _svm(solver="cg_explicit", **kw)
    me = fit_one_class(svm_e, ds_e, nu=0.25, epsilon=1e-10)
    np.testing.assert_allclose(me.alpha, mi.alpha, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(me.rho, mi.rho, rtol=1e-8)
    # K is memoized on the DataSet: the warm refit runs 0 iterations and
    # reuses the built matrix
    m2 = fit_one_class(
        svm_e, ds_e, nu=0.25, epsilon=1e-10, initial_model=me
    )
    assert m2.n_iter == 0


def test_one_class_weighted_matches_dense_golden():
    """Suykens' weighting applied to one-class (round 6): the solve is
    (K + diag(1/(C s))) a = 1 — validated against the dense system on the
    implicit, explicit, and 8-device sharded paths, plus the compact
    fits."""
    import jax

    from plssvm_tpu import (
        fit_one_class, nystroem_fit_one_class, pruned_fit_one_class,
    )

    rng = np.random.default_rng(60)
    n = 200
    X = np.abs(rng.normal(size=(n, 6)))
    s = rng.uniform(0.5, 3.0, size=n)
    gamma, cost = 0.2, 10.0
    ds = DataSet(X, dtype=np.float64)
    K = golden.kernel_matrix(X, "rbf", gamma=gamma)
    want = np.linalg.solve(K + np.diag(1.0 / (cost * s)), np.ones(n))
    g = K @ want

    svm = _svm(kernel_type="rbf", gamma=gamma, cost=cost,
               solver="cg_implicit")
    m = fit_one_class(svm, ds, nu=0.2, epsilon=1e-12, sample_weight=s)
    np.testing.assert_allclose(m.alpha, want, rtol=1e-7, atol=1e-9)
    assert m.rho == pytest.approx(float(np.quantile(g, 0.2)), abs=1e-8)

    svm_e = _svm(kernel_type="rbf", gamma=gamma, cost=cost,
                 solver="cg_explicit")
    me = fit_one_class(
        svm_e, DataSet(X, dtype=np.float64), nu=0.2, epsilon=1e-12,
        sample_weight=s,
    )
    np.testing.assert_allclose(me.alpha, want, rtol=1e-7, atol=1e-9)

    devs = jax.devices("cpu")[:8]
    svm8 = _svm(kernel_type="rbf", gamma=gamma, cost=cost, devices=devs)
    m8 = fit_one_class(svm8, ds, nu=0.2, epsilon=1e-12, sample_weight=s)
    np.testing.assert_allclose(m8.alpha, want, rtol=1e-6, atol=1e-9)

    # exact-basis weighted nystroem reproduces the weighted scores
    mn = nystroem_fit_one_class(
        svm, ds, landmarks=np.arange(n), nu=0.2, rcond=1e-12,
        sample_weight=s,
    )
    vals = np.asarray(svm.predict_values(mn, ds)) + mn.rho
    np.testing.assert_allclose(vals, g, rtol=1e-6, atol=1e-7)

    mp_, idx = pruned_fit_one_class(
        svm, ds, n_sv=50, nu=0.2, epsilon=1e-8, sample_weight=s,
        return_indices=True,
    )
    assert mp_.num_support_vectors == 50 and idx.shape == (50,)

    with pytest.raises(InvalidParameterError, match="positive"):
        fit_one_class(svm, ds, sample_weight=np.zeros(n))
    with pytest.raises(InvalidParameterError, match="one entry per"):
        fit_one_class(svm, ds, sample_weight=np.ones(3))


def test_one_class_weights_multihost_and_sklearn(tmp_path):
    import jax

    from plssvm_tpu import OneClassSVM, fit_one_class_multihost
    from plssvm_tpu.io.libsvm import write_libsvm_file

    rng = np.random.default_rng(61)
    n = 160
    X = np.abs(rng.normal(size=(n, 5)))
    s = rng.uniform(0.5, 3.0, size=n)
    gamma, cost = 0.2, 10.0
    K = golden.kernel_matrix(X, "rbf", gamma=gamma)
    want = np.linalg.solve(K + np.diag(1.0 / (cost * s)), np.ones(n))

    # multihost (single-process) weighted
    f = os.fspath(tmp_path / "ocw.libsvm")
    write_libsvm_file(f, X, np.ones(n))
    devs = jax.devices("cpu")[:8]
    svm8 = _svm(kernel_type="rbf", gamma=gamma, cost=cost, devices=devs)
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(devs)
    try:
        m = fit_one_class_multihost(
            svm8, f, nu=0.2, epsilon=1e-12, sample_weight=s
        )
    finally:
        mh.global_row_mesh = orig
    np.testing.assert_allclose(m.alpha, want, rtol=1e-6, atol=1e-9)

    # sklearn facade: fit(sample_weight=) now implemented
    clf = OneClassSVM(kernel="rbf", gamma=gamma, C=cost, nu=0.2, tol=1e-10)
    clf.fit(X, sample_weight=s)
    np.testing.assert_allclose(
        clf.dual_coef_[0], want, rtol=1e-6, atol=1e-8
    )


def test_cli_one_class_multihost_checkpoint_composes(tmp_path, monkeypatch):
    """-s one_class --multihost --checkpoint threads the checkpoint args
    into fit_one_class_multihost (previously rejected)."""
    from plssvm_tpu import one_class as oc_mod
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X = _cloud(n=20, d=3, seed=6)
    path = os.fspath(tmp_path / "oc.libsvm")
    write_libsvm_file(path, X, np.ones(20))
    seen = {}

    def stub(svm, filename, **kw):
        seen.update(kw)
        from plssvm_tpu import DataSet, fit_one_class

        return fit_one_class(
            svm, DataSet(X, dtype=svm.dtype),
            nu=kw.get("nu", 0.5),
        )

    monkeypatch.setattr(oc_mod, "fit_one_class_multihost", stub)
    rc = cli_train.main(
        ["-q", "-s", "one_class", "--multihost",
         "--checkpoint", os.fspath(tmp_path / "c.ckpt"),
         "--checkpoint_interval", "5",
         path, os.fspath(tmp_path / "oc.model")]
    )
    assert rc == 0
    assert seen["checkpoint_path"] == os.fspath(tmp_path / "c.ckpt")
    assert seen["checkpoint_interval"] == 5


def test_one_class_sharded_warm_start(tmp_path):
    """A converged one-class model warm-starts a sharded refit to 0
    iterations (previously the sharded path silently ran cold)."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    X = _cloud(n=200, d=5, seed=31)
    svm8 = _svm(kernel_type="rbf", gamma=0.2, cost=20.0, devices=devs[:8])
    ds = DataSet(X, dtype=np.float64)
    cold = fit_one_class(svm8, ds, nu=0.2, epsilon=1e-10)
    assert cold.n_iter > 5
    warm = fit_one_class(
        svm8, ds, nu=0.2, epsilon=1e-10, initial_model=cold
    )
    assert warm.n_iter == 0
    np.testing.assert_allclose(warm.alpha, cold.alpha, rtol=1e-12)
    np.testing.assert_allclose(warm.rho, cold.rho, rtol=1e-12)


def test_nystroem_one_class_chi_squared_rejects_negative():
    from plssvm_tpu import nystroem_fit_one_class

    rng = np.random.default_rng(70)
    X = rng.normal(size=(60, 4))  # has negatives
    svm = _svm(kernel_type="chi_squared", gamma=0.2)
    with pytest.raises(InvalidParameterError, match="non-negative"):
        nystroem_fit_one_class(svm, DataSet(X, dtype=np.float64),
                               n_landmarks=16)


def test_one_class_sharded_explicit_matches_implicit(tmp_path):
    """solver='cg_explicit' on the 8-device mesh: the row-sharded K
    (all_gather + local matmul per iteration) lands on the implicit ring's
    answer (round-7: one-class solver types now apply on meshes)."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    X = np.abs(np.random.default_rng(41).normal(size=(220, 6)))
    ds = DataSet(X, dtype=np.float64)
    kw = dict(kernel_type="rbf", gamma=0.15, cost=30.0, devices=devs[:8])
    imp = fit_one_class(_svm(solver="cg_implicit", **kw), ds,
                        nu=0.2, epsilon=1e-10)
    exp = fit_one_class(_svm(solver="cg_explicit", **kw), ds,
                        nu=0.2, epsilon=1e-10)
    np.testing.assert_allclose(exp.alpha, imp.alpha, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(exp.rho, imp.rho, rtol=1e-8)

    # explicit + checkpointing compose on the mesh
    ck = os.fspath(tmp_path / "oce.ckpt")
    seg = fit_one_class(
        _svm(solver="cg_explicit", **kw), ds, nu=0.2, epsilon=1e-10,
        checkpoint_path=ck, checkpoint_interval=7,
    )
    assert seg.n_iter == exp.n_iter
    np.testing.assert_allclose(seg.alpha, exp.alpha, rtol=1e-9, atol=1e-12)
    assert not os.path.exists(ck)


def test_one_class_multihost_explicit_matches_implicit(tmp_path):
    """fit_one_class_multihost under solver='cg_explicit' (global-mesh
    row-sharded K) equals the implicit multihost fit at process_count()==1."""
    from plssvm_tpu import fit_one_class_multihost
    from plssvm_tpu.io.libsvm import write_libsvm_file
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    X = np.abs(np.random.default_rng(42).normal(size=(190, 5)))
    f = os.fspath(tmp_path / "oce_mh.libsvm")
    write_libsvm_file(f, X, np.ones(X.shape[0]))
    kw = dict(kernel_type="rbf", gamma=0.2, cost=20.0, devices=devs[:8])

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(devs[:8])
    try:
        imp = fit_one_class_multihost(
            _svm(solver="cg_implicit", **kw), f, nu=0.2, epsilon=1e-10
        )
        exp = fit_one_class_multihost(
            _svm(solver="cg_explicit", **kw), f, nu=0.2, epsilon=1e-10
        )
    finally:
        mh.global_row_mesh = orig
    np.testing.assert_allclose(exp.alpha, imp.alpha, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(exp.rho, imp.rho, rtol=1e-8)


def test_cli_one_class_warm_start_composes(tmp_path):
    """-s one_class --warm_start (round-7; previously rejected): a
    converged one-class model refits in 0 CG iterations."""
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X = _cloud(n=80, d=4, seed=9)
    f = os.fspath(tmp_path / "ocw.libsvm")
    write_libsvm_file(f, X, np.ones(80, dtype=np.int64))
    m1 = os.fspath(tmp_path / "ocw1.model")
    m2 = os.fspath(tmp_path / "ocw2.model")
    assert cli_train.main(
        ["-q", "--use_double_as_real_type", "-s", "one_class",
         "-n", "0.2", "-t", "2", "-g", "0.3", f, m1]
    ) == 0
    assert cli_train.main(
        ["-q", "--use_double_as_real_type", "-s", "one_class",
         "-n", "0.2", "-t", "2", "-g", "0.3", "--warm_start", m1, f, m2]
    ) == 0
    a1 = np.asarray(Model.load(m1).alpha)
    a2 = np.asarray(Model.load(m2).alpha)
    np.testing.assert_allclose(a2, a1, rtol=1e-9, atol=1e-12)


def test_one_class_multihost_warm_start(tmp_path):
    """fit_one_class_multihost(initial_model=): 0 iterations from a
    converged model (one-class files keep original row order — no
    realignment); rejected with checkpoint_path."""
    from plssvm_tpu import fit_one_class_multihost
    from plssvm_tpu.io.libsvm import write_libsvm_file
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    X = np.abs(np.random.default_rng(71).normal(size=(140, 5)))
    f = os.fspath(tmp_path / "ocwmh.libsvm")
    write_libsvm_file(f, X, np.ones(140))
    svm8 = _svm(kernel_type="rbf", gamma=0.2, cost=20.0, devices=devs[:8])

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(devs[:8])
    try:
        cold = fit_one_class_multihost(svm8, f, nu=0.2, epsilon=1e-10)
        assert cold.n_iter > 3
        # round-trip through the model FILE (original row order preserved)
        mf = os.fspath(tmp_path / "ocwmh.model")
        cold.save(mf)
        warm = fit_one_class_multihost(
            svm8, f, nu=0.2, epsilon=1e-10, initial_model=Model.load(mf)
        )
        assert warm.n_iter == 0
        np.testing.assert_allclose(warm.alpha, cold.alpha, rtol=1e-10)
        assert warm.rho == pytest.approx(cold.rho, rel=1e-10)
        with pytest.raises(InvalidParameterError, match="initial_model"):
            fit_one_class_multihost(
                svm8, f, initial_model=cold,
                checkpoint_path=os.fspath(tmp_path / "c.ckpt"),
            )
    finally:
        mh.global_row_mesh = orig
