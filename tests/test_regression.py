"""Least-squares SVR (regression) — EXTENSION tests.

Neither the bundled reference nor upstream PLSSVM supports regression.
LS-SVR is the natural extension: the SAME linear system as the classifier
with continuous targets (the dimensionality-reduction trick is
target-agnostic), so every solver path applies unchanged.  Model files use
LIBSVM's epsilon_svr layout — the prediction function is identical, and a
model trained by the REAL libsvm (sklearn.svm.SVR) must load and predict
exactly.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from plssvm_tpu import CSVM, DataSet, Model, SVR
from plssvm_tpu.exceptions import InvalidFileFormatError


def _regression_data(n=120, d=5, seed=0, noise=0.05):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1] + noise * rng.normal(size=n)
    return X, y


def _dense_lssvr(X, y, gamma, cost):
    """Golden dense LS-SVR: [0 1^T; 1 K+I/C][b; a] = [0; y]."""
    n = X.shape[0]
    K = np.exp(-gamma * ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    A = np.zeros((n + 1, n + 1))
    A[0, 1:] = 1.0
    A[1:, 0] = 1.0
    A[1:, 1:] = K + np.eye(n) / cost
    sol = np.linalg.solve(A, np.concatenate([[0.0], y]))
    return sol[0], sol[1:], K  # bias, alpha, K


class TestLSSVR:
    def test_matches_dense_solution(self):
        X, y = _regression_data(seed=1)
        ds = DataSet(X, y, regression=True)
        assert ds.is_regression
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.5,
            cost=100.0,
        )
        model = svm.fit(ds, epsilon=1e-12, max_iter=5000)
        assert model.is_regression
        bias, alpha, K = _dense_lssvr(X, y, 0.5, 100.0)
        np.testing.assert_allclose(model.rho, -bias, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(model.alpha), alpha, atol=1e-7
        )
        preds = svm.predict(model, DataSet(X[:11]))
        np.testing.assert_allclose(preds, K[:11] @ alpha + bias, atol=1e-8)
        assert svm.score(model) > 0.999  # R^2

    @pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
    def test_solver_types(self, solver):
        X, y = _regression_data(seed=2)
        ds = DataSet(X, y, regression=True)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.5,
            cost=50.0, solver=solver,
        )
        model = svm.fit(ds, epsilon=1e-10)
        assert svm.score(model) > 0.99

    def test_warm_start(self):
        X, y = _regression_data(seed=3)
        ds = DataSet(X, y, regression=True)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.5,
        )
        m1 = svm.fit(ds, epsilon=1e-10)
        m2 = svm.fit(ds, epsilon=1e-10, initial_model=m1)
        assert m2.n_iter == 0
        np.testing.assert_allclose(m2.rho, m1.rho, rtol=1e-9)

    def test_linear_kernel_w_fast_path(self):
        rng = np.random.default_rng(4)
        X = rng.normal(size=(80, 6))
        w_true = rng.normal(size=6)
        y = X @ w_true + 0.3
        ds = DataSet(X, y, regression=True)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="linear",
            cost=1e6,
        )
        model = svm.fit(ds, epsilon=1e-12, max_iter=5000)
        preds = svm.predict(model, DataSet(X))
        np.testing.assert_allclose(preds, y, atol=1e-3)

    def test_model_file_round_trip(self, tmp_path):
        X, y = _regression_data(seed=5)
        ds = DataSet(X, y, regression=True)
        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.5,
        )
        model = svm.fit(ds, epsilon=1e-10)
        path = str(tmp_path / "svr.model")
        model.save(path)
        content = open(path).read()
        assert "svm_type epsilon_svr" in content
        assert "label" not in content.split("SV")[0].replace(
            "# This model file", ""
        )
        loaded = Model.load(path)
        assert loaded.is_regression
        np.testing.assert_allclose(
            svm.predict(loaded, DataSet(X[:13])),
            svm.predict(model, DataSet(X[:13])),
            rtol=1e-8, atol=1e-9,
        )

    def test_proba_only_svr_file_loads(self, tmp_path):
        """libsvm -b 1 SVR models carry a LONE probA line (the Laplace
        noise scale, 'regression has probA only' in svm.cpp) — it must
        load, round-trip, and not require probB."""
        path = str(tmp_path / "svr_prob.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type epsilon_svr\nkernel_type linear\nnr_class 2\n"
                "total_sv 2\nrho 0.5\nprobA 0.25\nSV\n"
                "1.0 1:1.0\n-1.0 1:2.0\n"
            )
        model = Model.load(path)
        assert model.is_regression
        np.testing.assert_allclose(model.prob_a, [0.25])
        assert model.prob_b is None
        path2 = str(tmp_path / "svr_prob2.model")
        model.save(path2)
        content = open(path2).read()
        assert "probA 0.25" in content and "probB" not in content

    def test_truncated_svr_file_rejected(self, tmp_path):
        """total_sv must match the parsed SV row count for regression files
        too (a truncated copy must not load silently)."""
        path = str(tmp_path / "svr_trunc.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type epsilon_svr\nkernel_type linear\nnr_class 2\n"
                "total_sv 5\nrho 0.5\nSV\n"
                "1.0 1:1.0\n-1.0 1:2.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="expected 5"):
            Model.load(path)

    def test_constant_target_r2_convention(self):
        """sklearn's r2_score convention: constant targets give 0.0 unless
        the predictions are exact (then 1.0)."""
        rng = np.random.default_rng(11)
        X = rng.normal(size=(40, 3))
        y = np.full(40, 2.5)
        ds = DataSet(X, y, regression=True)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   gamma=0.5, cost=0.01)  # strong ridge -> imperfect fit
        model = svm.fit(ds, epsilon=1e-10)
        score = svm.score(model)
        assert score in (0.0, 1.0)

    def test_svr_rho_count_validated(self, tmp_path):
        path = str(tmp_path / "bad_svr.model")
        with open(path, "w") as fh:
            fh.write(
                "svm_type epsilon_svr\nkernel_type linear\nnr_class 2\n"
                "total_sv 2\nrho 0.5 0.25\nSV\n1 1:1.0\n-1 1:2.0\n"
            )
        with pytest.raises(InvalidFileFormatError, match="rho"):
            Model.load(path)


class TestSVRFacade:
    def test_fit_predict_score(self):
        X, y = _regression_data(seed=6)
        reg = SVR(kernel="rbf", gamma=0.5, C=100.0, tol=1e-10)
        reg.fit(X, y)
        assert reg.score(X, y) > 0.999
        preds = reg.predict(X[:7])
        assert preds.shape == (7,)
        assert reg.dual_coef_.shape == (1, 120)
        assert reg.intercept_.shape == (1,)
        assert reg.n_iter_[0] > 0

    def test_unsupported_params_raise(self):
        for param in ("epsilon", "nu", "shrinking", "cache_size"):
            with pytest.raises(AttributeError, match="not implemented"):
                SVR(**{param: 0.1})
        with pytest.raises(AttributeError, match="Invalid parameter"):
            SVR(bogus=1)

    def test_sklearn_cross_val(self):
        sklearn = pytest.importorskip("sklearn")
        from sklearn.model_selection import cross_val_score

        X, y = _regression_data(n=90, seed=7)
        scores = cross_val_score(
            SVR(kernel="rbf", gamma=0.5, C=100.0), X, y, cv=3
        )
        # the point is sklearn composability (clone/tags/score), not model
        # quality — out-of-fold R^2 on this noisy toy sits around 0.6-0.75
        assert np.mean(scores) > 0.5


class TestRealLibsvmSVRInterop:
    def test_sklearn_svr_model_loads_and_predicts_identically(self, tmp_path):
        """A model trained by the REAL libsvm (sklearn.svm.SVR) serialized
        into the epsilon_svr layout must reproduce libsvm's predictions to
        f64 precision — the prediction function is identical even though
        the training losses differ."""
        sklearn = pytest.importorskip("sklearn")
        from sklearn import svm as sk_svm

        X, y = _regression_data(n=100, seed=8)
        gamma = 0.4
        reg = sk_svm.SVR(kernel="rbf", gamma=gamma, C=10.0, epsilon=0.05)
        reg.fit(X, y)

        path = str(tmp_path / "sk_svr.model")
        sv = reg.support_vectors_
        coef = reg.dual_coef_[0]
        rho = -float(reg.intercept_[0])
        with open(path, "w") as fh:
            fh.write(
                "svm_type epsilon_svr\nkernel_type rbf\n"
                f"gamma {gamma!r}\nnr_class 2\ntotal_sv {sv.shape[0]}\n"
                f"rho {rho!r}\nSV\n"
            )
            for p in range(sv.shape[0]):
                feats = " ".join(
                    f"{j + 1}:{sv[p, j]:.16e}" for j in range(sv.shape[1])
                )
                fh.write(f"{float(coef[p])!r} {feats}\n")

        model = Model.load(path)
        assert model.is_regression
        plssvm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        ours = plssvm.predict(model, DataSet(X[:40]))
        theirs = reg.predict(X[:40])
        np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)


class TestRobustFit:
    def test_outliers_are_downweighted(self):
        """Suykens' iteratively reweighted LS-SVR: gross outliers barely
        move the robust fit, while the plain fit chases them."""
        rng = np.random.default_rng(13)
        n = 120
        X = np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0)
        y_clean = np.sin(X[:, 0])
        y = y_clean + 0.05 * rng.normal(size=n)
        out_idx = rng.choice(n, size=8, replace=False)
        y[out_idx] += rng.choice([-6.0, 6.0], size=8)  # gross outliers

        from plssvm_tpu.robust import reweighted_fit

        svm = CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", gamma=2.0,
            cost=50.0,
        )
        ds = DataSet(X, y, regression=True)
        plain = svm.fit(ds, epsilon=1e-8)
        robust = reweighted_fit(svm, ds, iterations=2, epsilon=1e-8)
        clean_pts = DataSet(X)
        err_plain = np.mean(
            (np.asarray(svm.predict(plain, clean_pts)) - y_clean) ** 2
        )
        err_robust = np.mean(
            (np.asarray(svm.predict(robust, clean_pts)) - y_clean) ** 2
        )
        assert err_robust < 0.5 * err_plain

    def test_hampel_weights_shape(self):
        from plssvm_tpu.robust import hampel_weights

        e = np.asarray([0.0, 0.1, -0.1, 5.0, -8.0, 0.05, -0.02, 0.03])
        w = hampel_weights(e)
        assert w.shape == e.shape
        assert np.all((w > 0) & (w <= 1))
        assert w[3] < 0.01 and w[4] < 0.01  # outliers floored
        assert w[0] == 1.0

    def test_requires_regression_dataset(self):
        from plssvm_tpu.exceptions import InvalidParameterError
        from plssvm_tpu.robust import reweighted_fit

        X, y = _regression_data(n=40, seed=14)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        with pytest.raises(InvalidParameterError, match="regression"):
            reweighted_fit(svm, DataSet(X, (y > 0).astype(int)))


def test_svr_laplace_noise_calibration(tmp_path):
    """LIBSVM's svr_probability: the CV-residual Laplace scale, stored as
    the lone probA header value and round-tripping the model file."""
    from plssvm_tpu.probability import calibrate_model, calibrate_svr_noise

    X, y = _regression_data(n=80, d=4, seed=12, noise=0.1)
    ds = DataSet(X, y, regression=True)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
               gamma=0.5, cost=100.0)
    model = svm.fit(ds, epsilon=1e-8)
    sigma = calibrate_svr_noise(svm, model, ds, random_state=0)
    # the Laplace scale of ~N(0, 0.1) noise is around 0.08 (mean |residual|)
    assert 0.02 < sigma < 0.5
    np.testing.assert_allclose(model.prob_a, [sigma])
    assert model.prob_b is None

    path = str(tmp_path / "svr_noise.model")
    model.save(path)
    assert "probA" in open(path).read()
    loaded = Model.load(path)
    np.testing.assert_allclose(loaded.prob_a, [sigma], rtol=1e-12)

    # the generic calibrate_model entry point dispatches to the SVR path
    model2 = svm.fit(DataSet(X, y, regression=True), epsilon=1e-8)
    calibrate_model(svm, model2, DataSet(X, y, regression=True),
                    random_state=0)
    np.testing.assert_allclose(model2.prob_a, [sigma], rtol=1e-9)


def test_multihost_regression_matches_regular_fit(tmp_path):
    """fit_multihost(regression=True) equals the plain LS-SVR fit at
    process_count()==1 over the 8-device mesh."""
    import jax

    devs = jax.devices("cpu")[:8]
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    X, y = _regression_data(n=140, d=4, seed=10)
    ds = DataSet(X, y, regression=True)
    f = str(tmp_path / "mh_svr.libsvm")
    ds.save(f)

    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.5,
        cost=50.0, devices=devs,
    )
    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(devs)
    try:
        model = svm.fit_multihost(f, epsilon=1e-9, regression=True)
    finally:
        mh.global_row_mesh = orig
    assert model.is_regression
    ref = CSVM(
        backend="xla", target="cpu", dtype=np.float64, kernel_type="rbf",
        gamma=0.5, cost=50.0,
    ).fit(DataSet(f, regression=True, label_type=float), epsilon=1e-9)
    np.testing.assert_allclose(
        np.asarray(model.alpha), np.asarray(ref.alpha), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(model.rho, ref.rho, rtol=1e-6)


class TestSVRCli:
    def test_train_predict_cli(self, tmp_path):
        X, y = _regression_data(n=60, d=3, seed=9)
        train_file = str(tmp_path / "svr.libsvm")
        from plssvm_tpu.io.libsvm import write_libsvm_file

        write_libsvm_file(train_file, X, y)
        model_file = str(tmp_path / "svr.model")
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            + os.pathsep + env.get("PYTHONPATH", "")
        )
        out = subprocess.run(
            [sys.executable, "-m", "plssvm_tpu.cli.train",
             "-s", "epsilon_svr", "-t", "2", "-g", "0.5", "-c", "100",
             "-e", "1e-8", "-p", "cpu", "--use_double_as_real_type",
             train_file, model_file],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        assert "svm_type epsilon_svr" in open(model_file).read()

        pred_file = str(tmp_path / "svr.predict")
        out = subprocess.run(
            [sys.executable, "-m", "plssvm_tpu.cli.predict", "-p", "cpu",
             "--use_double_as_real_type",
             train_file, model_file, pred_file],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        txt = out.stdout + out.stderr
        assert "Mean squared error" in txt
        assert "Squared correlation coefficient" in txt
        preds = np.asarray(
            [float(l) for l in open(pred_file).read().splitlines()]
        )
        assert np.mean((preds - y) ** 2) < 0.01
