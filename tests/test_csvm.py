"""End-to-end CSVM fit/predict/score tests + reference parity checks.

reference analog: tests/csvm.cpp + the GenericCSVM typed suites.
"""

import os

import numpy as np
import pytest

import golden
from conftest import make_blobs
from plssvm_tpu import CSVM, DataSet, Model, make_csvm
from plssvm_tpu.exceptions import InvalidParameterError


class TestFit:
    def test_fit_matches_dense_solve(self, kernel_name):
        X, y = make_blobs(30, 6, seed=20)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type=kernel_name,
                   gamma=0.25, coef0=1.0, cost=2.0)
        # max_iter above the default n: the poly system is ill-conditioned and
        # f64 CG needs more than n iterations to reach eps=1e-10
        model = svm.fit(ds, epsilon=1e-10, max_iter=5000)
        expected_alpha, expected_rho = golden.solve_dense(
            X.astype(np.float64), y.astype(np.float64), cost=2.0,
            kind=kernel_name, gamma=0.25, coef0=1.0, degree=3,
        )
        # CG stops on the relative *squared* residual; alpha accuracy is then
        # bounded by the system's conditioning — poly kernels are the worst
        np.testing.assert_allclose(model.alpha, expected_alpha, rtol=1e-3, atol=1e-6)
        assert model.rho == pytest.approx(expected_rho, rel=1e-4, abs=1e-6)

    def test_separable_blobs_high_accuracy(self, kernel_name):
        X, y = make_blobs(60, 8, seed=21)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type=kernel_name)
        model = svm.fit(ds)
        assert svm.score(model) >= 0.90

    def test_gamma_defaults_to_inverse_num_features(self):
        X, y = make_blobs(20, 8, seed=22)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(DataSet(X, y))
        assert model.params.gamma.value == pytest.approx(1.0 / 8)

    def test_fit_requires_labels(self):
        svm = CSVM(backend="xla")
        with pytest.raises(InvalidParameterError):
            svm.fit(DataSet(np.ones((4, 2))))

    def test_invalid_epsilon_and_max_iter(self):
        X, y = make_blobs(10, 2, seed=23)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla")
        with pytest.raises(InvalidParameterError):
            svm.fit(ds, epsilon=0.0)
        with pytest.raises(InvalidParameterError):
            svm.fit(ds, max_iter=0)

    def test_f32_converges(self, kernel_name):
        """float32 training (the TPU default precision) reaches the same
        classification accuracy as float64."""
        X, y = make_blobs(60, 8, seed=24)
        ds = DataSet(X, y)
        svm32 = CSVM(backend="xla", dtype=np.float32, kernel_type=kernel_name)
        svm64 = CSVM(backend="xla", dtype=np.float64, kernel_type=kernel_name)
        score32 = svm32.score(svm32.fit(ds))
        score64 = svm64.score(svm64.fit(ds))
        assert abs(score32 - score64) <= 0.05


class TestPredict:
    def test_predict_labels_original_type(self):
        X, y = make_blobs(20, 4, seed=25)
        labels = np.where(y > 0, "yes", "no").astype(object)
        ds = DataSet(X, labels)
        svm = CSVM(backend="xla", dtype=np.float64)
        model = svm.fit(ds)
        pred = svm.predict(model, ds)
        assert set(pred) <= {"yes", "no"}

    def test_predict_feature_mismatch(self):
        X, y = make_blobs(10, 4, seed=26)
        svm = CSVM(backend="xla", dtype=np.float64)
        model = svm.fit(DataSet(X, y))
        with pytest.raises(InvalidParameterError):
            svm.predict(model, DataSet(np.ones((2, 3))))

    def test_score_requires_labels(self):
        X, y = make_blobs(10, 4, seed=27)
        svm = CSVM(backend="xla", dtype=np.float64)
        model = svm.fit(DataSet(X, y))
        with pytest.raises(InvalidParameterError):
            svm.score(model, DataSet(np.ones((2, 4))))

    def test_blocked_predict_route_matches_one_shot(self, monkeypatch):
        """With the Gram budget forced to ~0, predict_values streams over
        point row blocks (n_pred >> row_block) and must equal the one-shot
        route — VERDICT r1 #1 (scalable predict) regression coverage."""
        import plssvm_tpu.csvm as csvm_mod

        X, y = make_blobs(300, 5, seed=29)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(ds)
        points = DataSet(np.random.default_rng(3).normal(size=(701, 5)))
        one_shot = svm.predict_values(model, points)
        monkeypatch.setattr(csvm_mod, "_PREDICT_GRAM_BUDGET", 1)
        blocked = svm.predict_values(model, points)
        np.testing.assert_allclose(blocked, one_shot, rtol=1e-9, atol=1e-10)

    def test_w_cached_after_first_linear_predict(self):
        X, y = make_blobs(10, 4, seed=28)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
        model = svm.fit(ds)
        assert model.w is None
        svm.predict(model, ds)
        assert model.w is not None
        np.testing.assert_allclose(
            model.w, golden.calculate_w(X.astype(np.float64), model.alpha), rtol=1e-6
        )


class TestModelIO:
    def test_save_load_round_trip(self, tmp_path, kernel_name):
        X, y = make_blobs(20, 4, seed=29)
        ds = DataSet(X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type=kernel_name, gamma=0.3)
        model = svm.fit(ds)
        path = str(tmp_path / "m.model")
        model.save(path)
        loaded = Model.load(path)
        assert loaded.rho == pytest.approx(model.rho, rel=1e-12)
        test_ds = DataSet(X[:5], y[:5])
        np.testing.assert_array_equal(
            svm.predict(model, test_ds), svm.predict(loaded, test_ds)
        )

    def test_sv_grouped_per_class_in_file(self, tmp_path):
        X, y = make_blobs(10, 3, seed=30)
        svm = CSVM(backend="xla", dtype=np.float64)
        model = svm.fit(DataSet(X, y))
        path = str(tmp_path / "m.model")
        model.save(path)
        loaded = Model.load(path)
        labs = list(loaded.data.labels)
        # per-class contiguous blocks, -1-mapped class first
        switch_points = sum(
            1 for a, b in zip(labs, labs[1:]) if a != b
        )
        assert switch_points == 1


class TestReferenceParity:
    def test_linear_rho_matches_reference_model(self, reference_data_dir):
        ds = DataSet(os.path.join(reference_data_dir, "libsvm", "5x4.libsvm"),
                     dtype=np.float64)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="linear")
        model = svm.fit(ds)
        ref = Model.load(os.path.join(reference_data_dir, "model",
                                      "5x4_linear.libsvm.model"))
        assert model.rho == pytest.approx(ref.rho, abs=1e-9)
        assert sorted(np.round(model.alpha, 8)) == pytest.approx(
            sorted(np.round(ref.alpha, 8)), abs=1e-7
        )

    @pytest.mark.parametrize("kern", ["linear", "polynomial", "rbf"])
    def test_bundled_model_predictions_match(self, reference_data_dir, kern):
        test = DataSet(
            os.path.join(reference_data_dir, "predict", "500x200_test.libsvm"),
            dtype=np.float64,
        )
        expected = [
            int(tok) for tok in open(
                os.path.join(reference_data_dir, "predict", "500x200.libsvm.predict")
            ).read().split()
        ]
        model = Model.load(
            os.path.join(reference_data_dir, "predict", f"500x200_{kern}.libsvm.model")
        )
        svm = make_csvm(backend="xla", dtype=np.float64)
        pred = svm.predict(model, test)
        assert np.array_equal(np.asarray(pred, dtype=int), np.asarray(expected))


class TestAPIReviewRegressions:
    """Round-8 API review findings, pinned."""

    def test_predict_cache_invalidates_on_alpha_replacement(self):
        """The device SV/alpha cache keys on the array OBJECTS (like the
        OAO shadow caches): replacing model.alpha must change the
        decision values (was: stale cache served the old weights)."""
        rng = np.random.default_rng(0)
        X = rng.normal(size=(40, 4))
        y = np.where(X[:, 0] > 0, 1, -1)
        ds = DataSet(X, y, dtype=np.float64)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(ds, epsilon=1e-8)
        v1 = np.asarray(svm.predict_values(model, ds))
        model.alpha = np.zeros_like(np.asarray(model.alpha))
        model.w = None  # the linear fast-path cache follows alpha
        v2 = np.asarray(svm.predict_values(model, ds))
        assert not np.allclose(v1, v2)
        np.testing.assert_allclose(v2, -float(model.rho), atol=1e-12)

    def test_oao_batched_rejects_negative_chi_squared(self):
        """chi-squared validation must run BEFORE the OAO dispatch: the
        batched pair solve has no recursive per-machine fit to catch it."""
        rng = np.random.default_rng(1)
        X = rng.normal(size=(60, 4))  # contains negatives
        y = rng.integers(0, 3, size=60)
        y[:3] = [0, 1, 2]
        svm = CSVM(backend="xla", dtype=np.float64,
                   kernel_type="chi_squared", oao_batch="batched")
        with pytest.raises(InvalidParameterError, match="non-negative"):
            svm.fit(DataSet(np.abs(X) - 0.5, y), classification="oao")

    def test_epsilon_validation_message(self):
        svm = CSVM(backend="xla", dtype=np.float64)
        X = np.random.default_rng(0).normal(size=(10, 2))
        y = np.where(X[:, 0] > 0, 1, -1)
        with pytest.raises(
            InvalidParameterError, match="greater than 0.0"
        ):
            svm.fit(DataSet(X, y), epsilon=0.0)

    def test_constant_nonzero_feature_scaling_warns(self):
        X = np.random.default_rng(2).normal(size=(20, 3))
        X[:, 1] = 4.2  # constant nonzero
        y = np.where(X[:, 0] > 0, 1, -1)
        with pytest.warns(UserWarning, match="constant"):
            DataSet(X, y, scaling=(-1.0, 1.0))
