"""Platt-scaling probability calibration (plssvm_tpu.probability).

EXTENSION — the reference's sklearn binding rejects probability=True
(bindings/Python/sklearn.cpp:74-110) and its C++ API has no probability
support.  The pipeline here is LIBSVM's: stratified-5-fold CV decision
values + the Lin/Weng/Keerthi Newton sigmoid fit.
"""

import os
import tempfile

import numpy as np
import pytest

import plssvm_tpu as p
from plssvm_tpu.exceptions import InvalidFileFormatError
from plssvm_tpu.probability import (
    calibrate_model,
    fit_sigmoid,
    predict_probabilities,
    sigmoid_probability,
    stratified_folds,
)
from plssvm_tpu.sklearn import SVC


def _binary_blobs(n=240, d=6, seed=1):
    rng = np.random.default_rng(seed)
    half = n // 2
    X = np.concatenate(
        [rng.normal(-1, 1, (half, d)), rng.normal(1, 1, (n - half, d))]
    )
    y = np.array([-1] * half + [1] * (n - half))
    return X, y


class TestSigmoidFit:
    def test_recovers_known_logistic(self):
        rng = np.random.default_rng(0)
        f = rng.normal(size=4000) * 3
        A_true, B_true = -1.7, 0.4
        y = rng.random(4000) < 1.0 / (1.0 + np.exp(A_true * f + B_true))
        A, B = fit_sigmoid(f, y)
        assert A == pytest.approx(A_true, abs=0.15)
        assert B == pytest.approx(B_true, abs=0.15)

    def test_probability_is_stable_at_extremes(self):
        pvals = sigmoid_probability(np.array([-1e4, 0.0, 1e4]), -1.0, 0.0)
        assert np.all(np.isfinite(pvals))
        assert pvals[0] == pytest.approx(0.0, abs=1e-12)
        assert pvals[1] == pytest.approx(0.5)
        assert pvals[2] == pytest.approx(1.0, abs=1e-12)

    def test_separable_data_gives_monotone_probabilities(self):
        f = np.linspace(-2, 2, 200)
        y = f > 0
        A, B = fit_sigmoid(f, y)
        probs = sigmoid_probability(f, A, B)
        assert np.all(np.diff(probs) >= 0)  # A < 0: p increases with f
        assert probs[0] < 0.5 < probs[-1]


class TestStratifiedFolds:
    def test_every_fold_sees_every_class(self):
        rng = np.random.default_rng(2)
        labels = np.array([0] * 50 + [1] * 30 + [2] * 20)
        folds = stratified_folds(labels, 5, rng)
        for k in range(5):
            assert set(labels[folds == k]) == {0, 1, 2}

    def test_balanced_fold_sizes(self):
        rng = np.random.default_rng(3)
        labels = np.array([0] * 55 + [1] * 45)
        folds = stratified_folds(labels, 5, rng)
        sizes = np.bincount(folds)
        assert sizes.max() - sizes.min() <= 2


class TestSVCProbability:
    def test_binary_predict_proba(self):
        X, y = _binary_blobs()
        clf = SVC(kernel="rbf", gamma=0.2, probability=True,
                  random_state=42).fit(X, y)
        P = clf.predict_proba(X)
        assert P.shape == (len(y), 2)
        np.testing.assert_allclose(P.sum(axis=1), 1.0)
        # column order follows classes_; thresholding agrees with predict
        pred = np.where(P[:, 1] > 0.5, clf.classes_[1], clf.classes_[0])
        assert np.mean(pred == clf.predict(X)) > 0.97
        np.testing.assert_allclose(clf.predict_log_proba(X), np.log(P))
        assert clf.probA_.shape == (1,)
        assert clf.probB_.shape == (1,)

    def test_random_state_reproducible(self):
        X, y = _binary_blobs()
        a = SVC(kernel="rbf", gamma=0.2, probability=True,
                random_state=7).fit(X, y)
        b = SVC(kernel="rbf", gamma=0.2, probability=True,
                random_state=7).fit(X, y)
        np.testing.assert_array_equal(a.probA_, b.probA_)
        np.testing.assert_array_equal(a.probB_, b.probB_)

    def test_multiclass_predict_proba(self):
        rng = np.random.default_rng(4)
        centers = rng.normal(size=(3, 6)) * 4
        labels = rng.integers(0, 3, 300)
        X = centers[labels] + 0.5 * rng.normal(size=(300, 6))
        clf = SVC(kernel="rbf", gamma=0.2, probability=True).fit(X, labels)
        P = clf.predict_proba(X)
        assert P.shape == (300, 3)
        np.testing.assert_allclose(P.sum(axis=1), 1.0)
        agree = np.mean(clf.classes_[np.argmax(P, axis=1)] == clf.predict(X))
        assert agree > 0.95
        assert clf.probA_.shape == (3,)

    def test_probability_false_raises(self):
        X, y = _binary_blobs(n=64)
        clf = SVC(kernel="linear", probability=False).fit(X, y)
        with pytest.raises(AttributeError, match="probability"):
            clf.predict_proba(X)
        with pytest.raises(AttributeError):
            _ = clf.probA_


class TestModelFileProbability:
    def test_prob_round_trip(self):
        X, y = _binary_blobs()
        clf = SVC(kernel="rbf", gamma=0.2, probability=True,
                  random_state=0).fit(X, y)
        P = clf.predict_proba(X)
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "m.model")
            clf._model.save(path)
            lines = open(path).read().splitlines()
            assert any(line.startswith("probA ") for line in lines)
            assert any(line.startswith("probB ") for line in lines)
            loaded = p.Model.load(path)
        np.testing.assert_allclose(loaded.prob_a, clf.probA_, rtol=1e-9)
        np.testing.assert_allclose(loaded.prob_b, clf.probB_, rtol=1e-9)
        vals = clf._svm.predict_values(loaded, p.DataSet(X))
        np.testing.assert_allclose(
            predict_probabilities(loaded, vals), P, atol=1e-7
        )

    def test_uncalibrated_model_writes_no_prob_lines(self):
        X, y = _binary_blobs(n=64)
        clf = SVC(kernel="linear").fit(X, y)
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "m.model")
            clf._model.save(path)
            content = open(path).read()
        assert "probA" not in content and "probB" not in content

    def _model_text(self, extra_lines):
        return (
            "svm_type c_svc\nkernel_type linear\nnr_class 2\ntotal_sv 2\n"
            "rho 0.5\n" + extra_lines +
            "label 1 -1\nnr_sv 1 1\nSV\n"
            "1.0 1:1.0 2:2.0\n-1.0 1:3.0 2:4.0\n"
        )

    def test_proba_without_probb_rejected(self):
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "m.model")
            with open(path, "w") as fh:
                fh.write(self._model_text("probA -3.0\n"))
            with pytest.raises(InvalidFileFormatError, match="probA and probB"):
                p.Model.load(path)

    def test_wrong_prob_count_rejected(self):
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "m.model")
            with open(path, "w") as fh:
                fh.write(self._model_text("probA -3.0 1.0\nprobB 0.1 0.2\n"))
            with pytest.raises(InvalidFileFormatError, match="probA/probB"):
                p.Model.load(path)


class TestCalibrateModelAPI:
    def test_library_level_calibration(self):
        # calibrate an already-fit model through the library API (no SVC)
        X, y = _binary_blobs(n=160, d=5, seed=5)
        ds = p.DataSet(X, y)
        svm = p.CSVM(kernel_type="rbf", gamma=0.2)
        model = svm.fit(ds)
        prob_a, prob_b = calibrate_model(svm, model, ds, random_state=3)
        assert prob_a.shape == (1,) and prob_b.shape == (1,)
        assert model.prob_a is prob_a
        P = predict_probabilities(model, svm.predict_values(model, ds))
        np.testing.assert_allclose(P.sum(axis=1), 1.0)
        assert prob_a[0] < 0  # higher decision value => higher P(+1)

    def test_uncalibrated_predict_probabilities_raises(self):
        X, y = _binary_blobs(n=64)
        ds = p.DataSet(X, y)
        svm = p.CSVM(kernel_type="linear")
        model = svm.fit(ds)
        with pytest.raises(ValueError, match="calibration"):
            predict_probabilities(model, svm.predict_values(model, ds))


class TestDegenerateClasses:
    def test_singleton_class_falls_back_with_warning(self):
        rng = np.random.default_rng(6)
        X = np.concatenate([rng.normal(-1, 1, (40, 4)),
                            rng.normal(1, 1, (40, 4)),
                            rng.normal(5, 1, (1, 4))])  # singleton class
        y = np.array([0] * 40 + [1] * 40 + [2])
        clf = SVC(kernel="rbf", gamma=0.3, probability=True)
        with pytest.warns(UserWarning, match="fewer than 2 samples"):
            clf.fit(X, y)
        P = clf.predict_proba(X)
        assert P.shape == (81, 3)
        np.testing.assert_allclose(P.sum(axis=1), 1.0)


class TestProbabilityOrientationRegressions:
    """Round-8 API review: binary probability columns and sigmoid
    orientation for LOADED models (our writer leads with the +1-mapped
    class, so class_order != sorted after save/load)."""

    def _calibrated(self):
        rng = np.random.default_rng(0)
        n, d = 160, 5
        X = rng.normal(size=(n, d))
        y = np.where(X[:, 0] + 0.2 * rng.normal(size=n) > 0, 1, -1)
        ds = p.DataSet(X, y)
        svm = p.CSVM(
            kernel_type="rbf", gamma=0.3, dtype=np.float64
        )
        model = svm.fit(ds, epsilon=1e-8)
        calibrate_model(svm, model, ds)
        return svm, model, ds, y

    def test_loaded_binary_probabilities_match_in_memory(self, tmp_path):
        """Saved+reloaded binary models must produce the SAME sorted-order
        probability columns (was: columns swapped through the CLI's
        layout-order assumption — argmax accuracy 0.01 vs 0.99)."""
        svm, model, ds, y = self._calibrated()
        P1 = predict_probabilities(model, svm.predict_values(model, ds))
        f = str(tmp_path / "b.model")
        model.save(f)
        loaded = p.Model.load(f)
        assert list(loaded.class_order()) != list(
            loaded.data.different_labels
        )  # the case under test: layout != sorted
        P2 = predict_probabilities(
            loaded, svm.predict_values(loaded, ds)
        )
        np.testing.assert_allclose(P1, P2, atol=1e-9)
        sorted_classes = np.asarray(loaded.data.different_labels)
        pred = sorted_classes[np.argmax(P2, axis=1)].astype(int)
        assert (pred == y).mean() > 0.9

    def test_calibrate_model_orients_to_flipped_models(self, tmp_path):
        """calibrate_model on a LOADED model whose header leads with the
        sorted-low class (decision sign opposite to the mapper) must
        store (A, B) in the model's own orientation (was: B applied with
        the wrong sign — probabilities off by up to 0.11)."""
        svm, model, ds, y = self._calibrated()
        P_native = predict_probabilities(
            model, svm.predict_values(model, ds)
        )
        src = str(tmp_path / "src.model")
        model.save(src)
        lines = open(src).read().splitlines()
        out = []
        nr_sv = None
        for line in lines:
            if line.startswith("label "):
                out.append(
                    "label " + " ".join(line.split()[1:][::-1])
                )
            elif line.startswith("nr_sv "):
                nr_sv = [int(v) for v in line.split()[1:]]
                out.append("nr_sv " + " ".join(line.split()[1:][::-1]))
            elif line.startswith("rho "):
                out.append(
                    "rho " + format(-float(line.split()[1]), ".17g")
                )
            elif line.startswith("probA") or line.startswith("probB"):
                continue  # recalibrated below
            else:
                out.append(line)
        sv_at = out.index("SV")
        header, svs = out[: sv_at + 1], out[sv_at + 1:]
        neg = []
        for r in svs:
            t = r.split()
            t[0] = format(-float(t[0]), ".17g")
            neg.append(" ".join(t))
        flipped_rows = neg[nr_sv[0]:] + neg[: nr_sv[0]]
        fpath = str(tmp_path / "flipped.model")
        open(fpath, "w").write("\n".join(header + flipped_rows) + "\n")
        flipped = p.Model.load(fpath)
        vF = np.asarray(svm.predict_values(flipped, ds))
        vN = np.asarray(svm.predict_values(model, ds))
        np.testing.assert_allclose(vF, -vN, atol=1e-8)  # sign-opposite
        calibrate_model(svm, flipped, ds)
        P_flipped = predict_probabilities(flipped, vF)
        np.testing.assert_allclose(P_flipped, P_native, atol=1e-9)
