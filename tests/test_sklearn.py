"""Tests for the sklearn.svm.SVC-compatible facade.

reference: bindings/Python/sklearn.cpp + examples/python/sklearn_like_svc.py.
"""

import numpy as np
import pytest

from plssvm_tpu import SVC

from conftest import make_blobs


@pytest.fixture
def blobs():
    return make_blobs(200, 8, seed=7)


def test_fit_predict_score(blobs):
    X, y = blobs
    clf = SVC(kernel="rbf", C=2.0, tol=1e-5)
    assert clf.fit(X, y) is clf
    preds = clf.predict(X)
    assert preds.shape == (200,)
    assert set(np.unique(preds)) <= {-1, 1}
    assert clf.score(X, y) >= 0.95


def test_constructor_param_mapping():
    clf = SVC(kernel="poly", degree=4, gamma=0.5, coef0=1.5, C=3.0, max_iter=100)
    params = clf.get_params()
    # raw user value, verbatim (sklearn's clone contract); the canonical
    # name lives on the underlying CSVM parameter
    assert params["kernel"] == "poly"
    assert str(clf._svm.get_params().kernel_type.value) == "polynomial"
    assert params["degree"] == 4
    assert params["gamma"] == 0.5
    assert params["coef0"] == 1.5
    assert params["C"] == 3.0
    assert params["max_iter"] == 100


def test_default_get_params():
    params = SVC().get_params()
    assert params["C"] == 1.0
    assert params["kernel"] == "linear"
    assert params["tol"] == 1e-3
    assert params["max_iter"] == -1


def test_set_params_returns_self():
    clf = SVC()
    assert clf.set_params(C=5.0) is clf
    assert clf.get_params()["C"] == 5.0


@pytest.mark.parametrize(
    "param",
    ["shrinking", "cache_size", "break_ties"],
)
def test_unimplemented_constructor_params_raise(param):
    # reference raises AttributeError for these (sklearn.cpp:74-110);
    # probability, random_state and decision_function_shape ARE
    # implemented here (Platt scaling / OAO support)
    with pytest.raises(AttributeError, match="not implemented"):
        SVC(**{param: 1})


def test_invalid_decision_function_shape_raises():
    with pytest.raises(AttributeError, match="ovr"):
        SVC(decision_function_shape="bogus")


def test_unknown_param_raises():
    with pytest.raises(AttributeError, match="Invalid parameter"):
        SVC(foobar=1)


def test_sample_weight_implemented(blobs):
    """sample_weight IS implemented (weighted LS-SVM — the reference
    raises): all-ones weights are a no-op, heavier weights tilt the fit."""
    X, y = blobs
    base = SVC(kernel="rbf", tol=1e-8).fit(X, y)
    ones = SVC(kernel="rbf", tol=1e-8).fit(X, y, sample_weight=np.ones(len(y)))
    np.testing.assert_allclose(
        ones.dual_coef_, base.dual_coef_, rtol=1e-9
    )
    weighted = SVC(kernel="rbf", tol=1e-8).fit(
        X, y, sample_weight=np.linspace(0.5, 2.0, len(y))
    )
    assert not np.allclose(weighted.dual_coef_, base.dual_coef_)


def test_class_weight_balanced(blobs):
    X, y = blobs
    # imbalance the data: drop most of one class
    keep = np.concatenate(
        [np.flatnonzero(y == -1)[:20], np.flatnonzero(y == 1)]
    )
    Xi, yi = X[keep], y[keep]
    clf = SVC(kernel="rbf", class_weight="balanced", tol=1e-8).fit(Xi, yi)
    counts = np.asarray([np.sum(yi == c) for c in clf.classes_])
    np.testing.assert_allclose(
        clf.class_weight_, len(yi) / (2 * counts)
    )
    assert clf.score(Xi, yi) >= 0.9
    # dict weights round-trip through class_weight_
    clf2 = SVC(kernel="rbf", class_weight={-1: 4.0, 1: 1.0}, tol=1e-8)
    clf2.fit(Xi, yi)
    np.testing.assert_allclose(clf2.class_weight_, [4.0, 1.0])


def test_not_fitted_raises(blobs):
    X, y = blobs
    clf = SVC()
    with pytest.raises(AttributeError, match="not fitted"):
        clf.predict(X)
    with pytest.raises(AttributeError, match="not fitted"):
        clf.score(X, y)
    with pytest.raises(AttributeError, match="not fitted"):
        _ = clf.classes_


def test_fitted_attributes(blobs):
    X, y = blobs
    clf = SVC(kernel="rbf").fit(X, y)
    np.testing.assert_array_equal(clf.classes_, [-1, 1])
    assert clf.fit_status_ == 0
    assert clf.n_features_in_ == 8
    np.testing.assert_array_equal(clf.support_, np.arange(200))
    assert clf.support_vectors_.shape == (200, 8)
    assert clf.n_support_.sum() <= 200
    assert clf.shape_fit_ == (200, 8)
    assert clf.dual_coef_.shape == (1, 200)
    assert clf.intercept_.shape == (1,)
    assert int(clf.n_iter_[0]) >= 1


def test_decision_function_consistent_with_predict(blobs):
    X, y = blobs
    clf = SVC(kernel="rbf").fit(X, y)
    vals = clf.decision_function(X)
    preds = clf.predict(X)
    np.testing.assert_array_equal(np.where(vals > 0, 1, -1), preds)


def test_probability_methods_raise_without_probability(blobs):
    # without probability=True the methods raise, like sklearn
    X, y = blobs
    clf = SVC().fit(X, y)
    with pytest.raises(AttributeError, match="probability"):
        clf.predict_proba(X)
    with pytest.raises(AttributeError, match="probability"):
        clf.predict_log_proba(X)
    for attr in ("probA_", "probB_"):
        with pytest.raises(AttributeError):
            getattr(clf, attr)
    # class_weight_ is implemented now (weighted LS-SVM); defaults to ones
    np.testing.assert_array_equal(clf.class_weight_, [1.0, 1.0])
    # coef_ is implemented for linear kernels (capability exceeded — the
    # reference raises); non-linear kernels raise sklearn's own message
    with pytest.raises(AttributeError, match="linear"):
        SVC(kernel="rbf").fit(X, y).coef_
    w = clf.coef_  # default kernel is linear
    assert w.shape == (1, X.shape[1])
    np.testing.assert_allclose(
        X @ w[0] + clf.intercept_[0], clf.decision_function(X), rtol=1e-8
    )


def test_string_labels():
    X, _ = make_blobs(60, 4, seed=9)
    y = np.asarray(["cat"] * 30 + ["dog"] * 30, dtype=object)
    clf = SVC(kernel="linear").fit(X, y)
    preds = clf.predict(X)
    assert set(preds) <= {"cat", "dog"}


def test_gamma_scale(blobs):
    """sklearn's gamma='scale' = 1/(n_features * X.var()), resolved at fit
    (implemented here; the reference raises AttributeError for it)."""
    X, y = blobs
    clf = SVC(kernel="rbf", gamma="scale", tol=1e-6).fit(X, y)
    expected = 1.0 / (X.shape[1] * X.var())
    # get_params returns the user's 'scale' VERBATIM (sklearn clone
    # contract); the resolved value lives on the underlying CSVM
    assert clf.get_params()["gamma"] == "scale"
    assert clf._svm.get_params().gamma.value == pytest.approx(expected)
    assert clf.score(X, y) >= 0.95
    # matches an explicit-gamma fit exactly
    ref = SVC(kernel="rbf", gamma=expected, tol=1e-6).fit(X, y)
    np.testing.assert_array_equal(clf.dual_coef_, ref.dual_coef_)


def test_gamma_auto_still_default(blobs):
    X, y = blobs
    clf = SVC(kernel="rbf", gamma="auto", tol=1e-6).fit(X, y)
    assert clf.score(X, y) >= 0.9


# ---------------------------------------------------------------------------
# compact-model kwargs: max_sv / n_landmarks (EXTENSION — plssvm_tpu.sparse;
# the reference's sklearn binding has no compact fits, sklearn.cpp:51-110)
# ---------------------------------------------------------------------------


def test_svc_max_sv_compact_fit(blobs):
    X, y = blobs
    clf = SVC(kernel="rbf", C=2.0, max_sv=24, dtype=np.float64)
    clf.fit(X, y)
    assert clf.support_vectors_.shape[0] == 24
    assert clf.support_.shape == (24,)
    # support_ indexes the TRAINING rows of the surviving SVs
    np.testing.assert_allclose(X[clf.support_], clf.support_vectors_)
    assert clf.n_support_.sum() <= 24
    assert clf.score(X, y) >= 0.9


def test_svc_n_landmarks_compact_fit(blobs):
    X, y = blobs
    clf = SVC(kernel="rbf", C=2.0, n_landmarks=32, random_state=0,
              dtype=np.float64)
    clf.fit(X, y)
    assert clf.support_vectors_.shape[0] == 32
    np.testing.assert_allclose(X[clf.support_], clf.support_vectors_)
    assert clf.score(X, y) >= 0.9
    # direct solve: n_iter_ reports 0 CG iterations
    np.testing.assert_array_equal(clf.n_iter_, [0])


def test_svc_compact_kwargs_conflicts(blobs):
    X, y = blobs
    with pytest.raises(AttributeError, match="mutually exclusive"):
        SVC(max_sv=8, n_landmarks=8).fit(X, y)
    with pytest.raises(AttributeError, match="compact-model"):
        SVC(n_landmarks=8, classification="oao").fit(
            X, np.where(y > 0, y, 2 + (np.arange(len(y)) % 2))
        )


def test_svc_compact_probability_composition(blobs):
    """probability=True composes with compact fits (round 6): the Platt
    sigmoid is fitted on COMPACT CV folds, so it reflects the deployed
    compact model's decision distribution."""
    X, y = blobs
    clf = SVC(kernel="rbf", C=2.0, n_landmarks=32, probability=True,
              random_state=0, dtype=np.float64)
    clf.fit(X, y)
    proba = clf.predict_proba(X)
    assert proba.shape == (len(y), 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-9)
    idx = (y > 0).astype(int)
    assert float(proba[np.arange(len(y)), idx].mean()) > 0.8
    assert clf.probA_.shape == (1,)

    clf2 = SVC(kernel="rbf", C=2.0, max_sv=48, probability=True,
               dtype=np.float64)
    clf2.fit(X, y)
    proba2 = clf2.predict_proba(X)
    assert float(proba2[np.arange(len(y)), idx].mean()) > 0.8


def test_svc_compact_kwargs_clone_contract():
    from sklearn.base import clone

    clf = SVC(kernel="rbf", max_sv=16)
    params = clf.get_params()
    assert params["max_sv"] == 16
    assert params["n_landmarks"] is None
    cloned = clone(clf)
    assert cloned.get_params()["max_sv"] == 16
    clf2 = SVC(n_landmarks=12)
    assert clone(clf2).get_params()["n_landmarks"] == 12


def test_gridsearchcv_sweeps_compact_kwargs(blobs):
    """GridSearchCV can sweep the compact-model sizes (VERDICT r3 item 5)."""
    from sklearn.model_selection import GridSearchCV

    X, y = blobs
    gs = GridSearchCV(
        SVC(kernel="rbf", C=2.0, dtype=np.float64, random_state=0),
        {"n_landmarks": [8, 32]},
        cv=2, n_jobs=1,
    )
    gs.fit(X, y)
    assert gs.best_score_ >= 0.85
    assert gs.best_params_["n_landmarks"] in (8, 32)

    gs2 = GridSearchCV(
        SVC(kernel="rbf", C=2.0, dtype=np.float64),
        {"max_sv": [16, 48]},
        cv=2, n_jobs=1,
    )
    gs2.fit(X, y)
    assert gs2.best_score_ >= 0.85
    assert gs2.best_params_["max_sv"] in (16, 48)


def test_svr_compact_kwargs():
    from plssvm_tpu import SVR

    rng = np.random.default_rng(11)
    X = rng.normal(size=(120, 4))
    y = X @ rng.normal(size=4) + 0.05 * rng.normal(size=120)
    reg = SVR(kernel="rbf", gamma=0.3, C=10.0, n_landmarks=24,
              random_state=0)
    reg.fit(X, y)
    assert reg.support_vectors_.shape[0] == 24
    np.testing.assert_allclose(X[reg.support_], reg.support_vectors_)
    assert reg.score(X, y) >= 0.8

    reg2 = SVR(kernel="rbf", gamma=0.3, C=10.0, max_sv=30)
    reg2.fit(X, y)
    assert reg2.support_vectors_.shape[0] == 30
    assert reg2.score(X, y) >= 0.8
    with pytest.raises(AttributeError, match="mutually exclusive"):
        SVR(max_sv=8, n_landmarks=8).fit(X, y)


def test_zero_weight_exclusion_preserves_caller_indexing():
    """support_ and shape_fit_ index the CALLER's X even when zero-weight
    rows are excluded (sklearn semantics — review finding, round 6)."""
    rng = np.random.default_rng(80)
    X = rng.normal(size=(40, 4))
    y = np.where(X[:, 0] > 0, 1, -1)
    sw = np.ones(40)
    sw[[0, 7, 20]] = 0.0
    clf = SVC(kernel="rbf", C=2.0, dtype=np.float64)
    clf.fit(X, y, sample_weight=sw)
    assert clf.shape_fit_ == (40, 4)
    sup = clf.support_
    # dropped rows are never SVs; all other rows are (exact LS-SVM)
    assert set(sup) == set(range(40)) - {0, 7, 20}
    np.testing.assert_allclose(X[sup], clf.support_vectors_)

    # compact fit: landmark indices map through the exclusion too
    clf2 = SVC(kernel="rbf", C=2.0, n_landmarks=10, random_state=0,
               dtype=np.float64)
    clf2.fit(X, y, sample_weight=sw)
    assert not ({0, 7, 20} & set(clf2.support_))
    np.testing.assert_allclose(X[clf2.support_], clf2.support_vectors_)


def test_compact_probability_tiny_folds_no_crash():
    """Pruned calibration on folds too small to prune falls back to the
    exact fold fit instead of violating pruned_fit's n_sv < n bound."""
    rng = np.random.default_rng(81)
    X = rng.normal(size=(8, 3))
    y = np.array([1, -1, 1, -1, 1, -1, 1, -1])
    clf = SVC(kernel="rbf", C=2.0, max_sv=4, probability=True,
              dtype=np.float64)
    clf.fit(X, y)  # 5-fold on 8 points -> tiny folds; must not raise
    proba = clf.predict_proba(X)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-9)


def test_set_params_gamma_auto_resets_numeric():
    """set_params(gamma='auto'|'scale') must clear a previously-set
    numeric (or fit-resolved 'scale') gamma — the old value silently won
    while get_params reported the new mode (GridSearchCV over
    [2.5, 'auto'] evaluated 2.5 twice)."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 4))
    y = np.where(X[:, 0] > 0, 1, -1)

    clf = SVC(gamma=2.5)
    clf.set_params(gamma="auto")
    clf.fit(X, y)
    assert clf._svm.params.resolved_gamma(4) == pytest.approx(0.25)

    # 'scale' resolved at fit time must not leak into a later 'auto' fit
    clf2 = SVC(gamma="scale")
    clf2.fit(X, y)
    clf2.set_params(gamma="auto")
    clf2.fit(X, y)
    assert clf2._svm.params.resolved_gamma(4) == pytest.approx(0.25)
