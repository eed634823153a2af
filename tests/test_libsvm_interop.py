"""Gold-standard LIBSVM interop: models trained by the REAL libsvm.

sklearn.svm.SVC wraps libsvm itself; its fitted attributes (support
vectors, dual_coef_, intercept_, probA_/probB_) are libsvm's model arrays
in the standard one-vs-one layout.  These tests serialize a fitted sklearn
SVC into a LIBSVM model file, load it with plssvm_tpu, and require:

- decision values == sklearn's decision_function(ovo) to f64 precision
  (same kernel math, same machine enumeration, same rho signs),
- predicted labels == sklearn's predict (same voting + tie-break),
- predict_proba == sklearn's (same per-pair sigmoids + the same
  Wu/Lin/Weng pairwise coupling libsvm runs).

This pins the OAO machinery against the actual libsvm implementation, not
just against this repo's own reading of the format.
"""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from sklearn import svm as sk_svm

# sklearn 1.9 deprecates SVC(probability=True)/probA_/probB_ — this suite
# uses them deliberately to extract libsvm's raw model arrays
pytestmark = pytest.mark.filterwarnings(
    "ignore:.*deprecated.*:FutureWarning"
)

from plssvm_tpu import CSVM, ClassificationType, DataSet, Model
from plssvm_tpu.probability import predict_probabilities


def _blobs(n_per=30, d=4, n_classes=3, seed=0, labels=None):
    rng = np.random.default_rng(seed)
    centers = 5.0 * rng.normal(size=(n_classes, d))
    X = np.concatenate(
        [centers[c] + 0.8 * rng.normal(size=(n_per, d)) for c in range(n_classes)]
    )
    lab = labels if labels is not None else list(range(n_classes))
    y = np.concatenate([[lab[c]] * n_per for c in range(n_classes)])
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


def write_sklearn_svc_model(clf, path, kernel, gamma, coef0=0.0, degree=3):
    """Serialize a fitted sklearn SVC into a LIBSVM model file.

    sklearn keeps libsvm's arrays verbatim: support vectors grouped by class
    in ``classes_`` order (``n_support_`` per class), ``dual_coef_`` the
    (C-1, n_SV) sv_coef block, ``intercept_ = -rho`` in libsvm pair order.
    """
    classes = clf.classes_
    n_support = clf.n_support_
    sv = clf.support_vectors_
    sv_coef = clf.dual_coef_  # (C-1, n_SV)
    rho = -clf.intercept_
    if len(classes) == 2:
        # a FAITHFUL libsvm binary file obeys f > 0 -> label[0]
        # (svm.cpp svm_predict).  sklearn sign-normalizes its binary
        # arrays so positive decision values mean classes_[1], so the
        # equivalent libsvm model has label[0] = classes_[1] — reorder
        # the header, nr_sv and the class-grouped SV block accordingly
        # (an earlier revision of this helper wrote the sorted header
        # with the positive-means-classes_[1] values, i.e. a file real
        # libsvm would read with every prediction inverted)
        n0 = int(clf.n_support_[0])
        perm = np.concatenate(
            [np.arange(n0, sv.shape[0]), np.arange(n0)]
        )
        classes = classes[[1, 0]]
        n_support = n_support[[1, 0]]
        sv = sv[perm]
        sv_coef = sv_coef[:, perm]
    lines = ["svm_type c_svc", f"kernel_type {kernel}"]
    if kernel == "polynomial":
        lines += [f"degree {degree}", f"gamma {gamma!r}", f"coef0 {coef0!r}"]
    elif kernel == "rbf":
        lines += [f"gamma {gamma!r}"]
    lines += [
        f"nr_class {len(classes)}",
        "label " + " ".join(str(int(c)) for c in classes),
        f"total_sv {sv.shape[0]}",
        "nr_sv " + " ".join(str(int(n)) for n in n_support),
        "rho " + " ".join(repr(float(r)) for r in np.atleast_1d(rho)),
    ]
    # sklearn 1.9 deprecates `probability` (the attribute holds the string
    # "deprecated"!) — detect calibration by a non-empty probA_ instead
    try:
        prob_a, prob_b = np.asarray(clf.probA_), np.asarray(clf.probB_)
    except AttributeError:
        prob_a = prob_b = np.empty(0)
    if prob_a.size:
        lines.append("probA " + " ".join(repr(float(v)) for v in prob_a))
        lines.append("probB " + " ".join(repr(float(v)) for v in prob_b))
    lines.append("SV")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
        for p in range(sv.shape[0]):
            coeffs = " ".join(repr(float(c)) for c in sv_coef[:, p])
            feats = " ".join(
                f"{j + 1}:{sv[p, j]:.16e}" for j in range(sv.shape[1])
            )
            fh.write(f"{coeffs} {feats}\n")


@pytest.mark.parametrize("kernel,sk_kernel", [("rbf", "rbf"), ("linear", "linear")])
def test_decision_values_match_real_libsvm(tmp_path, kernel, sk_kernel):
    X, y = _blobs(n_classes=3, seed=1)
    gamma = 0.3
    clf = sk_svm.SVC(
        kernel=sk_kernel, gamma=gamma, C=10.0,
        decision_function_shape="ovo",
    )
    clf.fit(X, y)
    path = str(tmp_path / f"sk_{kernel}.model")
    write_sklearn_svc_model(clf, path, kernel, gamma)

    model = Model.load(path, label_type=int)
    assert model.classification == ClassificationType.OAO
    plssvm = CSVM(backend="xla", dtype=np.float64, kernel_type=kernel)
    pts = DataSet(X[:25])
    ours = plssvm.predict_values(model, pts)
    theirs = clf.decision_function(X[:25])
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(
        plssvm.predict(model, pts), clf.predict(X[:25])
    )


def test_four_class_unsorted_labels_match_real_libsvm(tmp_path):
    # non-contiguous, non-zero-based labels; libsvm still sorts them in
    # classes_, and the machine layout must line up machine for machine
    X, y = _blobs(n_per=25, d=5, n_classes=4, seed=2, labels=[7, 2, 9, 5])
    gamma = 0.25
    clf = sk_svm.SVC(kernel="rbf", gamma=gamma, C=5.0,
                     decision_function_shape="ovo")
    clf.fit(X, y)
    path = str(tmp_path / "sk4.model")
    write_sklearn_svc_model(clf, path, "rbf", gamma)

    model = Model.load(path, label_type=int)
    assert np.asarray(model.alpha).shape[1] == 3
    assert np.asarray(model.rho).size == 6
    plssvm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    pts = DataSet(X[:40])
    np.testing.assert_allclose(
        plssvm.predict_values(model, pts),
        clf.decision_function(X[:40]),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_array_equal(
        plssvm.predict(model, pts), clf.predict(X[:40])
    )


def test_binary_model_matches_real_libsvm(tmp_path):
    """Binary sklearn/libsvm models load and predict identically.

    sklearn sign-normalizes libsvm's binary outputs so that positive
    decision values mean ``classes_[1]`` — which coincides with this
    framework's (and the PLSSVM reference's) sorted {-1,+1} mapping.
    """
    X, y = _blobs(n_per=40, d=4, n_classes=2, seed=5, labels=[3, 8])
    gamma = 0.3
    clf = sk_svm.SVC(kernel="rbf", gamma=gamma, C=10.0)
    clf.fit(X, y)
    path = str(tmp_path / "sk_bin.model")
    write_sklearn_svc_model(clf, path, "rbf", gamma)

    model = Model.load(path, label_type=int)
    assert np.asarray(model.alpha).ndim == 1
    plssvm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    pts = DataSet(X[:30])
    np.testing.assert_allclose(
        plssvm.predict_values(model, pts),
        clf.decision_function(X[:30]),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_array_equal(
        plssvm.predict(model, pts), clf.predict(X[:30])
    )


def test_predict_proba_matches_real_libsvm(tmp_path):
    X, y = _blobs(n_per=40, d=4, n_classes=3, seed=3)
    gamma = 0.3
    clf = sk_svm.SVC(
        kernel="rbf", gamma=gamma, C=10.0, probability=True, random_state=0,
    )
    clf.fit(X, y)
    path = str(tmp_path / "sk_prob.model")
    write_sklearn_svc_model(clf, path, "rbf", gamma)

    model = Model.load(path, label_type=int)
    assert model.prob_a is not None and model.prob_a.size == 3
    plssvm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    values = plssvm.predict_values(model, DataSet(X[:30]))
    ours = predict_probabilities(model, values)
    theirs = clf.predict_proba(X[:30])
    # the pairwise coupling STOPS within eps = 0.005/C of the fixpoint
    # (libsvm's multiclass_probability tolerance), per sample in libsvm vs
    # jointly here — so individual probabilities agree to that tolerance,
    # not to float precision
    np.testing.assert_allclose(ours, theirs, atol=2e-3)
    np.testing.assert_array_equal(
        np.argmax(ours, axis=1), np.argmax(theirs, axis=1)
    )


def test_gridsearchcv_over_svc():
    """Our SVC composes with sklearn's model selection (clone/get_params)."""
    from sklearn.model_selection import GridSearchCV

    from plssvm_tpu import SVC

    X, y = _blobs(n_per=20, d=3, n_classes=2, seed=4)
    gs = GridSearchCV(
        SVC(kernel="rbf", dtype=np.float64),
        {"C": [0.5, 5.0], "gamma": [0.1, 0.5]},
        cv=3, n_jobs=1,
    )
    gs.fit(X, y)
    assert gs.best_score_ >= 0.9
    assert set(gs.best_params_) == {"C", "gamma"}


def test_binary_flipped_appearance_order_header(tmp_path):
    """svm-train writes the label header in APPEARANCE order with
    f > 0 meaning label[0] — a binary file whose first-seen class sorts
    LOW previously loaded with every prediction inverted (round-6 review
    finding; the loader ignored the binary header order)."""
    X, y = _blobs(n_per=30, d=3, n_classes=2, seed=9)
    clf = sk_svm.SVC(kernel="rbf", gamma=0.4, C=5.0).fit(X, y)
    # craft the file svm-train would write when class -1 is seen FIRST:
    # label[0] = -1, f_file > 0 -> -1, i.e. f_file = -f_sklearn
    path = str(tmp_path / "flipped.model")
    n1 = int(clf.n_support_[1])
    lines = [
        "svm_type c_svc", "kernel_type rbf", "gamma 0.4", "nr_class 2",
        f"total_sv {clf.support_vectors_.shape[0]}",
        f"rho {float(clf.intercept_[0]):.17g}",
        f"label {int(clf.classes_[0])} {int(clf.classes_[1])}",
        f"nr_sv {int(clf.n_support_[0])} {int(clf.n_support_[1])}", "SV",
    ]
    for coef, sv in zip(-clf.dual_coef_[0], clf.support_vectors_):
        feats = " ".join(f"{j + 1}:{v:.17g}" for j, v in enumerate(sv))
        lines.append(f"{coef:.17g} {feats}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    model = Model.load(path, label_type=int)
    assert model.label_order == [int(clf.classes_[0]), int(clf.classes_[1])]
    plssvm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    pts = DataSet(X)
    # decision values are the NEGATED sklearn ones...
    np.testing.assert_allclose(
        plssvm.predict_values(model, pts), -clf.decision_function(X),
        rtol=1e-9, atol=1e-12,
    )
    # ...but predictions must MATCH (f > 0 -> label[0])
    np.testing.assert_array_equal(plssvm.predict(model, pts), clf.predict(X))
    # re-saving keeps the file's order, so the round trip stays faithful
    path2 = str(tmp_path / "flipped_resaved.model")
    model.save(path2)
    reloaded = Model.load(path2, label_type=int)
    np.testing.assert_array_equal(
        plssvm.predict(reloaded, pts), clf.predict(X)
    )


def test_binary_writer_emits_positive_class_first(tmp_path):
    """Our writer emits the +1-mapped class FIRST in the binary header —
    the reference's own fixture convention ('label 1 -1') and the order
    svm-predict needs for f > 0 -> label[0] to hold on our files."""
    X, y = _blobs(n_per=25, d=3, n_classes=2, seed=10)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
               gamma=0.3)
    model = svm.fit(DataSet(X, y, dtype=np.float64))
    path = str(tmp_path / "ours.model")
    model.save(path)
    hdr = [l for l in open(path) if l.startswith("label")][0].split()
    # sorted labels are [0, 1]; the +1-mapped (f>0) class sorts LAST but
    # must be written FIRST
    assert hdr[1:] == ["1", "0"]
    # the round trip predicts identically
    reloaded = Model.load(path, label_type=int)
    ds = DataSet(X, dtype=np.float64)
    np.testing.assert_array_equal(
        svm.predict(reloaded, ds), svm.predict(model, ds)
    )


def test_binary_predict_proba_matches_real_libsvm(tmp_path):
    """Binary probability: the probA/probB sigmoid is defined against the
    FILE's decision orientation (f > 0 -> label[0]); our loader must emit
    sklearn-identical sorted-order probability columns either way."""
    X, y = _blobs(n_per=40, d=4, n_classes=2, seed=21, labels=[2, 7])
    gamma = 0.3
    clf = sk_svm.SVC(
        kernel="rbf", gamma=gamma, C=10.0, probability=True,
        random_state=0,
    ).fit(X, y)
    path = str(tmp_path / "sk_bin_prob.model")
    write_sklearn_svc_model(clf, path, "rbf", gamma)

    model = Model.load(path, label_type=int)
    assert model.prob_a is not None and model.prob_a.size == 1
    plssvm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    values = plssvm.predict_values(model, DataSet(X[:30]))
    ours = predict_probabilities(model, values)
    theirs = clf.predict_proba(X[:30])  # columns in classes_ (sorted) order
    # libsvm runs multiclass_probability even for k = 2; its fixpoint IS
    # the raw sigmoid (which we evaluate exactly) but the iteration stops
    # within eps = 0.005/2 of it — so agreement is to that tolerance
    np.testing.assert_allclose(ours, theirs, atol=2e-3)
    np.testing.assert_array_equal(
        np.argmax(ours, axis=1), np.argmax(theirs, axis=1)
    )
    # orientation (not just magnitude): the positive-class column tracks
    # positive decision values exactly
    pos_col = list(np.sort(np.unique(y))).index(model.label_order[0])
    assert bool(np.all((ours[:, pos_col] > 0.5) == (values > 0)))
