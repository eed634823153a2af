"""Tour of the round-3 extensions: one-vs-one multiclass and solver types.

- ``classification='oao'`` trains the C(C-1)/2 pairwise machines and stores
  them in the STANDARD LIBSVM multiclass model layout, so the model file
  round-trips with LIBSVM's own svm-train/svm-predict.
- ``solver='cg_explicit'`` materializes the kernel matrix once on device and
  iterates with O(n^2) HBM-bound matvecs — faster for wide feature axes and
  dramatically faster for the laplacian/chi-squared distance kernels;
  ``'automatic'`` (the default) picks per fit.

Run: python examples/python/oao_and_solvers.py
"""

import tempfile

import numpy as np

import plssvm_tpu as p


def make_blobs(n_per=40, d=6, n_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    centers = 4.0 * rng.normal(size=(n_classes, d))
    X = np.concatenate(
        [centers[c] + 0.6 * rng.normal(size=(n_per, d)) for c in range(n_classes)]
    )
    y = np.repeat(np.arange(n_classes), n_per)
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


def main():
    p.set_verbosity(p.VerbosityLevel.QUIET)
    X, y = make_blobs()
    ds = p.DataSet(X, y)

    # ---- one-vs-one multiclass ------------------------------------------
    svm = p.CSVM(kernel_type="rbf", gamma=0.2, dtype=np.float64,
                 target="cpu")
    oao_model = svm.fit(ds, classification="oao")
    print(f"OAO: {oao_model.num_classes} classes -> "
          f"{np.asarray(oao_model.rho).size} pair machines, "
          f"sv_coef {np.asarray(oao_model.alpha).shape}, "
          f"accuracy {svm.score(oao_model):.3f}")

    # the model file is standard LIBSVM multiclass format
    with tempfile.NamedTemporaryFile(suffix=".model", delete=False) as fh:
        path = fh.name
    oao_model.save(path)
    loaded = p.Model.load(path, label_type=int)
    assert loaded.classification == p.ClassificationType.OAO
    print("model file header:",
          [l for l in open(path).read().splitlines()[:9] if " " in l][3:7])

    # pairwise-coupled probabilities (the LIBSVM -b 1 pipeline)
    clf = p.SVC(kernel="rbf", gamma=0.2, classification="oao",
                probability=True, random_state=0)
    clf.fit(X, y)
    proba = clf.predict_proba(X[:3])
    print("predict_proba rows (sum to 1):", np.round(proba, 3).tolist())

    # ---- solver types -----------------------------------------------------
    for solver in ("cg_implicit", "cg_explicit"):
        svm = p.CSVM(kernel_type="laplacian", gamma=0.1, dtype=np.float64,
                     target="cpu", solver=solver)
        model = svm.fit(ds, epsilon=1e-8)
        print(f"{solver}: laplacian fit, {model.n_iter} CG iterations, "
              f"accuracy {svm.score(model):.3f}")

    # ---- least-squares regression (LS-SVR) --------------------------------
    rng = np.random.default_rng(1)
    Xr = rng.normal(size=(150, 4))
    yr = np.sin(Xr[:, 0]) + 0.5 * Xr[:, 1] + 0.05 * rng.normal(size=150)
    reg = p.SVR(kernel="rbf", gamma=0.5, C=100.0, tol=1e-8)
    reg.fit(Xr, yr)
    print(f"LS-SVR: R^2 = {reg.score(Xr, yr):.4f} "
          f"({reg.n_iter_[0]} CG iterations; model files use LIBSVM's "
          "epsilon_svr layout)")


if __name__ == "__main__":
    main()
