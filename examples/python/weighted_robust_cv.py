"""Tour of the weighted / robust / cross-validation extensions.

- ``fit(sample_weight=)`` / ``SVC(class_weight=...)``: Suykens' weighted
  LS-SVM (per-point regularizers 1/(C s_i)) — class imbalance, LIBSVM -wi.
- ``robust.reweighted_fit``: iteratively reweighted LS-SVR; gross outliers
  get Hampel-floored weights and barely move the fit.
- ``probability.cross_validate``: svm-train's -v mode as a library call.

Run: python examples/python/weighted_robust_cv.py
"""

import numpy as np

import plssvm_tpu as p
from plssvm_tpu.probability import cross_validate
from plssvm_tpu.robust import reweighted_fit


def main():
    p.set_verbosity(p.VerbosityLevel.QUIET)
    rng = np.random.default_rng(0)

    # ---- class imbalance: 'balanced' weights lift minority recall ---------
    X = rng.normal(size=(300, 5))
    y = np.where(rng.random(300) > 0.9, 1, -1)  # ~10% minority
    X[y > 0] += 1.2
    plain = p.SVC(kernel="rbf", tol=1e-6, dtype=np.float64).fit(X, y)
    balanced = p.SVC(
        kernel="rbf", tol=1e-6, class_weight="balanced", dtype=np.float64
    ).fit(X, y)
    rec = lambda clf: float(np.mean(clf.predict(X[y > 0]) == 1))
    print(f"minority recall: plain {rec(plain):.2f} -> "
          f"balanced {rec(balanced):.2f} "
          f"(class_weight_ = {np.round(balanced.class_weight_, 2).tolist()})")

    # ---- robust regression under gross outliers ---------------------------
    Xr = np.sort(rng.uniform(-3, 3, size=(150, 1)), axis=0)
    clean = np.sin(Xr[:, 0])
    yr = clean + 0.05 * rng.normal(size=150)
    yr[::15] += 6.0  # 10 gross outliers
    svm = p.CSVM(kernel_type="rbf", gamma=2.0, cost=50.0, dtype=np.float64,
                 target="cpu")
    ds = p.DataSet(Xr, yr, regression=True)
    plain_m = svm.fit(ds, epsilon=1e-8)
    robust_m = reweighted_fit(svm, ds, iterations=2, epsilon=1e-8)
    pts = p.DataSet(Xr)
    mse = lambda m: float(np.mean((svm.predict(m, pts) - clean) ** 2))
    print(f"outlier-contaminated LS-SVR MSE vs truth: plain {mse(plain_m):.4f}"
          f" -> robust {mse(robust_m):.4f}")

    # ---- cross-validation (svm-train -v) -----------------------------------
    svm_cv = p.CSVM(kernel_type="rbf", dtype=np.float64, target="cpu")
    result = cross_validate(
        svm_cv, p.DataSet(X, y), n_folds=5, random_state=0
    )
    print(f"5-fold CV accuracy: {result['accuracy'] * 100:.1f}%")


if __name__ == "__main__":
    main()
