"""Extension-feature tour: the three extra kernels + probability outputs.

Both are capabilities beyond the bundled reference snapshot: the kernels
match upstream PLSSVM v3's kernel set, and probability calibration
(Platt scaling, plssvm_tpu.probability) is rejected by the reference's
sklearn binding entirely.
"""

import numpy as np

import plssvm_tpu as plssvm
from plssvm_tpu.probability import calibrate_model, predict_probabilities

rng = np.random.default_rng(0)
n, d = 2**8, 2**5
half = n // 2
samples = np.abs(np.concatenate([   # non-negative: chi-squared needs it
    rng.normal(-1.0, 1.0, size=(half, d)),
    rng.normal(+1.0, 1.0, size=(n - half, d)),
]))
samples[half:] += 1.5
labels = np.concatenate([-np.ones(half), np.ones(n - half)])

# --- the extension kernels, through the sklearn facade -------------------
for kernel in ("sigmoid", "laplacian", "chi_squared"):
    kwargs = {"gamma": 0.02, "coef0": 0.0} if kernel == "sigmoid" else {"gamma": 0.1}
    svc = plssvm.SVC(kernel=kernel, C=1.0, tol=1e-6, **kwargs)
    svc.fit(samples, labels)
    print(f"{kernel:>12s} accuracy: {svc.score(samples, labels) * 100:.2f}%")

# --- probability outputs (Platt scaling on 5-fold CV decision values) ----
svc = plssvm.SVC(kernel="rbf", gamma=0.05, probability=True, random_state=0)
svc.fit(samples, labels)
proba = svc.predict_proba(samples[:5])
print("classes:", svc.classes_)
print("first five P(class | x):")
print(np.array_str(proba, precision=3))
print("probA =", svc.probA_, " probB =", svc.probB_)

# --- the same calibration through the core library API -------------------
data = plssvm.DataSet(samples, labels)
svm = plssvm.CSVM(kernel_type="rbf", gamma=0.05)
model = svm.fit(data)
calibrate_model(svm, model, data, random_state=0)
import os
import tempfile

_model_path = os.path.join(tempfile.mkdtemp(), "calibrated.model")
model.save(_model_path)                  # probA/probB ride the model file
reloaded = plssvm.Model.load(_model_path)
P = predict_probabilities(reloaded, svm.predict_values(reloaded, data))
print("reloaded-model mean P(+1) on the +1 class: "
      f"{P[labels == 1, 1].mean():.3f}")
