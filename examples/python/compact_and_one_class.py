"""Extension-feature tour: compact models + one-class novelty detection.

Run: python examples/python/compact_and_one_class.py
(CPU-friendly sizes; the same code scales to millions of rows on TPU.)
"""

import numpy as np

import plssvm_tpu as p

p.set_verbosity("quiet")
rng = np.random.default_rng(0)

# -- a binary problem ------------------------------------------------------
n, d = 2000, 16
X = rng.normal(size=(n, d))
w = rng.normal(size=d)
y = np.where(X @ w + 0.3 * rng.normal(size=n) > 0, 1, -1)
ds = p.DataSet(X, y, dtype=np.float64)
svm = p.CSVM(backend="xla", dtype=np.float64, kernel_type="rbf", cost=2.0)

# epsilon is the CG's RELATIVE residual stop (reference default 1e-3 can
# stop very early on easy problems); 1e-6 here so the iterative fits are
# fully converged and the comparison with the DIRECT nystroem solve is fair
full = svm.fit(ds, epsilon=1e-6)
print(f"exact fit:      {full.num_support_vectors:5d} SVs, "
      f"train acc {svm.score(full, ds):.3f}")

# -- fixed-size (Nystroem) fit: train on all rows, store only m landmarks --
ny = p.nystroem_fit(svm, ds, n_landmarks=128, random_state=0)
print(f"nystroem m=128: {ny.num_support_vectors:5d} SVs, "
      f"train acc {svm.score(ny, ds):.3f}  (one streamed pass, O(m^2) mem)")

# -- Suykens pruning: exact fit first, then shrink -------------------------
pruned = p.pruned_fit(svm, ds, n_sv=200, epsilon=1e-6)
print(f"pruned to 200:  {pruned.num_support_vectors:5d} SVs, "
      f"train acc {svm.score(pruned, ds):.3f}  (warm-started refits)")

# both are ordinary models: LIBSVM files, predict, warm starts all work
ny.save("/tmp/nystroem_example.model")
reloaded = p.Model.load("/tmp/nystroem_example.model", label_type=int)
assert np.array_equal(svm.predict(reloaded, ds), svm.predict(ny, ds))

# -- one-class novelty detection ------------------------------------------
cloud = rng.normal(size=(1000, 8))
novel = rng.normal(size=(50, 8)) * 6.0
oc = p.OneClassSVM(kernel="rbf", gamma=0.2, nu=0.05, C=10.0).fit(cloud)
print(f"one-class: {np.mean(oc.predict(cloud) == -1):.3f} of training "
      f"flagged (nu=0.05), {np.mean(oc.predict(novel) == -1):.3f} of "
      f"gross novelties caught")
# the library-level API returns a standard model in LIBSVM's one_class
# layout — interoperable with svm-train -s 2 / svm-predict
ocsvm = p.CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
               gamma=0.2, cost=10.0)
oc_model = p.fit_one_class(ocsvm, p.DataSet(cloud), nu=0.05)
oc_model.save("/tmp/one_class_example.model")

# -- round-6 composition: streaming ingest + compact one-class -------------
# fixed-size fits can train STRAIGHT FROM a LIBSVM file in bounded host
# memory (two windowed native-parse passes; files larger than host RAM)
import os
import tempfile

train_file = os.path.join(tempfile.mkdtemp(), "big.libsvm")
from plssvm_tpu.io.libsvm import write_libsvm_file

write_libsvm_file(train_file, X, y)
stream = p.nystroem_fit_from_file(
    svm, train_file, n_landmarks=128, random_state=0, row_block=512
)
print(f"streaming m=128:{stream.num_support_vectors:5d} SVs, "
      f"train acc {svm.score(stream, ds):.3f}  (file-windowed, O(window) host memory)")

# compact one-class: novelty models with m << n support vectors — the
# nu-quantile threshold still covers the FULL training cloud
cloud = rng.normal(size=(1500, 8))
oc_compact, landmarks = p.nystroem_fit_one_class(
    p.CSVM(backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.2,
           cost=10.0),
    p.DataSet(cloud), n_landmarks=96, nu=0.05, return_indices=True,
)
print(f"one-class m=96: {oc_compact.num_support_vectors:5d} SVs, "
      f"outlier fraction "
      f"{float(np.mean(np.asarray(p.CSVM(backend='xla', dtype=np.float64, kernel_type='rbf', gamma=0.2, cost=10.0).predict(oc_compact, p.DataSet(cloud))) == -1)):.3f}"
      f"  (target nu=0.05)")
