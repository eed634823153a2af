"""Extension showcase: multiclass one-vs-all training + resumable fits.

The reference library is binary-only (data_set.hpp:443 rejects > 2 labels)
and cannot resume an interrupted training run; both are extensions here.
Run: python examples/python/multiclass_and_scale.py
"""

import numpy as np

import plssvm_tpu as plssvm

rng = np.random.default_rng(0)

# a 4-class blob problem
centers = rng.normal(scale=5.0, size=(4, 16))
cls = rng.integers(0, 4, size=2000)
X = centers[cls] + rng.normal(size=(2000, 16))
data = plssvm.DataSet(X, cls.astype(np.int64))

svm = plssvm.CSVM(kernel_type="rbf", cost=10.0)

# C classes train as ONE block CG: the O(n^2 d) Gram work per iteration is
# shared by all classes (a sequential one-vs-all would pay it C times)
model = svm.fit(data, epsilon=1e-6)
print(f"classes: {data.num_different_labels}, accuracy: {svm.score(model)}")

# (n, C) one-vs-all decision columns; predict takes the argmax class
values = svm.predict_values(model, data)
print(f"decision values: {values.shape}")

# the model file round-trips with C rho values and C alpha columns
import os
import tempfile

_model_path = os.path.join(tempfile.mkdtemp(), "multiclass.libsvm.model")
model.save(_model_path)
reloaded = plssvm.Model.load(_model_path, label_type=np.int64)
print(f"reloaded accuracy: {svm.score(reloaded, data)}")

# long fits are resumable: CG state is checkpointed every N iterations and
# an interrupted run continues from the file (works on single-device,
# multi-device, and multi-host fits alike)
model = svm.fit(
    data, epsilon=1e-8, checkpoint_path="cg.ckpt", checkpoint_interval=50,
)
print(f"resumable fit finished after {model.n_iter} iterations")
