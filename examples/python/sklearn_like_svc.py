"""sklearn-style usage example.

Equivalent of the reference's examples/python/sklearn_like_svc.py.
"""

import numpy as np

import plssvm_tpu as plssvm

num_samples = 2**8
num_features = 2**6

# two separable blobs (sklearn's make_classification without the dependency)
rng = np.random.default_rng(0)
half = num_samples // 2
samples = np.concatenate([
    rng.normal(-1.0, 1.0, size=(half, num_features)),
    rng.normal(+1.0, 1.0, size=(num_samples - half, num_features)),
])
labels = np.concatenate([np.zeros(half), np.ones(num_samples - half)])

# create the classifier
svc = plssvm.SVC(kernel="linear", C=1.0, tol=10e-6, verbose=False)

# fit the model
svc.fit(samples, labels)

# score the data set
print("model accuracy: {0:.2f}".format(svc.score(samples, labels) * 100))
