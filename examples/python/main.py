"""End-to-end library usage example.

Equivalent of the reference's examples/python/main.py: scale the training
data, fit, score, predict, save the model.
Run: python examples/python/main.py <train.libsvm> <test.libsvm>
"""

import sys

import plssvm_tpu as plssvm

train_file = sys.argv[1] if len(sys.argv) > 1 else "train_data.libsvm"
test_file = sys.argv[2] if len(sys.argv) > 2 else "test_data.libsvm"

try:
    # a parameter set, explicitly overriding the default kernel function
    params = plssvm.Parameter(kernel_type=plssvm.KernelFunctionType.POLYNOMIAL)

    # two data sets: training data scaled to [-1, 1], and test data scaled
    # with the *training* data's factors
    train_data = plssvm.DataSet(train_file, scaling=(-1.0, 1.0))
    test_data = plssvm.DataSet(test_file, scaling=train_data.scaling_factors)

    # a C-SVM using the default backend and the previously defined parameter
    svm = plssvm.CSVM(params=params)

    # fit using the training data, (optionally) set the termination criterion
    model = svm.fit(train_data, epsilon=10e-6)

    # accuracy of the trained model on its training data
    print(f"model accuracy: {svm.score(model)}")

    # predict labels of unseen data
    labels = svm.predict(model, test_data)
    print(f"first predictions: {labels[:10]}")

    # write the model file to disk (LIBSVM format, interoperable with PLSSVM)
    model.save("model_file.libsvm")
except plssvm.PLSSVMError as e:
    print(e)
