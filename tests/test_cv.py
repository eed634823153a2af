"""N-fold cross-validation (svm-train's -v mode) — EXTENSION tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from plssvm_tpu import CSVM, DataSet
from plssvm_tpu.probability import cross_validate


def _binary(n=90, d=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = np.where(rng.random(n) > 0.5, 1, -1)
    X[y > 0] += 1.5
    return X, y


def test_classification_cv():
    X, y = _binary(seed=1)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    result = cross_validate(svm, DataSet(X, y), n_folds=5, random_state=0)
    assert 0.8 <= result["accuracy"] <= 1.0
    assert result["predictions"].shape == (90,)
    # out-of-fold predictions, not training predictions: accuracy below
    # a training-set fit on this noisy overlap is expected but not 0
    assert set(np.unique(result["predictions"])) <= {-1, 1}


def test_multiclass_cv_oao():
    from test_multiclass import make_multiclass_blobs

    X, y = make_multiclass_blobs(60, 4, n_classes=3, seed=2)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    result = cross_validate(
        svm, DataSet(X, y), n_folds=3, classification="oao", random_state=0
    )
    assert result["accuracy"] >= 0.9


def test_regression_cv_metrics():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(80, 3))
    y = X @ [1.0, -1.0, 0.5] + 0.05 * rng.normal(size=80)
    svm = CSVM(
        backend="xla", dtype=np.float64, kernel_type="linear", cost=1e4
    )
    result = cross_validate(
        svm, DataSet(X, y, regression=True), n_folds=4, random_state=0,
        epsilon=1e-8,
    )
    assert result["mse"] < 0.05
    assert result["scc"] > 0.95


def test_string_label_cv():
    rng = np.random.default_rng(6)
    X = np.concatenate([rng.normal(3 * c, 0.6, (20, 3)) for c in range(2)])
    y = np.asarray(["neg"] * 20 + ["pos"] * 20, dtype=object)
    X[20:] += 0.5
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
    result = cross_validate(svm, DataSet(X, y), n_folds=4, random_state=0)
    assert result["accuracy"] >= 0.9
    assert set(result["predictions"]) <= {"neg", "pos"}


def test_invalid_folds():
    X, y = _binary(n=30, seed=4)
    svm = CSVM(backend="xla", dtype=np.float64)
    with pytest.raises(ValueError, match="at least 2"):
        cross_validate(svm, DataSet(X, y), n_folds=1)


def test_cli_cv_mode(tmp_path):
    X, y = _binary(n=60, d=3, seed=5)
    from plssvm_tpu.io.libsvm import write_libsvm_file

    f = str(tmp_path / "cv.libsvm")
    write_libsvm_file(f, X, y)
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    out = subprocess.run(
        [sys.executable, "-m", "plssvm_tpu.cli.train", "-t", "2",
         "--cross_validation", "3", "-p", "cpu",
         "--use_double_as_real_type", f],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    assert "Cross Validation Accuracy = " in out.stdout + out.stderr
    # svm-train -v writes no model file
    assert not os.path.exists(str(tmp_path / "cv.libsvm.model"))


def test_compact_cv(tmp_path):
    """cross_validate(fit_fn=compact_fold_fit_fn(...)): the folds train
    with the DEPLOYED compact procedure (round-7 composition)."""
    from plssvm_tpu.sparse import compact_fold_fit_fn

    X, y = _binary(n=120, seed=5)
    svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
               gamma=0.3)
    result = cross_validate(
        svm, DataSet(X, y), n_folds=4, random_state=0,
        fit_fn=compact_fold_fit_fn(svm, n_landmarks=24, random_state=0),
    )
    assert 0.7 <= result["accuracy"] <= 1.0
    assert result["predictions"].shape == (120,)


def test_cli_cv_compact(tmp_path, capsys):
    """plssvm-train --cross_validation N --nystroem M / --max_sv N
    (round-7; previously rejected): prints the CV line, writes NO model."""
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X, y = _binary(n=80, seed=6)
    f = str(tmp_path / "cvc.libsvm")
    write_libsvm_file(f, X, y)
    model_file = str(tmp_path / "cvc.model")
    rc = cli_train.main(
        ["--use_double_as_real_type", "--verbosity", "libsvm",
         "-t", "2", "-g", "0.3", "--cross_validation", "3",
         "--nystroem", "16", f, model_file]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Cross Validation Accuracy" in out
    assert not os.path.exists(model_file)

    rc = cli_train.main(
        ["--use_double_as_real_type", "--verbosity", "libsvm",
         "-t", "2", "-g", "0.3", "--cross_validation", "3",
         "--max_sv", "20", f, model_file]
    )
    assert rc == 0
    assert "Cross Validation Accuracy" in capsys.readouterr().out
    assert not os.path.exists(model_file)

    # CV + streaming stays rejected (no materialized data for folds)
    rc = cli_train.main(
        ["-q", "--cross_validation", "3", "--nystroem", "16",
         "--streaming", f]
    )
    assert rc == 1
    assert "--cross_validation" in capsys.readouterr().err
