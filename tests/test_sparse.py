"""Compact-model fits: Suykens pruning and fixed-size (Nystroem) LS-SVM.

EXTENSION coverage (plssvm_tpu/sparse.py) — the reference keeps every
training point as a support vector (model.hpp:49); these tests validate the
two sparsification procedures against the exact dual solve and the ordinary
predict/model-file paths.
"""

import os

import jax

import numpy as np
import pytest

import golden
from plssvm_tpu import CSVM, DataSet, Model, nystroem_fit, pruned_fit
from plssvm_tpu.exceptions import InvalidParameterError
from plssvm_tpu.sparse import _keep_with_class_floor


def _binary_problem(n=120, d=6, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    w = rng.normal(size=d)
    y = np.where(X @ w + 0.2 * rng.normal(size=n) > 0, 1, -1)
    return X, y


def _svm(**kw):
    kw.setdefault("backend", "xla")
    kw.setdefault("dtype", np.float64)
    return CSVM(**kw)


# ---------------------------------------------------------------------------
# Nystroem golden: with ALL rows as landmarks the primal ridge in the
# Nystroem basis is the exact LS-SVM problem, so the decision function must
# match the dense dual solve.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["linear", "rbf"])
def test_nystroem_full_landmarks_matches_dense_dual(kind):
    X, y = _binary_problem(n=60, d=5, seed=1)
    gamma = 0.25
    svm = _svm(kernel_type=kind, cost=4.0, gamma=gamma)
    ds = DataSet(X, y, dtype=np.float64)

    model = nystroem_fit(svm, ds, landmarks=np.arange(60), rcond=1e-12)
    got = svm.predict_values(model, ds)

    alpha, rho = golden.solve_dense(X, y.astype(np.float64), cost=4.0,
                                    kind=kind, gamma=gamma)
    want = golden.predict_values(X, alpha, rho, X, kind, gamma=gamma)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-7)


def test_nystroem_weighted_full_landmarks_matches_dense_weighted():
    X, y = _binary_problem(n=50, d=4, seed=2)
    gamma = 0.5
    cost = 2.0
    s = np.random.default_rng(3).uniform(0.5, 2.0, size=50)
    svm = _svm(kernel_type="rbf", cost=cost, gamma=gamma)
    ds = DataSet(X, y, dtype=np.float64)

    model = nystroem_fit(svm, ds, landmarks=np.arange(50), rcond=1e-12,
                         sample_weight=s)
    got = svm.predict_values(model, ds)

    # dense weighted LS-SVM with bias: bordered KKT system
    # [[0, 1'], [1, K + diag(1/(C s))]] [b; a] = [0; y]
    K = golden.kernel_matrix(X, "rbf", gamma=gamma)
    n = X.shape[0]
    H = np.zeros((n + 1, n + 1))
    H[0, 1:] = 1.0
    H[1:, 0] = 1.0
    H[1:, 1:] = K + np.diag(1.0 / (cost * s))
    rhs = np.concatenate([[0.0], y.astype(np.float64)])
    sol = np.linalg.solve(H, rhs)
    b, a = sol[0], sol[1:]
    want = K @ a + b
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_nystroem_regression_full_landmarks_matches_dense():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(40, 3))
    y = np.sin(X[:, 0]) + 0.1 * X[:, 1]
    svm = _svm(kernel_type="rbf", cost=10.0, gamma=1.0)
    ds = DataSet(X, y, dtype=np.float64, regression=True)

    model = nystroem_fit(svm, ds, landmarks=np.arange(40), rcond=1e-12)
    assert model.is_regression
    got = svm.predict_values(model, ds)

    K = golden.kernel_matrix(X, "rbf", gamma=1.0)
    n = X.shape[0]
    H = np.zeros((n + 1, n + 1))
    H[0, 1:] = 1.0
    H[1:, 0] = 1.0
    H[1:, 1:] = K + np.eye(n) / 10.0
    sol = np.linalg.solve(H, np.concatenate([[0.0], y]))
    want = K @ sol[1:] + sol[0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Nystroem subsampled: behavior, stratification, model-file round trip
# ---------------------------------------------------------------------------


def test_nystroem_subsampled_accuracy_and_size():
    X, y = _binary_problem(n=300, d=8, seed=5)
    svm = _svm(kernel_type="rbf", cost=2.0)
    ds = DataSet(X, y, dtype=np.float64)
    model = nystroem_fit(svm, ds, n_landmarks=64, random_state=0)
    assert model.num_support_vectors == 64
    assert model.n_iter == 0
    assert svm.score(model, ds) >= 0.9


def test_nystroem_multiclass_oaa_layout_and_file_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    centers = rng.normal(size=(3, 5)) * 4
    yc = rng.integers(0, 3, size=200)
    X = centers[yc] + rng.normal(size=(200, 5))
    svm = _svm(kernel_type="rbf", cost=2.0)
    ds = DataSet(X, yc, dtype=np.float64)
    model = nystroem_fit(svm, ds, n_landmarks=45, random_state=1)
    assert model.alpha.shape == (45, 3)
    assert np.asarray(model.rho).shape == (3,)
    # every class contributes landmarks (stratified sampling)
    assert model.data.num_different_labels == 3
    acc = svm.score(model, ds)
    assert acc >= 0.9

    path = os.fspath(tmp_path / "nystroem.model")
    model.save(path)
    loaded = Model.load(path, label_type=int)
    reloaded = svm.predict(loaded, ds)
    np.testing.assert_array_equal(reloaded, svm.predict(model, ds))


def test_nystroem_binary_model_file_roundtrip(tmp_path):
    X, y = _binary_problem(n=100, d=4, seed=7)
    svm = _svm(kernel_type="polynomial", degree=2, cost=1.0, gamma=0.3,
               coef0=1.0)
    ds = DataSet(X, y, dtype=np.float64)
    model = nystroem_fit(svm, ds, n_landmarks=32, random_state=2)
    path = os.fspath(tmp_path / "ny_binary.model")
    model.save(path)
    loaded = Model.load(path, label_type=int)
    np.testing.assert_allclose(
        svm.predict_values(loaded, ds), svm.predict_values(model, ds),
        rtol=1e-10, atol=1e-10,
    )


def test_nystroem_validation_errors():
    X, y = _binary_problem(n=30, d=3)
    svm = _svm()
    ds = DataSet(X, y, dtype=np.float64)
    with pytest.raises(InvalidParameterError, match="n_landmarks or explicit"):
        nystroem_fit(svm, ds)
    with pytest.raises(InvalidParameterError, match="must be in"):
        nystroem_fit(svm, ds, n_landmarks=0)
    with pytest.raises(InvalidParameterError, match="within"):
        nystroem_fit(svm, ds, landmarks=[0, 99])
    with pytest.raises(InvalidParameterError, match="must all be positive"):
        nystroem_fit(svm, ds, n_landmarks=8,
                     sample_weight=np.zeros(30))
    # single-class landmark set loses a class -> explicit error
    one_class = np.nonzero(y == y[0])[0][:5]
    with pytest.raises(InvalidParameterError, match="lost a class"):
        nystroem_fit(svm, ds, landmarks=one_class)


# ---------------------------------------------------------------------------
# Pruning
# ---------------------------------------------------------------------------


def test_pruned_fit_binary_reaches_target_and_stays_accurate():
    X, y = _binary_problem(n=240, d=6, seed=8)
    svm = _svm(kernel_type="rbf", cost=2.0)
    ds = DataSet(X, y, dtype=np.float64)
    full = svm.fit(ds)
    full_acc = svm.score(full, ds)
    model, idx = pruned_fit(svm, ds, n_sv=80, return_indices=True)
    assert model.num_support_vectors == 80
    assert idx.shape == (80,)
    # the surviving SVs are actual rows of the data set
    np.testing.assert_allclose(model.data.data, X[idx])
    assert svm.score(model, ds) >= full_acc - 0.05


def test_pruned_fit_regression(tmp_path):
    rng = np.random.default_rng(9)
    X = rng.normal(size=(150, 4))
    y = np.cos(X[:, 0]) + 0.05 * rng.normal(size=150)
    svm = _svm(kernel_type="rbf", cost=10.0, gamma=0.5)
    ds = DataSet(X, y, dtype=np.float64, regression=True)
    model = pruned_fit(svm, ds, n_sv=60)
    assert model.is_regression
    assert model.num_support_vectors == 60
    assert svm.score(model, ds) >= 0.8
    path = os.fspath(tmp_path / "pruned.model")
    model.save(path)
    loaded = Model.load(path)
    np.testing.assert_allclose(
        svm.predict_values(loaded, ds), svm.predict_values(model, ds),
        rtol=1e-10, atol=1e-10,
    )


def test_pruned_fit_multiclass_oaa():
    rng = np.random.default_rng(10)
    centers = rng.normal(size=(4, 6)) * 4
    yc = rng.integers(0, 4, size=260)
    X = centers[yc] + rng.normal(size=(260, 6))
    svm = _svm(kernel_type="rbf", cost=2.0)
    ds = DataSet(X, yc, dtype=np.float64)
    model = pruned_fit(svm, ds, n_sv=90)
    assert model.num_support_vectors == 90
    assert model.alpha.shape == (90, 4)
    # no class may be pruned away entirely
    assert model.data.num_different_labels == 4
    assert svm.score(model, ds) >= 0.9


def test_pruned_fit_weighted_prunes_weights_alongside():
    X, y = _binary_problem(n=100, d=4, seed=11)
    s = np.random.default_rng(12).uniform(0.5, 2.0, size=100)
    svm = _svm(kernel_type="rbf", cost=2.0)
    ds = DataSet(X, y, dtype=np.float64)
    model = pruned_fit(svm, ds, n_sv=40, sample_weight=s)
    assert model.num_support_vectors == 40
    assert svm.score(model, ds) >= 0.8


def test_pruned_fit_validation_errors():
    X, y = _binary_problem(n=30, d=3)
    svm = _svm()
    ds = DataSet(X, y, dtype=np.float64)
    with pytest.raises(InvalidParameterError, match="n_sv must be in"):
        pruned_fit(svm, ds, n_sv=0)
    with pytest.raises(InvalidParameterError, match="n_sv must be in"):
        pruned_fit(svm, ds, n_sv=30)
    with pytest.raises(InvalidParameterError, match="prune_rate"):
        pruned_fit(svm, ds, n_sv=10, prune_rate=1.5)


def test_pruned_fit_n_sv_below_class_count_rejected():
    # the class floor keeps every class non-empty, so n_sv < num_classes can
    # never terminate — must be rejected up front (previously looped forever)
    X, y = _binary_problem(n=30, d=3)
    svm = _svm()
    ds = DataSet(X, y, dtype=np.float64)
    with pytest.raises(InvalidParameterError, match="number of classes"):
        pruned_fit(svm, ds, n_sv=1)
    rng = np.random.default_rng(7)
    y3 = rng.integers(0, 3, size=30)
    y3[:3] = [0, 1, 2]  # all three classes present
    ds3 = DataSet(X, y3, dtype=np.float64)
    with pytest.raises(InvalidParameterError, match="number of classes"):
        pruned_fit(svm, ds3, n_sv=2)
    # regression has no class floor: n_sv=1 is legal there
    dsr = DataSet(X, (X @ np.ones(3)), dtype=np.float64, regression=True)
    model = pruned_fit(svm, dsr, n_sv=1)
    assert model.num_support_vectors == 1


def test_select_landmarks_imbalanced_exact_count():
    # the one-per-class floor used to over-allocate on imbalanced data
    # (counts [100,1,1,1] with m=4 floored to [4,1,1,1] -> 7 landmarks);
    # the --nystroem M contract requires exactly M
    from plssvm_tpu.sparse import _select_landmarks

    rng = np.random.default_rng(3)
    X = rng.normal(size=(103, 4))
    y = np.concatenate([np.zeros(100, int), [1, 2, 3]])
    ds = DataSet(X, y, dtype=np.float64)
    for m in (4, 5, 7):
        idx = _select_landmarks(ds, m, random_state=0)
        assert idx.shape == (m,), f"m={m} returned {idx.shape[0]} landmarks"
        # every class still represented
        assert set(np.unique(y[idx])) == {0, 1, 2, 3}
    model = nystroem_fit(_svm(), ds, n_landmarks=5, random_state=0)
    assert model.num_support_vectors == 5


def test_cli_train_max_sv_below_class_count(tmp_path, capsys):
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X, y = _binary_problem(n=30, d=3, seed=4)
    path = os.fspath(tmp_path / "bin.libsvm")
    write_libsvm_file(path, X, y)
    model_file = os.fspath(tmp_path / "x.model")
    rc = cli_train.main(
        ["-q", "--max_sv", "1", path, model_file]
    )
    assert rc == 1
    assert "number of classes" in capsys.readouterr().err


def test_keep_with_class_floor_rescues_dropped_class():
    # class 1 has uniformly tiny magnitudes -> plain top-k would drop it
    magnitude = np.array([9.0, 8.0, 7.0, 6.0, 0.01, 0.02])
    class_idx = np.array([0, 0, 0, 0, 1, 1])
    keep = _keep_with_class_floor(magnitude, 3, class_idx)
    assert keep.shape == (3,)
    kept_classes = set(class_idx[keep].tolist())
    assert kept_classes == {0, 1}
    # the rescued point is class 1's best (index 5, magnitude 0.02)
    assert 5 in keep
    # without classes it is a plain top-k
    keep_plain = _keep_with_class_floor(magnitude, 3, None)
    np.testing.assert_array_equal(keep_plain, [0, 1, 2])


# ---------------------------------------------------------------------------
# CLI integration: plssvm-train --max_sv / --nystroem
# ---------------------------------------------------------------------------


@pytest.fixture
def cli_train_file(tmp_path):
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X, y = _binary_problem(n=60, d=5, seed=20)
    path = os.fspath(tmp_path / "train.libsvm")
    write_libsvm_file(path, X, y)
    return path


def _model_total_sv(path):
    with open(path) as f:
        for line in f:
            if line.startswith("total_sv"):
                return int(line.split()[1])
    raise AssertionError("no total_sv header line")


def test_cli_train_max_sv(cli_train_file, tmp_path):
    from plssvm_tpu.cli import train as cli_train

    model_file = os.fspath(tmp_path / "pruned.model")
    rc = cli_train.main(
        ["-q", "--use_double_as_real_type", "--max_sv", "20",
         cli_train_file, model_file]
    )
    assert rc == 0
    assert _model_total_sv(model_file) == 20


def test_cli_train_nystroem(cli_train_file, tmp_path):
    from plssvm_tpu.cli import train as cli_train

    model_file = os.fspath(tmp_path / "ny.model")
    rc = cli_train.main(
        ["-q", "--use_double_as_real_type", "--nystroem", "16",
         cli_train_file, model_file]
    )
    assert rc == 0
    assert _model_total_sv(model_file) == 16


def test_cli_train_sparse_flag_conflicts(cli_train_file, tmp_path, capsys):
    from plssvm_tpu.cli import train as cli_train

    model_file = os.fspath(tmp_path / "x.model")
    rc = cli_train.main(
        ["-q", "--max_sv", "8", "--nystroem", "8", cli_train_file, model_file]
    )
    assert rc == 1
    assert "mutually exclusive" in capsys.readouterr().err
    rc = cli_train.main(
        ["-q", "--max_sv", "8", "--classification", "oao",
         cli_train_file, model_file]
    )
    assert rc == 1
    assert "one-vs-all" in capsys.readouterr().err
    rc = cli_train.main(
        ["-q", "--nystroem", "0", cli_train_file, model_file]
    )
    assert rc == 1
    assert "at least 1" in capsys.readouterr().err
    rc = cli_train.main(
        ["-q", "--max_sv", "8", "--checkpoint", os.fspath(tmp_path / "c"),
         cli_train_file, model_file]
    )
    assert rc == 1
    assert "--checkpoint" in capsys.readouterr().err
    assert not os.path.exists(model_file)


# ---------------------------------------------------------------------------
# Multi-device (8-virtual-CPU mesh) Nystroem reduction
# ---------------------------------------------------------------------------


def test_nystroem_sharded_matches_single_device():
    import jax

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    X, y = _binary_problem(n=200, d=7, seed=30)
    ds = DataSet(X, y, dtype=np.float64)
    idx = np.sort(np.random.default_rng(31).choice(200, 48, replace=False))

    single = _svm(kernel_type="rbf", cost=2.0)
    m1 = nystroem_fit(single, ds, landmarks=idx, row_block=16)

    sharded = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   cost=2.0, devices=devs[:8])
    m8 = nystroem_fit(sharded, ds, landmarks=idx, row_block=16)

    np.testing.assert_allclose(np.asarray(m8.alpha), np.asarray(m1.alpha),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(m8.rho, m1.rho, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        single.predict_values(m8, ds), single.predict_values(m1, ds),
        rtol=1e-8, atol=1e-8,
    )


def test_nystroem_sharded_weighted_multiclass():
    import jax

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs virtual CPU devices")
    rng = np.random.default_rng(32)
    centers = rng.normal(size=(3, 5)) * 4
    yc = rng.integers(0, 3, size=150)
    X = centers[yc] + rng.normal(size=(150, 5))
    s = rng.uniform(0.5, 2.0, size=150)
    ds = DataSet(X, yc, dtype=np.float64)
    idx = np.sort(rng.choice(150, 36, replace=False))
    while np.unique(yc[idx]).shape[0] < 3:  # keep all classes represented
        idx = np.sort(rng.choice(150, 36, replace=False))

    single = _svm(kernel_type="polynomial", degree=2, gamma=0.3, coef0=1.0)
    m1 = nystroem_fit(single, ds, landmarks=idx, sample_weight=s,
                      row_block=16)
    sharded = CSVM(backend="xla", dtype=np.float64,
                   kernel_type="polynomial", degree=2, gamma=0.3, coef0=1.0,
                   devices=devs[:4])
    m4 = nystroem_fit(sharded, ds, landmarks=idx, sample_weight=s,
                      row_block=16)
    np.testing.assert_allclose(np.asarray(m4.alpha), np.asarray(m1.alpha),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(m4.rho), np.asarray(m1.rho),
                               rtol=1e-8, atol=1e-10)


def test_cli_train_nystroem_regression(tmp_path):
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    rng = np.random.default_rng(40)
    X = rng.normal(size=(80, 4))
    y = np.sin(X[:, 0])
    path = os.fspath(tmp_path / "reg.libsvm")
    write_libsvm_file(path, X, y)
    model_file = os.fspath(tmp_path / "reg_ny.model")
    rc = cli_train.main(
        ["-q", "--use_double_as_real_type", "-s", "epsilon_svr",
         "--nystroem", "24", path, model_file]
    )
    assert rc == 0
    assert _model_total_sv(model_file) == 24
    with open(model_file) as fh:
        assert "svm_type epsilon_svr" in fh.read()


# ---------------------------------------------------------------------------
# windowed file ingest (round-4 verdict item 6): fixed-size fits straight
# from a LIBSVM file in bounded host memory — two native selected-row
# passes (landmark gather, then the streamed normal-equation reduction)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def streaming_file(tmp_path_factory):
    from plssvm_tpu.io.libsvm import write_libsvm_file

    rng = np.random.default_rng(31)
    n, d = 2000, 10
    centers = rng.normal(size=(3, d)) * 3.0
    lab = rng.integers(0, 3, size=n)
    X = centers[lab] + rng.normal(size=(n, d))
    path = os.fspath(tmp_path_factory.mktemp("stream") / "big.libsvm")
    write_libsvm_file(path, X, lab)
    return path, X, lab


def test_nystroem_streaming_matches_in_memory(streaming_file):
    from plssvm_tpu import DataSet, nystroem_fit, nystroem_fit_from_file

    path, X, lab = streaming_file
    svm = _svm(kernel_type="rbf", gamma=0.1, cost=10.0)
    model, idx = nystroem_fit_from_file(
        svm, path, n_landmarks=48, random_state=2, row_block=256,
        return_indices=True,
    )
    ds = DataSet(path, dtype=np.float64)
    ref = nystroem_fit(svm, ds, landmarks=idx)
    np.testing.assert_allclose(
        np.asarray(model.alpha), np.asarray(ref.alpha),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(model.rho), np.asarray(ref.rho), rtol=1e-8
    )
    assert model.num_support_vectors == 48
    assert svm.score(model, ds) >= 0.95


def test_nystroem_streaming_regression(streaming_file):
    from plssvm_tpu import DataSet, nystroem_fit, nystroem_fit_from_file
    from plssvm_tpu.io.libsvm import write_libsvm_file

    path, X, _ = streaming_file
    rng = np.random.default_rng(5)
    yr = X @ rng.normal(size=X.shape[1])
    import tempfile

    f2 = os.path.join(tempfile.mkdtemp(), "reg.libsvm")
    write_libsvm_file(f2, X, yr)
    svm = _svm(kernel_type="rbf", gamma=0.1, cost=10.0)
    model, idx = nystroem_fit_from_file(
        svm, f2, n_landmarks=40, regression=True, random_state=1,
        row_block=300, return_indices=True,
    )
    assert model.is_regression
    dsr = DataSet(f2, label_type=float, dtype=np.float64, regression=True)
    ref = nystroem_fit(svm, dsr, landmarks=idx)
    np.testing.assert_allclose(
        np.asarray(model.alpha), np.asarray(ref.alpha),
        rtol=1e-8, atol=1e-10,
    )


def test_nystroem_streaming_python_fallback(streaming_file, monkeypatch):
    """Without the native parser the streaming entry falls back to the
    in-memory path and still trains."""
    from plssvm_tpu import nystroem_fit_from_file
    from plssvm_tpu.native import loader

    path, X, lab = streaming_file
    monkeypatch.setattr(loader, "_lib", None)
    monkeypatch.setattr(loader, "_lib_failed", True)
    svm = _svm(kernel_type="rbf", gamma=0.1, cost=10.0)
    model = nystroem_fit_from_file(
        svm, path, n_landmarks=32, random_state=0
    )
    assert model.num_support_vectors == 32


def test_native_selected_row_parse(streaming_file):
    from plssvm_tpu.native.loader import (
        libsvm_line_spans,
        native_available,
        parse_libsvm_native_rows,
    )

    if not native_available():
        pytest.skip("native parser unavailable")
    path, X, _ = streaming_file
    spans = libsvm_line_spans(path)
    assert spans.shape == (X.shape[0], 2)
    idx = np.array([0, 7, 500, 1999])
    got = parse_libsvm_native_rows(path, spans[idx], X.shape[1])
    np.testing.assert_allclose(got, X[idx], rtol=1e-9, atol=1e-9)


def test_cli_train_nystroem_streaming(streaming_file, tmp_path, capsys):
    from plssvm_tpu.cli import train as cli_train

    path, X, lab = streaming_file
    model_file = os.fspath(tmp_path / "stream.model")
    rc = cli_train.main(
        ["-q", "--use_double_as_real_type", "--nystroem", "32",
         "--streaming", path, model_file]
    )
    assert rc == 0
    assert _model_total_sv(model_file) == 32
    # --streaming without --nystroem is rejected
    rc = cli_train.main(["-q", "--streaming", path, model_file])
    assert rc == 1
    assert "--streaming requires --nystroem" in capsys.readouterr().err


def test_cli_streaming_probability_rejected(streaming_file, tmp_path, capsys):
    """--streaming never materializes the data, so --probability (which
    needs CV refits over it) must be rejected cleanly, not crash."""
    from plssvm_tpu.cli import train as cli_train

    path, X, lab = streaming_file
    rc = cli_train.main(
        ["-q", "--nystroem", "16", "--streaming", "--probability",
         path, os.fspath(tmp_path / "x.model")]
    )
    assert rc == 1
    assert "--probability" in capsys.readouterr().err


class TestNystroemMultihost:
    """nystroem_fit_multihost (round-7): windowed per-host ingest + the
    row-sharded reduction over the GLOBAL mesh, host-identical landmarks."""

    def _mesh8(self):
        devs = jax.devices("cpu")
        if len(devs) < 8:
            pytest.skip("needs 8 virtual CPU devices")
        from plssvm_tpu.parallel.sharded import make_row_mesh

        return lambda: make_row_mesh(devs[:8]), devs[:8]

    def test_matches_in_memory_fit(self, tmp_path):
        from plssvm_tpu import nystroem_fit, nystroem_fit_multihost
        from plssvm_tpu.io.libsvm import write_libsvm_file
        from plssvm_tpu.parallel import multihost as mh

        mesh_fn, devs = self._mesh8()
        rng = np.random.default_rng(81)
        X = rng.normal(size=(300, 6))
        y = (X[:, 0] + X[:, 1] > 0).astype(np.int64)
        f = str(tmp_path / "nymh.libsvm")
        write_libsvm_file(f, X, y)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   gamma=0.3, cost=10.0)

        orig = mh.global_row_mesh
        mh.global_row_mesh = mesh_fn
        try:
            m_mh, idx = nystroem_fit_multihost(
                svm, f, n_landmarks=32, random_state=3,
                return_indices=True,
            )
        finally:
            mh.global_row_mesh = orig
        m_ref = nystroem_fit(
            svm, DataSet(f, dtype=np.float64), landmarks=idx
        )
        np.testing.assert_allclose(m_mh.alpha, m_ref.alpha,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(m_mh.rho, m_ref.rho, rtol=1e-8)
        assert m_mh.num_support_vectors == 32 and m_mh.n_iter == 0

    def test_regression_and_weights(self, tmp_path):
        from plssvm_tpu import nystroem_fit, nystroem_fit_multihost
        from plssvm_tpu.io.libsvm import write_libsvm_file
        from plssvm_tpu.parallel import multihost as mh

        mesh_fn, devs = self._mesh8()
        rng = np.random.default_rng(82)
        X = rng.normal(size=(200, 5))
        t = X @ rng.normal(size=5) + 0.1 * rng.normal(size=200)
        f = str(tmp_path / "nymhr.libsvm")
        write_libsvm_file(f, X, t)
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   gamma=0.3, cost=10.0)

        orig = mh.global_row_mesh
        mh.global_row_mesh = mesh_fn
        try:
            m_mh, idx = nystroem_fit_multihost(
                svm, f, n_landmarks=24, regression=True, random_state=5,
                return_indices=True,
            )
            # weighted classification variant
            y = (X[:, 0] > 0).astype(np.int64)
            fc = str(tmp_path / "nymhw.libsvm")
            write_libsvm_file(fc, X, y)
            s = rng.uniform(0.5, 2.0, size=200)
            m_w, idx_w = nystroem_fit_multihost(
                svm, fc, n_landmarks=24, random_state=5,
                sample_weight=s, return_indices=True,
            )
        finally:
            mh.global_row_mesh = orig
        m_ref = nystroem_fit(
            svm, DataSet(f, dtype=np.float64, regression=True,
                         label_type=float),
            landmarks=idx,
        )
        assert m_mh.is_regression
        np.testing.assert_allclose(m_mh.alpha, m_ref.alpha,
                                   rtol=1e-8, atol=1e-10)
        m_wref = nystroem_fit(
            svm, DataSet(fc, dtype=np.float64), landmarks=idx_w,
            sample_weight=s,
        )
        np.testing.assert_allclose(m_w.alpha, m_wref.alpha,
                                   rtol=1e-8, atol=1e-10)

    def test_cli_nystroem_multihost(self, tmp_path, capsys):
        from plssvm_tpu.cli import train as cli_train
        from plssvm_tpu.io.libsvm import write_libsvm_file
        from plssvm_tpu.parallel import multihost as mh

        mesh_fn, devs = self._mesh8()
        rng = np.random.default_rng(83)
        X = rng.normal(size=(120, 4))
        y = (X[:, 0] > 0).astype(np.int64)
        f = str(tmp_path / "cliny.libsvm")
        write_libsvm_file(f, X, y)
        m = str(tmp_path / "cliny.model")
        orig = mh.global_row_mesh
        mh.global_row_mesh = mesh_fn
        try:
            rc = cli_train.main(
                ["-q", "--use_double_as_real_type", "-t", "2", "-g", "0.3",
                 "--nystroem", "16", "--multihost", f, m]
            )
        finally:
            mh.global_row_mesh = orig
        assert rc == 0
        from plssvm_tpu import Model

        assert Model.load(m, label_type=int).num_support_vectors == 16
        # pruning and streaming still reject --multihost
        rc = cli_train.main(
            ["-q", "--max_sv", "8", "--multihost", f]
        )
        assert rc == 1 and "--multihost" in capsys.readouterr().err
        rc = cli_train.main(
            ["-q", "--nystroem", "16", "--streaming", "--multihost", f]
        )
        assert rc == 1 and "--streaming" in capsys.readouterr().err
