"""Multi-chip sharding tests, run on an 8-virtual-device CPU mesh.

Mirrors the reference's multi-device coverage (tests/backends/compare.hpp
``num_devices``-aware golden functions, SURVEY.md §4) but on fake devices —
the capability the reference lacks (its multi-GPU tests need real GPUs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import plssvm_tpu
from plssvm_tpu.parameter import KernelFunctionType
from plssvm_tpu.parallel.sharded import (
    ROW_AXIS,
    build_sharded_solver,
    make_row_mesh,
    shard_arrays,
)
from plssvm_tpu.solver.cg import solve_ls_svm

from conftest import make_blobs

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices("cpu")
    if len(devs) < NDEV:
        pytest.skip("needs 8 virtual CPU devices")
    return make_row_mesh(devs[:NDEV])


def _padded_problem(n=257, d=13, dtype=np.float64, seed=3):
    """A blob problem padded so rows divide evenly across NDEV shards."""
    X, y = make_blobs(n, d, seed=seed, dtype=dtype)
    dept = n - 1
    shard = 64
    m_pad = ((dept + NDEV * shard - 1) // (NDEV * shard)) * (NDEV * shard)
    Xp = np.zeros((m_pad, d), dtype=dtype)
    Xp[:dept] = X[:dept]
    yp = np.zeros((m_pad,), dtype=dtype)
    yp[:dept] = y[:dept]
    mask = np.zeros((m_pad,), dtype=dtype)
    mask[:dept] = 1.0
    return Xp, X[-1].astype(dtype), yp, dtype(y[-1]), mask, dept


@pytest.mark.parametrize("kernel", ["linear", "polynomial", "rbf"])
def test_sharded_solve_matches_single_device(mesh, kernel):
    """The 8-shard CG must match the single-device CG solution."""
    kind = KernelFunctionType.from_string(kernel)
    dtype = np.float64
    Xp, x_last, yp, y_last, mask, dept = _padded_problem(dtype=dtype)
    gamma = dtype(1.0 / Xp.shape[1])
    coef0 = dtype(1.0 if kind == KernelFunctionType.POLYNOMIAL else 0.0)
    cost, eps = dtype(1.0), dtype(1e-10)
    max_iter = jnp.asarray(2000, jnp.int32)

    single = solve_ls_svm(
        jnp.asarray(Xp), jnp.asarray(x_last), jnp.asarray(yp),
        jnp.asarray(y_last), jnp.asarray(mask),
        jnp.asarray(gamma), jnp.asarray(coef0), jnp.asarray(cost),
        jnp.asarray(eps), max_iter, kind=kind, degree=3, impl="xla",
    )

    solver = build_sharded_solver(mesh, kind=kind, degree=3)
    args = shard_arrays(mesh, Xp, x_last, yp, y_last, mask, dtype)
    sharded = solver(
        *args, jnp.asarray(gamma), jnp.asarray(coef0), jnp.asarray(cost),
        jnp.asarray(eps), max_iter,
    )

    x_single = np.asarray(single.x)[:dept]
    x_shard = np.asarray(jax.device_get(sharded.x))[:dept]

    # the right invariant: the sharded solution must satisfy the dense system
    # to the same relative residual the CG stop criterion guarantees
    from plssvm_tpu.kernel_functions import apply_kernel_to_gram

    Xr = Xp[:dept]
    sq = np.sum(Xr * Xr, axis=1)
    gram = Xr @ Xr.T
    K = np.asarray(
        apply_kernel_to_gram(gram, sq[:, None], sq[None, :], kind, gamma, coef0, 3)
    )
    q = np.asarray(
        apply_kernel_to_gram(
            Xr @ x_last, sq, np.dot(x_last, x_last), kind, gamma, coef0, 3
        )
    )
    QA_cost = float(
        apply_kernel_to_gram(
            np.dot(x_last, x_last), np.dot(x_last, x_last),
            np.dot(x_last, x_last), kind, gamma, coef0, 3,
        )
    ) + 1.0 / cost
    A = K + QA_cost - q[:, None] - q[None, :] + np.eye(dept) / cost
    b = yp[:dept] - y_last
    r0 = b - A @ np.ones(dept)
    for x_sol in (x_single, x_shard):
        res = np.dot(b - A @ x_sol, b - A @ x_sol)
        assert res <= eps * eps * np.dot(r0, r0) * 1.1

    # cross-match: both converged to the eps-ball around the true solution,
    # so they agree to ~eps * cond(A) relative
    np.testing.assert_allclose(x_shard, x_single, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        float(sharded.rho), float(single.rho), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(sharded.alpha_last), float(single.alpha_last), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("kernel", ["polynomial", "rbf"])
def test_ring_matvec_matches_dense(mesh, kernel):
    """Ring-rotated K@v == dense kernel-matrix matvec."""
    from plssvm_tpu.kernel_functions import apply_kernel_to_gram
    from plssvm_tpu.parallel.sharded import ring_kernel_matvec

    kind = KernelFunctionType.from_string(kernel)
    rng = np.random.default_rng(0)
    m, d = NDEV * 16, 7
    X = rng.normal(size=(m, d))
    v = rng.normal(size=(m,))
    gamma, coef0 = 0.25, 1.0

    sq = np.sum(X * X, axis=1)
    gram = X @ X.T
    K = np.asarray(
        apply_kernel_to_gram(gram, sq[:, None], sq[None, :], kind, gamma, coef0, 3)
    )
    expected = K @ v

    shmapped = jax.jit(
        jax.shard_map(
            lambda Xl, sql, vl: ring_kernel_matvec(
                Xl, sql, vl, gamma, coef0,
                kind=kind, degree=3, axis_name=ROW_AXIS, num_devices=NDEV,
            ),
            mesh=mesh,
            in_specs=(
                jax.sharding.PartitionSpec(ROW_AXIS, None),
                jax.sharding.PartitionSpec(ROW_AXIS),
                jax.sharding.PartitionSpec(ROW_AXIS),
            ),
            out_specs=jax.sharding.PartitionSpec(ROW_AXIS),
        )
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    Xs = jax.device_put(jnp.asarray(X), NamedSharding(mesh, P(ROW_AXIS, None)))
    sqs = jax.device_put(jnp.asarray(sq), NamedSharding(mesh, P(ROW_AXIS)))
    vs = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P(ROW_AXIS)))
    got = np.asarray(jax.device_get(shmapped(Xs, sqs, vs)))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("ndev", [2, 3])
@pytest.mark.parametrize("matmat", [False, True])
def test_symmetric_ring_pallas_impl_interpret(ndev, matmat):
    """The Pallas symmetric ring at P=2 (half-step only: rect matvec /
    dual-discard matmat) and P=3 (dual + ppermute-back, no half-step) must
    match the dense kernel — interpret mode on the CPU mesh."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding, PartitionSpec as P

    from plssvm_tpu.kernel_functions import apply_kernel_to_gram
    from plssvm_tpu.parallel.sharded import (
        ring_kernel_matmat, ring_kernel_matvec,
    )

    devs = jax.devices("cpu")
    if len(devs) < ndev:
        pytest.skip("needs virtual CPU devices")
    small_mesh = make_row_mesh(devs[:ndev])

    kind = KernelFunctionType.RBF
    rng = np.random.default_rng(9)
    m, d = ndev * 128, 128  # pallas blocks must be 128-aligned
    X = rng.normal(size=(m, d)).astype(np.float32) * 0.2
    v = rng.normal(size=(m, 3) if matmat else (m,)).astype(np.float32)
    gamma, coef0 = np.float32(1.0 / d), np.float32(0.0)
    sq = np.sum(X * X, axis=1)
    K = np.asarray(
        apply_kernel_to_gram(
            X @ X.T, sq[:, None], sq[None, :], kind, gamma, coef0, 3
        )
    )
    ring = ring_kernel_matmat if matmat else ring_kernel_matvec
    fn = jax.jit(
        jax.shard_map(
            lambda Xl, sql, vl: ring(
                Xl, sql, vl, gamma, coef0,
                kind=kind, degree=3, axis_name=ROW_AXIS, num_devices=ndev,
                impl="pallas",
            ),
            mesh=small_mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS),
                      P(ROW_AXIS, None) if matmat else P(ROW_AXIS)),
            out_specs=P(ROW_AXIS, None) if matmat else P(ROW_AXIS),
        )
    )
    Xs = jax.device_put(jnp.asarray(X), NamedSharding(small_mesh, P(ROW_AXIS, None)))
    sqs = jax.device_put(jnp.asarray(sq), NamedSharding(small_mesh, P(ROW_AXIS)))
    vs = jax.device_put(
        jnp.asarray(v),
        NamedSharding(small_mesh, P(ROW_AXIS, None) if matmat else P(ROW_AXIS)),
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.device_get(fn(Xs, sqs, vs)))
    np.testing.assert_allclose(got, K @ v, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("ndev", [2, 3, 5, 8])
@pytest.mark.parametrize("matmat", [False, True])
def test_symmetric_ring_all_device_counts(ndev, matmat):
    """The symmetric ring (each off-diagonal block pair computed once, the
    transposed contribution ppermuted back) must match the dense kernel
    matvec/matmat for even P (with the antipodal rows-only half-step), odd
    P (no half-step), and P=2 (half-step only)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from plssvm_tpu.kernel_functions import apply_kernel_to_gram
    from plssvm_tpu.parallel.sharded import (
        ring_kernel_matmat, ring_kernel_matvec,
    )

    devs = jax.devices("cpu")
    if len(devs) < ndev:
        pytest.skip("needs virtual CPU devices")
    small_mesh = make_row_mesh(devs[:ndev])

    kind = KernelFunctionType.RBF
    rng = np.random.default_rng(7)
    m, d = ndev * 16, 6
    X = rng.normal(size=(m, d))
    v = rng.normal(size=(m, 3) if matmat else (m,))
    gamma, coef0 = 0.3, 0.0
    sq = np.sum(X * X, axis=1)
    K = np.asarray(
        apply_kernel_to_gram(
            X @ X.T, sq[:, None], sq[None, :], kind, gamma, coef0, 3
        )
    )
    ring = ring_kernel_matmat if matmat else ring_kernel_matvec
    fn = jax.jit(
        jax.shard_map(
            lambda Xl, sql, vl: ring(
                Xl, sql, vl, gamma, coef0,
                kind=kind, degree=3, axis_name=ROW_AXIS, num_devices=ndev,
            ),
            mesh=small_mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS),
                      P(ROW_AXIS, None) if matmat else P(ROW_AXIS)),
            out_specs=P(ROW_AXIS, None) if matmat else P(ROW_AXIS),
        )
    )
    Xs = jax.device_put(jnp.asarray(X), NamedSharding(small_mesh, P(ROW_AXIS, None)))
    sqs = jax.device_put(jnp.asarray(sq), NamedSharding(small_mesh, P(ROW_AXIS)))
    vs = jax.device_put(
        jnp.asarray(v),
        NamedSharding(small_mesh, P(ROW_AXIS, None) if matmat else P(ROW_AXIS)),
    )
    got = np.asarray(jax.device_get(fn(Xs, sqs, vs)))
    np.testing.assert_allclose(got, K @ v, rtol=1e-10, atol=1e-10)


def test_linear_sharded_matvec_matches_dense(mesh):
    from plssvm_tpu.parallel.sharded import linear_sharded_matvec
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(1)
    m, d = NDEV * 8, 5
    X = rng.normal(size=(m, d))
    v = rng.normal(size=(m,))
    expected = X @ (X.T @ v)

    fn = jax.jit(
        jax.shard_map(
            lambda Xl, vl: linear_sharded_matvec(Xl, vl, ROW_AXIS),
            mesh=mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS)),
            out_specs=P(ROW_AXIS),
        )
    )
    Xs = jax.device_put(jnp.asarray(X), NamedSharding(mesh, P(ROW_AXIS, None)))
    vs = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P(ROW_AXIS)))
    got = np.asarray(jax.device_get(fn(Xs, vs)))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("kernel", ["linear", "rbf"])
def test_csvm_fit_with_explicit_devices(mesh, kernel):
    """End-to-end: CSVM(devices=...) trains sharded and predicts correctly."""
    X, y = make_blobs(300, 6, seed=11)
    data = plssvm_tpu.DataSet(X, y)
    svm = plssvm_tpu.CSVM(
        kernel_type=kernel, dtype=np.float64,
        devices=jax.devices("cpu")[:NDEV],
    )
    model = svm.fit(data, epsilon=1e-9)
    assert svm.score(model) >= 0.95

    ref = plssvm_tpu.CSVM(kernel_type=kernel, dtype=np.float64)
    ref_model = ref.fit(data, epsilon=1e-9)
    np.testing.assert_allclose(model.alpha, ref_model.alpha, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(model.rho, ref_model.rho, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("kernel", ["polynomial", "rbf"])
def test_sharded_predict_matches_single_device(mesh, kernel):
    """SV-sharded streaming predict over the mesh equals one-shot predict."""
    from plssvm_tpu.ops.predict import predict_values
    from plssvm_tpu.parallel.sharded import (
        build_sharded_predict, shard_predict_arrays,
    )

    kind = KernelFunctionType.from_string(kernel)
    dtype = np.float64
    rng = np.random.default_rng(21)
    n_sv, d, n_pred = NDEV * 128, 10, 512  # 2 point blocks of 256
    sv = rng.normal(size=(n_sv, d)).astype(dtype)
    alpha = rng.normal(size=(n_sv,)).astype(dtype)
    points = rng.normal(size=(n_pred, d)).astype(dtype)
    gamma, coef0, rho = dtype(0.1), dtype(1.0), dtype(0.25)

    sv_s, alpha_s, points_s = shard_predict_arrays(mesh, sv, alpha, points, dtype)
    fn = build_sharded_predict(mesh, kind=kind, degree=3, row_block=256)
    got = np.asarray(
        fn(sv_s, alpha_s, jnp.asarray(rho), points_s,
           jnp.asarray(gamma), jnp.asarray(coef0))
    )
    expected = np.asarray(
        predict_values(
            jnp.asarray(sv), jnp.asarray(alpha), jnp.asarray(rho),
            jnp.zeros((d,), dtype), jnp.asarray(points),
            jnp.asarray(gamma), jnp.asarray(coef0), kind=kind, degree=3,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("kernel", ["rbf"])
def test_csvm_sharded_predict_end_to_end(mesh, kernel):
    """CSVM(devices=...) routes poly/RBF predict through the sharded path
    (odd n_pred/n_sv exercise the padding) and matches single-device."""
    X, y = make_blobs(301, 7, seed=13)
    data = plssvm_tpu.DataSet(X, y)
    sharded = plssvm_tpu.CSVM(
        kernel_type=kernel, dtype=np.float64, devices=jax.devices("cpu")[:NDEV]
    )
    model = sharded.fit(data, epsilon=1e-9)
    single = plssvm_tpu.CSVM(kernel_type=kernel, dtype=np.float64)
    vs = sharded.predict_values(model, data)
    v1 = single.predict_values(model, data)
    np.testing.assert_allclose(vs, v1, rtol=1e-7, atol=1e-9)
    assert sharded.score(model) == single.score(model)


def test_sharded_pallas_ring_interpret(mesh):
    """The impl='pallas' ring path (used on real TPU meshes) must match the
    jnp ring, exercised here via Pallas interpret mode on the CPU mesh.

    Since round 4 every pallas_call out_shape declares its varying mesh
    axes (vma=), so this runs under the default shard_map replication
    checker (check_vma=True) like the production builders — pinned by
    test_check_vma_enabled_on_all_sharded_builders."""
    from jax.experimental.pallas import tpu as pltpu

    devs = jax.devices("cpu")[:4]
    small_mesh = make_row_mesh(devs)
    dtype = np.float32
    m, d = 4 * 128, 128
    rng = np.random.default_rng(0)
    Xp = rng.normal(size=(m, d)).astype(dtype)
    yp = np.where(Xp[:, 0] > 0, 1.0, -1.0).astype(dtype)
    mask = np.ones((m,), dtype)
    x_last = rng.normal(size=(d,)).astype(dtype)
    args = shard_arrays(small_mesh, Xp, x_last, yp, dtype(1.0), mask, dtype)
    scalars = (
        jnp.asarray(1.0 / d, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(1e-4, dtype),
        jnp.asarray(20, jnp.int32),
    )
    with pltpu.force_tpu_interpret_mode():
        sol_p = build_sharded_solver(
            small_mesh, kind=KernelFunctionType.RBF, degree=3, impl="pallas"
        )
        res_p = np.asarray(jax.device_get(sol_p(*args, *scalars).x))
    sol_x = build_sharded_solver(
        small_mesh, kind=KernelFunctionType.RBF, degree=3, impl="xla"
    )
    res_x = np.asarray(jax.device_get(sol_x(*args, *scalars).x))
    rel = np.linalg.norm(res_p - res_x) / np.linalg.norm(res_x)
    assert rel < 1e-4


def test_sharded_multiclass_pallas_ring_interpret(mesh):
    """The impl='pallas' multiclass ring (dual matmat per ring block) must
    match the xla shared-Gram ring, via interpret mode on the CPU mesh."""
    from jax.experimental.pallas import tpu as pltpu

    from plssvm_tpu.parallel.sharded import build_sharded_multi_solver

    devs = jax.devices("cpu")[:4]
    small_mesh = make_row_mesh(devs)
    dtype = np.float32
    m, d, C = 4 * 128, 128, 3
    rng = np.random.default_rng(1)
    Xp = rng.normal(size=(m, d)).astype(dtype)
    cls = rng.integers(0, C, size=m)
    Yp = np.where(cls[:, None] == np.arange(C)[None, :], 1.0, -1.0).astype(dtype)
    mask = np.ones((m,), dtype)
    x_last = rng.normal(size=(d,)).astype(dtype)
    y_last = np.asarray([1.0, -1.0, -1.0], dtype)
    args = shard_arrays(small_mesh, Xp, x_last, Yp, y_last, mask, dtype)
    # eps far below reach at max_iter=12: both implementations run EXACTLY
    # the same 12 iterations, so states compare without the eps-boundary
    # iteration-count ambiguity (rho's sum(alpha) amplifies tiny x
    # differences through cancellation otherwise)
    scalars = (
        jnp.asarray(1.0 / d, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(10.0, dtype), jnp.asarray(1e-10, dtype),
        jnp.asarray(12, jnp.int32),
    )
    with pltpu.force_tpu_interpret_mode():
        sol_p = build_sharded_multi_solver(
            small_mesh, kind=KernelFunctionType.RBF, degree=3, impl="pallas"
        )
        res_p = sol_p(*args, *scalars)
        xp = np.asarray(jax.device_get(res_p.x))
    sol_x = build_sharded_multi_solver(
        small_mesh, kind=KernelFunctionType.RBF, degree=3, impl="xla"
    )
    res_x = sol_x(*args, *scalars)
    xx = np.asarray(jax.device_get(res_x.x))
    assert int(res_p.iterations) == int(res_x.iterations) == 12
    rel = np.linalg.norm(xp - xx) / np.linalg.norm(xx)
    assert rel < 1e-4
    np.testing.assert_allclose(
        np.asarray(res_p.rho), np.asarray(res_x.rho), rtol=1e-3, atol=1e-4
    )


# ---------------------------------------------------------------------------
# Weighted fits on the sharded (multi-device) solvers
# ---------------------------------------------------------------------------


def _dense_weighted_rbf(X, y, s, gamma, cost):
    """Dense weighted LS-SVM direct solve (Suykens): the test oracle."""
    n = X.shape[0]
    K = np.exp(-gamma * ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    A = np.zeros((n + 1, n + 1))
    A[0, 1:] = 1.0
    A[1:, 0] = 1.0
    A[1:, 1:] = K + np.diag(1.0 / (cost * s))
    sol = np.linalg.solve(A, np.concatenate([[0.0], y.astype(np.float64)]))
    return sol[0], sol[1:]  # bias, alpha


@pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
def test_sharded_weighted_fit_matches_dense(mesh, solver):
    """CSVM(devices=...) weighted fits must reproduce the dense weighted
    solution — the row-sharded weights enter each chip's 1/(C s_i) diagonal
    exactly like the mask (round-3 extension: weights were single-device)."""
    rng = np.random.default_rng(31)
    n, d = 220, 5
    X = rng.normal(size=(n, d))
    y = np.where(rng.random(n) > 0.5, 1, -1)
    X[y > 0] += 1.0
    s = rng.uniform(0.5, 3.0, size=n)
    bias, alpha = _dense_weighted_rbf(X, y, s, 0.3, 10.0)

    svm = plssvm_tpu.CSVM(
        kernel_type="rbf", gamma=0.3, cost=10.0, dtype=np.float64,
        solver=solver, devices=jax.devices("cpu")[:NDEV],
    )
    model = svm.fit(
        plssvm_tpu.DataSet(X, y), epsilon=1e-12, max_iter=5000,
        sample_weight=s,
    )
    np.testing.assert_allclose(model.rho, -bias, atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.alpha), alpha, atol=1e-7)


def test_sharded_weighted_multiclass_matches_single_device(mesh):
    """Weighted one-vs-all block CG over the mesh == single-device weighted."""
    rng = np.random.default_rng(32)
    X = np.concatenate([rng.normal(3 * c, 0.6, (70, 5)) for c in range(3)])
    y = np.repeat([0, 1, 2], 70)
    s = rng.uniform(0.5, 2.0, size=len(y))
    ds = plssvm_tpu.DataSet(X, y)

    sharded = plssvm_tpu.CSVM(
        kernel_type="rbf", dtype=np.float64,
        devices=jax.devices("cpu")[:NDEV],
    )
    m_sh = sharded.fit(ds, epsilon=1e-10, sample_weight=s)
    single = plssvm_tpu.CSVM(kernel_type="rbf", dtype=np.float64)
    m_1 = single.fit(ds, epsilon=1e-10, sample_weight=s)
    np.testing.assert_allclose(
        np.asarray(m_sh.alpha), np.asarray(m_1.alpha), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(m_sh.rho, m_1.rho, rtol=1e-6, atol=1e-8)
    assert sharded.score(m_sh) == 1.0


def test_sharded_weighted_checkpointed_fit(mesh, tmp_path):
    """Weighted + sharded + CG-state checkpointing compose: the segmented
    sharded solve matches the unsegmented one, and the weights digest keys
    the fingerprint (an unweighted checkpoint never resumes a weighted fit)."""
    rng = np.random.default_rng(33)
    n, d = 200, 4
    X = rng.normal(size=(n, d))
    y = np.where(rng.random(n) > 0.5, 1, -1)
    X[y > 0] += 1.0
    s = rng.uniform(0.5, 3.0, size=n)
    ds = plssvm_tpu.DataSet(X, y)
    svm = plssvm_tpu.CSVM(
        kernel_type="rbf", gamma=0.1, cost=50.0, dtype=np.float64,
        devices=jax.devices("cpu")[:NDEV],
    )
    m1 = svm.fit(ds, epsilon=1e-10, sample_weight=s)
    path = str(tmp_path / "swck")
    m2 = svm.fit(
        ds, epsilon=1e-10, sample_weight=s,
        checkpoint_path=path, checkpoint_interval=4,
    )
    np.testing.assert_array_equal(np.asarray(m1.alpha), np.asarray(m2.alpha))
    assert m1.rho == m2.rho

    # leave an UNWEIGHTED mid-solve checkpoint behind, then fit weighted
    # against the same path: the differing fingerprint forces a fresh start
    path2 = str(tmp_path / "swck2")
    svm.fit(ds, epsilon=1e-30, max_iter=4,
            checkpoint_path=path2, checkpoint_interval=2)
    m3 = svm.fit(
        ds, epsilon=1e-10, sample_weight=s,
        checkpoint_path=path2, checkpoint_interval=1000,
    )
    np.testing.assert_allclose(m3.rho, m1.rho, rtol=1e-10)


@pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
def test_sharded_warm_start_zero_iterations(mesh, solver):
    """Warm-starting a sharded fit from its own converged model takes 0
    iterations (the stop target is cold-anchored, as on one device)."""
    X, y = make_blobs(260, 5, seed=35)
    ds = plssvm_tpu.DataSet(X, y)
    svm = plssvm_tpu.CSVM(
        kernel_type="rbf", dtype=np.float64, solver=solver,
        devices=jax.devices("cpu")[:NDEV],
    )
    cold = svm.fit(ds, epsilon=1e-8)
    warm = svm.fit(ds, epsilon=1e-8, initial_model=cold)
    assert warm.n_iter == 0
    np.testing.assert_allclose(
        np.asarray(warm.alpha), np.asarray(cold.alpha), rtol=1e-12
    )


def test_sharded_warm_start_multiclass(mesh):
    """Warm-started one-vs-all block CG on the mesh: 0 iterations from the
    converged (m, C) alpha block."""
    rng = np.random.default_rng(36)
    X = np.concatenate([rng.normal(3 * c, 0.6, (70, 5)) for c in range(3)])
    y = np.repeat([0, 1, 2], 70)
    ds = plssvm_tpu.DataSet(X, y)
    svm = plssvm_tpu.CSVM(
        kernel_type="rbf", dtype=np.float64,
        devices=jax.devices("cpu")[:NDEV],
    )
    cold = svm.fit(ds, epsilon=1e-8)
    warm = svm.fit(ds, epsilon=1e-8, initial_model=cold)
    assert warm.n_iter == 0
    np.testing.assert_allclose(
        np.asarray(warm.alpha), np.asarray(cold.alpha), rtol=1e-12
    )


# ---------------------------------------------------------------------------
# the shard_map replication checker stays ON for the pallas impl too
# (round-4 verdict item 3): pallas_call outputs declare their varying mesh
# axes via the out_shape vma (ops/pallas_matvec._vma_set), so a mis-specced
# collective in the hand-rolled ring is caught at TRACE time on every impl —
# verified here by tracing the pallas solvers on the CPU mesh (vma checking
# happens during abstract evaluation, before any Mosaic lowering)
# ---------------------------------------------------------------------------


def test_check_vma_enabled_on_all_sharded_builders():
    import inspect

    from plssvm_tpu.parallel import sharded as sh

    src = inspect.getsource(sh)
    assert "check_vma=True" in src
    # no impl-scoped disabling left anywhere
    assert 'check_vma=(impl != "pallas")' not in src
    assert "check_vma=False" not in src


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_sharded_solvers_trace_under_replication_checker(mesh, impl):
    from plssvm_tpu.parallel.sharded import (
        build_sharded_multi_solver,
        build_sharded_one_class_solver,
    )

    dtype = np.float32
    m_pad, d = NDEV * 128, 128
    X = np.zeros((m_pad, d), dtype)
    y = np.ones(m_pad, dtype)
    mask = np.ones(m_pad, dtype)
    args = shard_arrays(mesh, X, X[0], y, 1.0, mask, dtype)
    scal = (
        jnp.asarray(0.01, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(1e-3, dtype),
        jnp.asarray(2, jnp.int32),
    )
    solver = build_sharded_solver(
        mesh, kind=KernelFunctionType.RBF, degree=3, impl=impl
    )
    out = jax.eval_shape(solver, *args, *scal)
    assert out.x.shape == (m_pad,)

    Y3 = np.ones((m_pad, 3), dtype)
    args3 = shard_arrays(mesh, X, X[0], Y3, np.ones(3, dtype), mask, dtype)
    msolver = build_sharded_multi_solver(
        mesh, kind=KernelFunctionType.RBF, degree=3, impl=impl
    )
    out3 = jax.eval_shape(msolver, *args3, *scal)
    assert out3.x.shape == (m_pad, 3)

    oc = build_sharded_one_class_solver(
        mesh, kind=KernelFunctionType.RBF, degree=3, impl=impl
    )
    out_oc = jax.eval_shape(
        oc, args[0], args[4], scal[0], scal[1],
        jnp.asarray(1.0, dtype), scal[3], scal[4],
    )
    assert out_oc[0].shape == (m_pad,)


@pytest.mark.parametrize(
    "kind", [KernelFunctionType.LAPLACIAN, KernelFunctionType.CHI_SQUARED]
)
def test_sharded_distance_pallas_traces_under_checker(mesh, kind):
    """The fused distance kernels ride the ring too (round 6): the pallas
    impl must trace under the replication checker for the binary and
    one-class solvers (real-TPU execution parity is checked in the
    verify-skill drive; CPU cannot run Mosaic)."""
    from plssvm_tpu.parallel.sharded import build_sharded_one_class_solver

    dtype = np.float32
    m_pad, d = NDEV * 128, 128
    X = np.zeros((m_pad, d), dtype)
    y = np.ones(m_pad, dtype)
    mask = np.ones(m_pad, dtype)
    args = shard_arrays(mesh, X, X[0], y, 1.0, mask, dtype)
    scal = (
        jnp.asarray(0.05, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(1e-3, dtype),
        jnp.asarray(2, jnp.int32),
    )
    solver = build_sharded_solver(mesh, kind=kind, degree=3, impl="pallas")
    out = jax.eval_shape(solver, *args, *scal)
    assert out.x.shape == (m_pad,)
    oc = build_sharded_one_class_solver(
        mesh, kind=kind, degree=3, impl="pallas"
    )
    out_oc = jax.eval_shape(
        oc, args[0], args[4], scal[0], scal[1],
        jnp.asarray(1.0, dtype), scal[3], scal[4],
    )
    assert out_oc[0].shape == (m_pad,)
    # the fused distance MATMAT ring (multiclass block solve)
    from plssvm_tpu.parallel.sharded import build_sharded_multi_solver

    Y3 = np.ones((m_pad, 3), dtype)
    args3 = shard_arrays(mesh, X, X[0], Y3, np.ones(3, dtype), mask, dtype)
    msolver = build_sharded_multi_solver(
        mesh, kind=kind, degree=3, impl="pallas"
    )
    out3 = jax.eval_shape(msolver, *args3, *scal)
    assert out3.x.shape == (m_pad, 3)


def test_sharded_impl_distance_gating():
    """Distance kernels get the pallas ring on TPU meshes for the binary
    matvec only; the multiclass matmat and non-TPU meshes stay XLA."""

    class _FakeTPU:
        platform = "tpu"

    svm = plssvm_tpu.CSVM(kernel_type="laplacian", gamma=0.1)
    svm.backend = plssvm_tpu.BackendType.PALLAS
    svm.devices = [_FakeTPU(), _FakeTPU()]
    assert svm._sharded_impl(
        KernelFunctionType.LAPLACIAN, (256, 128), 2
    ) == "pallas"
    assert svm._sharded_impl(
        KernelFunctionType.CHI_SQUARED, (256, 128), 2
    ) == "pallas"
    # multiclass matmat: the fused distance matmat covers it too
    assert svm._sharded_impl(
        KernelFunctionType.LAPLACIAN, (256, 128), 2, n_classes=3
    ) == "pallas"
    # unpadded per-chip rows -> XLA
    assert svm._sharded_impl(
        KernelFunctionType.LAPLACIAN, (250, 128), 2
    ) == "xla"
    # CPU mesh -> XLA
    svm.devices = jax.devices("cpu")[:2]
    assert svm._sharded_impl(
        KernelFunctionType.LAPLACIAN, (256, 128), 2
    ) == "xla"


@pytest.mark.parametrize("ndev", [2, 3])
@pytest.mark.parametrize("matmat", [False, True])
@pytest.mark.parametrize(
    "kind", [KernelFunctionType.LAPLACIAN, KernelFunctionType.CHI_SQUARED]
)
def test_distance_ring_pallas_interpret(ndev, matmat, kind):
    """The fused distance ring (matvec AND matmat) must match the dense
    distance kernel — interpret mode on small CPU meshes (covers the
    half-step rect path at P=2 and the dual + ppermute-back at P=3)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding, PartitionSpec as P

    from plssvm_tpu.parallel.sharded import (
        ring_kernel_matmat, ring_kernel_matvec,
    )

    devs = jax.devices("cpu")
    if len(devs) < ndev:
        pytest.skip("needs virtual CPU devices")
    small_mesh = make_row_mesh(devs[:ndev])

    rng = np.random.default_rng(13)
    m, d = ndev * 128, 128
    X = np.abs(rng.normal(size=(m, d))).astype(np.float32) * 0.3
    v = rng.normal(size=(m, 3) if matmat else (m,)).astype(np.float32)
    gamma = np.float32(0.5 / d)
    sq = np.sum(X * X, axis=1)
    Xf = X.astype(np.float64)
    if kind == KernelFunctionType.LAPLACIAN:
        D = np.abs(Xf[:, None, :] - Xf[None, :, :]).sum(-1)
    else:
        num = (Xf[:, None, :] - Xf[None, :, :]) ** 2
        den = Xf[:, None, :] + Xf[None, :, :]
        D = np.divide(num, den, out=np.zeros_like(num),
                      where=den != 0).sum(-1)
    K = np.exp(-gamma * D)
    expected = K @ v.astype(np.float64)

    ring = ring_kernel_matmat if matmat else ring_kernel_matvec
    fn = jax.jit(
        jax.shard_map(
            lambda Xl, sql, vl: ring(
                Xl, sql, vl, gamma, np.float32(0.0),
                kind=kind, degree=3, axis_name=ROW_AXIS, num_devices=ndev,
                impl="pallas",
            ),
            mesh=small_mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS),
                      P(ROW_AXIS, None) if matmat else P(ROW_AXIS)),
            out_specs=P(ROW_AXIS, None) if matmat else P(ROW_AXIS),
            check_vma=True,
        )
    )
    Xs = jax.device_put(
        jnp.asarray(X), NamedSharding(small_mesh, P(ROW_AXIS, None))
    )
    sqs = jax.device_put(
        jnp.asarray(sq), NamedSharding(small_mesh, P(ROW_AXIS))
    )
    vs = jax.device_put(
        jnp.asarray(v),
        NamedSharding(
            small_mesh, P(ROW_AXIS, None) if matmat else P(ROW_AXIS)
        ),
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.device_get(fn(Xs, sqs, vs)), np.float64)
    np.testing.assert_allclose(got, expected, rtol=5e-5, atol=5e-5)
