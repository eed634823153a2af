"""CG solver tests.

reference analog: tests/backends/generic_csvm_tests.hpp —
``solve_system_of_linear_equations_trivial`` uses data engineered so the
implicit matrix is easy (generic_csvm_tests.hpp:99-137); here we also verify
against a dense direct solve (golden.solve_dense).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import golden
from conftest import make_blobs
from plssvm_tpu.parameter import KernelFunctionType
from plssvm_tpu.solver.cg import solve_ls_svm

KINDS = {
    "linear": KernelFunctionType.LINEAR,
    "polynomial": KernelFunctionType.POLYNOMIAL,
    "rbf": KernelFunctionType.RBF,
}


def run_solve(X, y, kind="linear", gamma=1.0, coef0=0.0, degree=3, cost=1.0,
              eps=1e-10, max_iter=None, impl="xla", pad_to=None):
    """Host-side wrapper: pad + call the jitted solver (mirrors CSVM.fit)."""
    n, d = X.shape
    dept = n - 1
    m = pad_to if pad_to is not None else dept
    Xp = np.zeros((m, d))
    Xp[:dept] = X[:dept]
    yp = np.zeros(m)
    yp[:dept] = y[:dept]
    mask = np.zeros(m)
    mask[:dept] = 1.0
    res = solve_ls_svm(
        jnp.asarray(Xp), jnp.asarray(X[-1].astype(np.float64)), jnp.asarray(yp),
        jnp.asarray(float(y[-1])), jnp.asarray(mask),
        jnp.asarray(gamma), jnp.asarray(coef0), jnp.asarray(cost),
        jnp.asarray(eps), jnp.asarray(max_iter or n, jnp.int32),
        kind=KINDS[kind], degree=degree, impl=impl, row_block=8,
    )
    alpha = np.concatenate([np.asarray(res.x)[:dept], [float(res.alpha_last)]])
    return alpha, float(res.rho), int(res.iterations)


class TestCGSolver:
    def test_matches_dense_direct_solve(self, kernel_name):
        X, y = make_blobs(24, 5, seed=7)
        y = y.astype(np.float64)
        gamma, coef0, degree, cost = 0.2, 1.0, 3, 1.0
        alpha, rho, iters = run_solve(
            X, y, kernel_name, gamma=gamma, coef0=coef0, degree=degree, cost=cost,
            max_iter=5000,
        )
        expected_alpha, expected_rho = golden.solve_dense(
            X, y, cost=cost, kind=kernel_name, gamma=gamma, coef0=coef0, degree=degree
        )
        np.testing.assert_allclose(alpha, expected_alpha, rtol=1e-3, atol=1e-6)
        assert rho == pytest.approx(expected_rho, rel=1e-4, abs=1e-6)

    def test_padding_invariance(self):
        """Zero-padding the dept axis must not change the solution (the RBF
        padding trap from SURVEY.md §7)."""
        X, y = make_blobs(20, 4, seed=8)
        y = y.astype(np.float64)
        a1, rho1, _ = run_solve(X, y, "rbf", gamma=0.3)
        a2, rho2, _ = run_solve(X, y, "rbf", gamma=0.3, pad_to=64)
        np.testing.assert_allclose(a1, a2, rtol=1e-9, atol=1e-12)
        assert rho1 == pytest.approx(rho2, rel=1e-9)

    def test_alpha_sums_to_zero(self, kernel_name):
        """sum(alpha) == 0 by construction (last alpha = -sum of the rest)."""
        X, y = make_blobs(16, 3, seed=9)
        alpha, _, _ = run_solve(X, y.astype(np.float64), kernel_name, gamma=0.5)
        assert np.sum(alpha) == pytest.approx(0.0, abs=1e-9)

    def test_max_iter_respected(self):
        X, y = make_blobs(32, 4, seed=10)
        _, _, iters = run_solve(X, y.astype(np.float64), "rbf", gamma=0.5,
                                eps=1e-14, max_iter=3)
        assert iters <= 3

    def test_exact_residual_cadence_improves_long_runs(self):
        """Runs longer than 50 iterations still converge (exercises the
        every-50th exact-residual branch, gpu_csvm.hpp:595-609)."""
        rng = np.random.default_rng(11)
        n, d = 96, 64
        X = rng.normal(size=(n, d))
        y = np.sign(rng.normal(size=n))
        y[y == 0] = 1.0
        alpha, rho, iters = run_solve(X, y, "linear", cost=1000.0, eps=1e-8)
        expected_alpha, expected_rho = golden.solve_dense(X, y, cost=1000.0, kind="linear")
        # hard problem: solutions agree to CG tolerance
        np.testing.assert_allclose(alpha, expected_alpha, rtol=1e-3, atol=1e-5)
        assert iters > 50


class TestTrivialSystem:
    def test_identity_like_system(self):
        """Data engineered so solving is trivial: one-hot rows scaled by
        1/sqrt(2) with the last row zero make K = I/2 on the dept block
        (reference: generic_csvm_tests.hpp:99-137 uses the same trick)."""
        dept = 4
        X = np.zeros((dept + 1, dept))
        for i in range(dept):
            X[i, i] = 1.0
        y = np.array([1.0, 1.0, -1.0, -1.0, 1.0])
        cost = 4.0
        # A_hat = K + QA - q_i - q_j + I/C; x_last = 0 -> q = 0, QA = 0 + 1/C
        # A_hat = I (K=I on diag ... ) sanity-check against the dense solve
        alpha, rho, iters = run_solve(X, y, "linear", cost=cost, eps=1e-12)
        expected_alpha, expected_rho = golden.solve_dense(X, y, cost=cost, kind="linear")
        np.testing.assert_allclose(alpha, expected_alpha, rtol=1e-8, atol=1e-10)
        assert rho == pytest.approx(expected_rho, rel=1e-8)


class TestJacobiPreconditioner:
    """Optional PCG (solver/cg.py preconditioner='jacobi').

    Jacobi helps when diag(A_hat) varies over orders of magnitude — e.g. the
    polynomial kernel on rows with heterogeneous norms — and must always
    converge to the same solution as plain CG.
    """

    def _varied_norm_problem(self, n=400, d=20, seed=13):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(n, d)) * rng.uniform(0.2, 5.0, size=(n, 1))
        y = np.where(X[:, 0] > 0, 1, -1)
        return X, y

    def test_same_solution(self):
        import plssvm_tpu

        from conftest import make_blobs

        X, y = make_blobs(300, 8, seed=13)
        data = plssvm_tpu.DataSet(X, y)
        plain = plssvm_tpu.CSVM(kernel_type="rbf", dtype=np.float64)
        pcg = plssvm_tpu.CSVM(
            kernel_type="rbf", dtype=np.float64, preconditioner="jacobi"
        )
        m_plain = plain.fit(data, epsilon=1e-12, max_iter=5000)
        m_pcg = pcg.fit(data, epsilon=1e-12, max_iter=5000)
        np.testing.assert_allclose(m_pcg.alpha, m_plain.alpha, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(m_pcg.rho, m_plain.rho, rtol=1e-6, atol=1e-8)

    def test_fewer_iterations_for_poly_varied_norms(self):
        import plssvm_tpu

        X, y = self._varied_norm_problem()
        data = plssvm_tpu.DataSet(X, y)
        plain = plssvm_tpu.CSVM(
            kernel_type="polynomial", coef0=1.0, cost=100.0, dtype=np.float64
        )
        pcg = plssvm_tpu.CSVM(
            kernel_type="polynomial", coef0=1.0, cost=100.0,
            dtype=np.float64, preconditioner="jacobi",
        )
        it_plain = plain.fit(data, epsilon=1e-8, max_iter=3000).n_iter
        it_pcg = pcg.fit(data, epsilon=1e-8, max_iter=3000).n_iter
        assert it_pcg < it_plain

    def test_all_kernels_converge(self, kernel_name):
        import plssvm_tpu

        from conftest import make_blobs

        X, y = make_blobs(200, 8, seed=7)
        data = plssvm_tpu.DataSet(X, y)
        svm = plssvm_tpu.CSVM(
            kernel_type=kernel_name, coef0=1.0, dtype=np.float64,
            preconditioner="jacobi",
        )
        model = svm.fit(data, epsilon=1e-8)
        assert svm.score(model) >= 0.9

    def test_invalid_preconditioner_rejected(self):
        import plssvm_tpu
        import pytest

        with pytest.raises(plssvm_tpu.InvalidParameterError):
            plssvm_tpu.CSVM(preconditioner="ilu")


class TestLargeProblemGuards:
    def test_pallas_operand_ceiling_value(self):
        from plssvm_tpu.solver.cg import PALLAS_MAX_OPERAND_BYTES

        # the per-pallas_call 32-bit-offset ceiling: 1M x 1k f32 (the
        # north-star single-chip shape) must be CHUNKED by
        # kernel_matvec_pallas_big; 200k x 1k fits one call
        assert (1 << 20) * 1024 * 4 > PALLAS_MAX_OPERAND_BYTES
        assert 204800 * 1024 * 4 <= PALLAS_MAX_OPERAND_BYTES


class TestCompensatedScalars:
    """Double-float CG scalar accumulation (SURVEY §7 hard-part #1)."""

    def test_compensated_sum_beats_plain_f32(self):
        from plssvm_tpu.solver.cg import compensated_sum

        # adversarial cancellation: many tiny values drowned by a huge pair
        rng = np.random.default_rng(0)
        tiny = rng.normal(size=4094).astype(np.float32) * 1e-3
        x = np.concatenate([[1e8], tiny, [-1e8]]).astype(np.float32)
        exact = float(np.sum(x.astype(np.float64)))
        comp = float(compensated_sum(jnp.asarray(x)))
        plain = float(jnp.sum(jnp.asarray(x)))
        assert abs(comp - exact) < 1e-3 * abs(exact)
        assert abs(comp - exact) <= abs(plain - exact)

    def test_compensated_dot_matches_f64(self):
        from plssvm_tpu.solver.cg import compensated_dot

        rng = np.random.default_rng(1)
        a = (rng.normal(size=8192) * np.exp(rng.normal(size=8192) * 4)).astype(
            np.float32
        )
        b = rng.normal(size=8192).astype(np.float32)
        exact = float(a.astype(np.float64) @ b.astype(np.float64))
        comp = float(compensated_dot(jnp.asarray(a), jnp.asarray(b)))
        # products are rounded in f32 (irreducible without fma) but the
        # accumulation itself must be f64-grade
        assert comp == pytest.approx(exact, rel=2e-5)

    def test_f32_compensated_iteration_parity_with_f64(self):
        """On an ill-conditioned problem, f32 CG with compensated scalars
        must track the f64 solve's iteration count (VERDICT r1 #6)."""
        rng = np.random.default_rng(5)
        n, d = 96, 6
        # heterogeneous norms -> wide spectrum of the poly Gram matrix
        scales = np.exp(rng.normal(size=(n, 1)) * 1.5)
        X = rng.normal(size=(n, d)) * scales
        y = np.where(rng.normal(size=n) > 0, 1.0, -1.0)
        y[0] = 1.0
        y[1] = -1.0

        def solve(dtype, scalars):
            Xc = X.astype(dtype)
            dept = n - 1
            res = solve_ls_svm(
                jnp.asarray(Xc[:dept]), jnp.asarray(Xc[-1]),
                jnp.asarray(y[:dept].astype(dtype)), jnp.asarray(dtype(y[-1])),
                jnp.asarray(np.ones(dept, dtype)),
                jnp.asarray(dtype(0.05)), jnp.asarray(dtype(1.0)),
                jnp.asarray(dtype(1.0)), jnp.asarray(dtype(1e-5)),
                jnp.asarray(4 * n, jnp.int32),
                kind=KernelFunctionType.POLYNOMIAL, degree=3, impl="xla",
                row_block=dept, scalars=scalars,
            )
            return int(res.iterations), float(res.delta), float(res.delta0)

        it64, _, _ = solve(np.float64, "plain")
        it32c, d32, d032 = solve(np.float32, "compensated")
        # converged (not just hit max_iter) and within 25% of the f64 count
        assert d32 <= 1e-10 * d032 * 1.01 or it32c < 4 * n
        assert it32c <= it64 * 1.25 + 2


class TestGramPrecision:
    """gram_precision (bf16 / f32 / highest) through the Pallas solve path.

    The fast tier runs the CG iterations; the initial and every-50th exact
    residuals always run at "highest" (solver.cg._gram_pair_precisions) so
    the convergence decision stays trustworthy — the TPU answer to the
    reference's all-f64 solve (gpu_csvm.hpp:617-619)."""

    def _solve(self, gram_precision, max_iter=600):
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.default_rng(11)
        n, d = 129, 16  # pads to m=128 rows (dept=128), d stays 16
        X = rng.normal(size=(n, d))
        y = np.where(X[:, 0] + 0.2 * rng.normal(size=n) > 0, 1.0, -1.0)
        dept = n - 1
        m = 128
        Xp = np.zeros((m, d), np.float32)
        Xp[:dept] = X[:dept]
        yp = np.zeros(m, np.float32)
        yp[:dept] = y[:dept]
        mask = np.ones(m, np.float32)
        with pltpu.force_tpu_interpret_mode():
            res = solve_ls_svm(
                jnp.asarray(Xp), jnp.asarray(X[-1], jnp.float32),
                jnp.asarray(yp), jnp.asarray(np.float32(y[-1])),
                jnp.asarray(mask),
                jnp.asarray(np.float32(0.1)), jnp.asarray(np.float32(0.0)),
                jnp.asarray(np.float32(10.0)), jnp.asarray(np.float32(1e-6)),
                jnp.asarray(max_iter, jnp.int32),
                kind=KernelFunctionType.RBF, degree=3, impl="pallas",
                row_block=128, gram_precision=gram_precision,
            )
        alpha = np.concatenate(
            [np.asarray(res.x)[:dept], [float(res.alpha_last)]]
        )
        return alpha, float(res.rho), int(res.iterations), (
            float(res.delta), float(res.delta0))

    @pytest.mark.parametrize("gp", ["bf16", "f32", "highest"])
    def test_converges_and_matches_f32(self, gp):
        a_ref, rho_ref, _, _ = self._solve("f32")
        a, rho, iters, (delta, delta0) = self._solve(gp)
        # converged (relative residual met), not max_iter exhaustion
        assert delta <= 1e-12 * delta0 * 1.01 or iters < 600
        # all precisions solve the same well-conditioned system; bf16
        # perturbs the operator by ~5e-4 elementwise -> ~1e-2 solution norm
        # deviation (measured), "highest" is bit-identical in interpret mode
        rel = np.linalg.norm(a - a_ref) / np.linalg.norm(a_ref)
        assert rel < (5e-2 if gp == "bf16" else 1e-6)
        assert rho == pytest.approx(rho_ref, abs=5e-3)

    def test_invalid_precision_rejected(self):
        from plssvm_tpu.ops.pallas_matvec import _dot_prec

        with pytest.raises(ValueError, match="unknown gram precision"):
            _dot_prec("f16")

    def test_csvm_validates_gram_precision(self):
        import plssvm_tpu
        from plssvm_tpu.exceptions import InvalidParameterError

        with pytest.raises(InvalidParameterError, match="gram_precision"):
            plssvm_tpu.CSVM(gram_precision="f64")

    def test_csvm_accepts_and_stores(self):
        import plssvm_tpu

        svm = plssvm_tpu.CSVM(gram_precision="bf16")
        assert svm.gram_precision == "bf16"
