"""Death-test parity: the assertion layer + fit/predict precondition raises.

reference: tests/backends/generic_csvm_tests.hpp:265-360 runs dedicated
DeathTest suites asserting that every precondition violation of
solve_system_of_linear_equations / predict_values dies with its exact
message.  Python raises instead of aborting, so the inventory maps to
exception tests: each reference EXPECT_DEATH case below cites its line.
The assertion layer itself (utils/assertions.py = detail/assert.hpp's
PLSSVM_ASSERT) is covered directly: location info, formatting, and the
independent enable/disable switch.
"""

import subprocess
import sys

import numpy as np
import pytest

from plssvm_tpu import CSVM, DataSet, Model
from plssvm_tpu.exceptions import DataSetError, InvalidParameterError
from plssvm_tpu.utils import assertions
from plssvm_tpu.utils.assertions import (
    AssertionFailedError,
    asserts_enabled,
    plssvm_assert,
)


# ---------------------------------------------------------------------------
# the assertion layer itself (detail/assert.hpp parity)
# ---------------------------------------------------------------------------


def test_plssvm_assert_passes_on_true():
    plssvm_assert(True, "never raised")
    plssvm_assert(1 == 1, "never raised {}", 42)


def test_plssvm_assert_raises_with_location():
    with pytest.raises(AssertionFailedError) as exc_info:
        plssvm_assert(False, "the answer is {}", 42)
    msg = str(exc_info.value)
    # PLSSVM_ASSERT prints the failed condition's source location
    # (detail/assert.hpp: file, line, function) and the fmt'ed message
    assert "test_assertions.py" in msg
    assert "test_plssvm_assert_raises_with_location" in msg
    assert "the answer is 42" in msg


def test_plssvm_assert_kwargs_formatting():
    with pytest.raises(AssertionFailedError, match="got 3 of 7"):
        plssvm_assert(False, "got {a} of {b}", a=3, b=7)


def test_plssvm_assert_is_an_assertion_error():
    # AssertionFailedError must be catchable as AssertionError (the Python
    # analog of an assert) without being a plain `assert` (which -O strips)
    assert issubclass(AssertionFailedError, AssertionError)


def test_asserts_enabled_by_default():
    assert asserts_enabled()


def test_plssvm_assert_disable_switch(monkeypatch):
    # PLSSVM_ASSERT is toggleable independently of NDEBUG
    # (CMakeLists.txt:469-472); here: PLSSVM_TPU_DISABLE_ASSERTS
    monkeypatch.setattr(assertions, "_ENABLED", False)
    plssvm_assert(False, "must not raise while disabled")
    monkeypatch.setattr(assertions, "_ENABLED", True)
    with pytest.raises(AssertionFailedError):
        plssvm_assert(False, "raises again")


def test_disable_asserts_env_var_respected():
    # the env switch is read at import time — check in a fresh interpreter
    code = (
        "from plssvm_tpu.utils.assertions import plssvm_assert, "
        "asserts_enabled\n"
        "assert not asserts_enabled()\n"
        "plssvm_assert(False, 'silent')\n"
        "print('OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True,
        env={
            **__import__("os").environ,
            "PLSSVM_TPU_DISABLE_ASSERTS": "1",
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


def test_checkify_assert_inside_jit():
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify

    from plssvm_tpu.utils.assertions import checkify_assert

    def fn(x):
        checkify_assert(jnp.all(jnp.isfinite(x)), "non-finite values in x")
        return x * 2

    with jax.default_device(jax.devices("cpu")[0]):
        err, out = jax.jit(checkify.checkify(fn))(jnp.ones(3))
        err.throw()  # no error on finite input
        err, out = jax.jit(checkify.checkify(fn))(jnp.array([1.0, jnp.inf]))
        with pytest.raises(Exception, match="non-finite"):
            err.throw()


# ---------------------------------------------------------------------------
# solve_system preconditions (generic_csvm_tests.hpp:264-303)
# ---------------------------------------------------------------------------


def _problem(n=12, d=3, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    y = np.where(X[:, 0] > 0, 1, -1)
    return X, y


@pytest.fixture(scope="module")
def svm():
    return CSVM(backend="xla", dtype=np.float64)


def test_fit_empty_data_rejected():
    # "The data must not be empty!" (generic_csvm_tests.hpp:279)
    with pytest.raises(DataSetError, match="The data must not be empty!"):
        DataSet(np.empty((0, 3)), np.empty(0))


def test_fit_empty_features_rejected():
    # "The data points must contain at least one feature!" (hpp:282)
    with pytest.raises(
        DataSetError, match="must contain at least one feature"
    ):
        DataSet(np.empty((5, 0)), np.ones(5))


def test_fit_ragged_rows_rejected():
    # "All data points must have the same number of features!" (hpp:285)
    with pytest.raises(
        DataSetError, match="same number of features"
    ):
        DataSet([[1.0, 2.0], [1.0]], [1, -1])


def test_fit_label_count_mismatch_rejected():
    # "... data points in the matrix A (2) and the values in the right hand
    # side vector (0) must be the same!" (hpp:294)
    with pytest.raises(DataSetError, match=r"labels \(4\).*\(5\)"):
        DataSet(np.ones((5, 3)), np.ones(4))


@pytest.mark.parametrize("bad_eps", [0.0, -0.1])
def test_fit_nonpositive_epsilon_rejected(svm, bad_eps):
    # "The stopping criterion in the CG algorithm must be greater than 0.0"
    # (hpp:297-299); API wording follows csvm.hpp:284
    X, y = _problem()
    with pytest.raises(InvalidParameterError, match="epsilon"):
        svm.fit(DataSet(X, y, dtype=np.float64), epsilon=bad_eps)


def test_fit_zero_max_iter_rejected(svm):
    # "The number of CG iterations must be greater than 0!" (hpp:302)
    X, y = _problem()
    with pytest.raises(InvalidParameterError, match="max_iter"):
        svm.fit(DataSet(X, y, dtype=np.float64), max_iter=0)


def test_fit_unlabeled_data_rejected(svm):
    X, y = _problem()
    with pytest.raises(InvalidParameterError, match="No labels"):
        svm.fit(DataSet(X, dtype=np.float64))


def test_fit_single_class_rejected():
    X, _ = _problem()
    with pytest.raises(DataSetError, match="two different labels"):
        DataSet(X, np.ones(X.shape[0]))


def test_fit_bad_checkpoint_interval_rejected(svm, tmp_path):
    X, y = _problem()
    with pytest.raises(InvalidParameterError, match="checkpoint_interval"):
        svm.fit(
            DataSet(X, y, dtype=np.float64),
            checkpoint_path=str(tmp_path / "c.ckpt"), checkpoint_interval=0,
        )


def test_fit_bad_sample_weight_rejected(svm):
    X, y = _problem()
    ds = DataSet(X, y, dtype=np.float64)
    with pytest.raises(InvalidParameterError, match="sample_weight"):
        svm.fit(ds, sample_weight=np.ones(3))
    with pytest.raises(InvalidParameterError, match="positive"):
        svm.fit(ds, sample_weight=np.zeros(X.shape[0]))


def test_fit_initial_model_size_mismatch_rejected(svm):
    X, y = _problem()
    ds = DataSet(X, y, dtype=np.float64)
    model = svm.fit(ds)
    X2, y2 = _problem(n=20, seed=1)
    with pytest.raises(InvalidParameterError, match="initial_model"):
        svm.fit(DataSet(X2, y2, dtype=np.float64), initial_model=model)


# ---------------------------------------------------------------------------
# predict preconditions (generic_csvm_tests.hpp:306-360)
# ---------------------------------------------------------------------------


def test_model_alpha_sv_count_mismatch_asserts():
    # "The number of support vectors (2) and number of weights (1) must be
    # the same!" (generic_csvm_tests.hpp:337)
    X, y = _problem()
    ds = DataSet(X, y, dtype=np.float64)
    from plssvm_tpu.parameter import Parameter

    with pytest.raises(
        AssertionFailedError,
        match=r"number of support vectors \(12\) and number of weights \(4\)",
    ):
        Model(Parameter(), ds, alpha=np.ones(4), rho=0.0)


def test_predict_feature_count_mismatch_rejected(svm):
    # "The number of features in the support vectors (2) must be the same as
    # in the data points to predict (1)!" (hpp:357)
    X, y = _problem(d=3)
    model = svm.fit(DataSet(X, y, dtype=np.float64))
    with pytest.raises(
        InvalidParameterError, match=r"features per data point \(5\)"
    ):
        svm.predict(model, DataSet(np.ones((2, 5)), dtype=np.float64))


def test_predict_empty_points_rejected(svm):
    # "The data points to predict must not be empty!" (hpp:345)
    with pytest.raises(DataSetError, match="must not be empty"):
        DataSet(np.empty((0, 3)))


def test_score_unlabeled_data_rejected(svm):
    X, y = _problem()
    ds = DataSet(X, y, dtype=np.float64)
    model = svm.fit(ds)
    with pytest.raises(InvalidParameterError, match="must have labels"):
        svm.score(model, DataSet(X, dtype=np.float64))


def test_gamma_nonpositive_rejected():
    # "gamma must be greater than 0.0, but is ...!" (csvm.hpp:385)
    with pytest.raises(InvalidParameterError, match="gamma"):
        CSVM(backend="xla", kernel_type="rbf", gamma=-1.0)


class TestDebugNaNGuards:
    """CSVM(debug=True): checkify NaN/Inf guards on the CG state.

    Without the guard a poisoned input silently terminates the loop
    "converged" (``NaN > target`` is False) and the fit returns garbage;
    with it the solve raises a located JaxRuntimeError.  Extends SURVEY
    §5's sanitizer row beyond the reference's nothing (round-4 verdict
    item 7).
    """

    def _poisoned(self, n=48, d=6, n_classes=2, seed=3):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(n, d))
        if n_classes == 2:
            y = np.where(X[:, 0] > 0, 1, -1)
        else:
            y = rng.integers(0, n_classes, size=n)
            y[:n_classes] = np.arange(n_classes)
        X[5, 3] = np.nan
        return DataSet(X, y, dtype=np.float64)

    def _raises_located(self, fn):
        from jax.experimental.checkify import JaxRuntimeError

        with pytest.raises(JaxRuntimeError, match="non-finite"):
            fn()

    @pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
    def test_poisoned_binary_raises_on_both_solvers(self, solver):
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   solver=solver, debug=True)
        self._raises_located(lambda: svm.fit(self._poisoned()))

    def test_unchecked_poisoned_fit_is_silent_garbage(self):
        # the failure mode the guard exists for: without debug the loop
        # exits immediately "converged" with a NaN model
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        model = svm.fit(self._poisoned())
        assert model.n_iter == 0
        assert np.isnan(model.rho)

    @pytest.mark.parametrize("solver", ["cg_implicit", "cg_explicit"])
    def test_poisoned_multiclass_raises(self, solver):
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   solver=solver, debug=True)
        self._raises_located(
            lambda: svm.fit(self._poisoned(n_classes=3))
        )

    def test_poisoned_oao_batched_raises(self):
        # the batched pair solve (solver.cg.solve_ls_svm_pairs) guards too
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   oao_batch="batched", debug=True)
        self._raises_located(
            lambda: svm.fit(
                self._poisoned(n_classes=3), classification="oao"
            )
        )

    def test_poisoned_one_class_raises(self):
        from plssvm_tpu import fit_one_class

        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   debug=True)
        self._raises_located(
            lambda: fit_one_class(svm, self._poisoned(), nu=0.2)
        )

    def test_poisoned_sharded_fit_raises(self):
        """checkify functionalizes through shard_map: the SAME guards run
        on multi-device meshes (parallel.sharded._finalize_solver)."""
        import jax

        devs = jax.devices("cpu")
        if len(devs) < 4:
            pytest.skip("needs 4 virtual CPU devices")
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   devices=devs[:4], debug=True)
        self._raises_located(lambda: svm.fit(self._poisoned()))

    def test_poisoned_multihost_fit_raises(self, tmp_path):
        import jax

        from plssvm_tpu.io.libsvm import write_libsvm_file
        from plssvm_tpu.parallel import multihost as mh
        from plssvm_tpu.parallel.sharded import make_row_mesh

        devs = jax.devices("cpu")
        if len(devs) < 4:
            pytest.skip("needs 4 virtual CPU devices")
        ds = self._poisoned()
        f = str(tmp_path / "bad.libsvm")
        write_libsvm_file(f, np.asarray(ds.data), np.asarray(ds.labels))
        orig = mh.global_row_mesh
        mh.global_row_mesh = lambda: make_row_mesh(devs[:4])
        try:
            svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                       debug=True)
            self._raises_located(lambda: svm.fit_multihost(f))
        finally:
            mh.global_row_mesh = orig

    def test_poisoned_checkpointed_fit_raises(self, tmp_path):
        svm = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                   debug=True)
        self._raises_located(
            lambda: svm.fit(
                self._poisoned(),
                checkpoint_path=str(tmp_path / "dbg.ckpt"),
                checkpoint_interval=4,
            )
        )

    def test_clean_fit_unchanged_under_debug(self):
        X, y = _problem(n=40, d=4)
        ds = DataSet(X, y, dtype=np.float64)
        plain = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf")
        checked = CSVM(backend="xla", dtype=np.float64, kernel_type="rbf",
                       debug=True)
        m0 = plain.fit(ds, epsilon=1e-8)
        m1 = checked.fit(ds, epsilon=1e-8)
        assert m1.n_iter == m0.n_iter
        np.testing.assert_array_equal(
            np.asarray(m1.alpha), np.asarray(m0.alpha)
        )


def test_cli_debug_flag_reports_numeric_failure(tmp_path, capsys):
    """plssvm-train --debug: a poisoned input exits 1 with the located
    numeric-check message, not a JAX traceback."""
    from plssvm_tpu.cli import train as cli_train
    from plssvm_tpu.io.libsvm import write_libsvm_file

    rng = np.random.default_rng(0)
    X = rng.normal(size=(30, 4))
    y = np.where(X[:, 0] > 0, 1, -1)
    X[2, 1] = np.nan
    f = str(tmp_path / "bad.libsvm")
    write_libsvm_file(f, X, y)
    rc = cli_train.main(
        ["-q", "--use_double_as_real_type", "--debug", f,
         str(tmp_path / "m.model")]
    )
    assert rc == 1
    err = capsys.readouterr().err
    assert "numeric check failed" in err and "non-finite" in err
