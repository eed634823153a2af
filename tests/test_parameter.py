"""Parameter / DefaultValue / enum tests.

reference analog: tests/parameter.cpp, tests/default_value.cpp,
tests/kernel_function_types.cpp, tests/backend_types.cpp.
"""

import pytest

from plssvm_tpu import (
    BackendType,
    FileFormatType,
    KernelFunctionType,
    Parameter,
    TargetPlatform,
)
from plssvm_tpu.exceptions import InvalidParameterError, UnsupportedKernelTypeError
from plssvm_tpu.parameter import DefaultValue


class TestDefaultValue:
    def test_starts_default(self):
        dv = DefaultValue(3)
        assert dv.is_default()
        assert dv.value == 3

    def test_set_clears_default(self):
        dv = DefaultValue(3)
        dv.value = 5
        assert not dv.is_default()
        assert dv.value == 5
        assert dv.get_default() == 3

    def test_reset(self):
        dv = DefaultValue(3)
        dv.value = 5
        dv.reset()
        assert dv.is_default() and dv.value == 3

    def test_copy_independent(self):
        dv = DefaultValue(1)
        cp = dv.copy()
        cp.value = 9
        assert dv.is_default() and not cp.is_default()


class TestKernelFunctionType:
    @pytest.mark.parametrize(
        "text,expected",
        [
            ("linear", KernelFunctionType.LINEAR),
            ("polynomial", KernelFunctionType.POLYNOMIAL),
            ("poly", KernelFunctionType.POLYNOMIAL),
            ("rbf", KernelFunctionType.RBF),
            ("0", KernelFunctionType.LINEAR),
            ("1", KernelFunctionType.POLYNOMIAL),
            ("2", KernelFunctionType.RBF),
            (2, KernelFunctionType.RBF),
        ],
    )
    def test_from_string(self, text, expected):
        assert KernelFunctionType.from_string(text) == expected

    def test_round_trip(self):
        for kt in KernelFunctionType:
            assert KernelFunctionType.from_string(str(kt)) == kt

    def test_invalid(self):
        with pytest.raises(UnsupportedKernelTypeError):
            KernelFunctionType.from_string("quadratic")
        with pytest.raises(UnsupportedKernelTypeError):
            KernelFunctionType.from_string("7")

    def test_math_string(self):
        assert KernelFunctionType.LINEAR.math_string == "u'*v"


class TestEnums:
    def test_file_format(self):
        assert FileFormatType.from_string("libsvm") == FileFormatType.LIBSVM
        assert FileFormatType.from_string("arff") == FileFormatType.ARFF
        with pytest.raises(InvalidParameterError):
            FileFormatType.from_string("csv")

    def test_backend_legacy_names(self):
        # the reference's backend names remain accepted (all map to XLA path)
        assert BackendType.from_string("openmp") == BackendType.XLA
        assert BackendType.from_string("cuda") == BackendType.AUTOMATIC

    def test_target_platform(self):
        assert TargetPlatform.from_string("gpu_nvidia") == TargetPlatform.GPU


class TestParameter:
    def test_defaults(self):
        p = Parameter()
        assert p.kernel_type.value == KernelFunctionType.LINEAR
        assert p.degree.value == 3
        assert p.coef0.value == 0.0
        assert p.cost.value == 1.0
        assert p.gamma.is_default()

    def test_kwargs_mark_set(self):
        p = Parameter(kernel_type="rbf", gamma=0.5)
        assert p.kernel_type.value == KernelFunctionType.RBF
        assert not p.gamma.is_default()
        assert p.degree.is_default()

    def test_merge_non_defaults(self):
        base = Parameter(kernel_type="rbf", gamma=0.5)
        override = Parameter(cost=10.0)
        base.merge_non_defaults(override)
        assert base.cost.value == 10.0
        assert base.gamma.value == 0.5  # untouched

    def test_equivalent_kernel_aware(self):
        # gamma is irrelevant for the linear kernel (parameter.hpp:191-207)
        a = Parameter(kernel_type="linear", gamma=1.0)
        b = Parameter(kernel_type="linear", gamma=2.0)
        assert a.equivalent(b)
        a = Parameter(kernel_type="rbf", gamma=1.0)
        b = Parameter(kernel_type="rbf", gamma=2.0)
        assert not a.equivalent(b)

    def test_sanity_check_gamma(self):
        p = Parameter(kernel_type="rbf", gamma=-1.0)
        with pytest.raises(InvalidParameterError):
            p.sanity_check()
        # gamma <= 0 irrelevant when defaulted
        Parameter(kernel_type="rbf").sanity_check()

    def test_resolved_gamma(self):
        p = Parameter()
        assert p.resolved_gamma(4) == 0.25
        p.gamma.value = 2.0
        assert p.resolved_gamma(4) == 2.0

    def test_unknown_kwarg(self):
        with pytest.raises(InvalidParameterError):
            Parameter(bogus=1)


class TestAssertions:
    """plssvm_assert analog of the reference's PLSSVM_ASSERT (detail/assert.hpp)."""

    def test_passing_assert_is_silent(self):
        from plssvm_tpu.utils.assertions import plssvm_assert

        plssvm_assert(True, "never raised {}", 1)

    def test_failing_assert_carries_location(self):
        import pytest

        from plssvm_tpu.utils.assertions import (
            AssertionFailedError,
            plssvm_assert,
        )

        with pytest.raises(AssertionFailedError, match="test_parameter.py"):
            plssvm_assert(False, "value was {}!", 42)

    def test_disable_via_env(self, monkeypatch):
        import importlib

        import plssvm_tpu.utils.assertions as mod

        monkeypatch.setenv("PLSSVM_TPU_DISABLE_ASSERTS", "1")
        importlib.reload(mod)
        try:
            mod.plssvm_assert(False, "ignored")
            assert not mod.asserts_enabled()
        finally:
            monkeypatch.delenv("PLSSVM_TPU_DISABLE_ASSERTS")
            importlib.reload(mod)
