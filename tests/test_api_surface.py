"""Direct tests of the reference-parity API surface.

These symbols mirror exact reference entry points (csvm.hpp:399-416
backend queries, exceptions.hpp:29-140 error taxonomy, version/) and were
previously only exercised indirectly through the CLI.
"""

import pytest

import plssvm_tpu
from plssvm_tpu import exceptions as exc
from plssvm_tpu.csvm import (
    csvm_backend_exists,
    list_available_backends,
    list_available_target_platforms,
)
from plssvm_tpu.parameter import BackendType, TargetPlatform


class TestBackendQueries:
    def test_backend_exists(self):
        # csvm.hpp:399-416: query by enum or string
        assert csvm_backend_exists("xla")
        assert csvm_backend_exists(BackendType.XLA)
        assert csvm_backend_exists("automatic")
        # reference backend names are a documented compat shim mapping onto
        # the single XLA path (parameter.BackendType.from_string)
        assert csvm_backend_exists("cuda")
        assert not csvm_backend_exists("not_a_backend")

    def test_list_available_backends(self):
        avail = list_available_backends()
        assert BackendType.AUTOMATIC in avail and BackendType.XLA in avail
        # pallas appears iff a TPU is attached, and the two queries agree
        assert (BackendType.PALLAS in avail) == csvm_backend_exists("pallas")

    def test_list_available_target_platforms(self):
        plats = list_available_target_platforms()
        assert TargetPlatform.AUTOMATIC in plats
        assert TargetPlatform.CPU in plats


class TestExceptionTaxonomy:
    def test_hierarchy(self):
        # exceptions.hpp:29: every plssvm error derives from one base that
        # itself derives from the language's runtime error
        for name in (
            "InvalidParameterError", "FileNotFoundError_",
            "InvalidFileFormatError", "DataSetError", "ModelError",
            "UnsupportedBackendError", "UnsupportedKernelTypeError",
            "KernelLaunchError",
        ):
            cls = getattr(exc, name)
            assert issubclass(cls, exc.PLSSVMError), name
            assert issubclass(cls, RuntimeError), name

    def test_catchable_as_base(self):
        with pytest.raises(exc.PLSSVMError):
            raise exc.InvalidParameterError("nope")


class TestVersion:
    def test_version_info(self):
        from plssvm_tpu import version

        assert plssvm_tpu.__version__ == version.__version__
        assert tuple(int(p) for p in version.__version__.split(".")) == (
            version.__version_info__
        )

    def test_git_metadata(self):
        from plssvm_tpu.version import git_metadata

        meta = git_metadata()
        assert set(meta) == {"commit", "branch", "dirty"}
        # running from the source checkout: commit must resolve
        assert isinstance(meta["commit"], str)
        assert isinstance(meta["dirty"], bool)
        # cached: same object on repeat calls
        assert git_metadata() is meta
