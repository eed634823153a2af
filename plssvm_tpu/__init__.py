"""plssvm_tpu — a TPU-native Least Squares SVM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of PLSSVM
(reference: github.com/SC-SGS/PLSSVM): binary LS-SVM classification trained
by matrix-free Conjugate Gradient where each iteration applies the implicit
kernel matrix as a fused tiled matvec on the MXU, sharded over TPU meshes.

Public API mirrors the reference's (csvm/data_set/model/parameter/make_csvm,
include/plssvm/*.hpp) with Pythonic naming.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: plays the role of the reference's OpenCL
# JIT-binary cache (src/plssvm/backends/OpenCL/detail/utility.cpp:233-327 —
# compiled kernels cached in a temp dir keyed by sha256).  Without it every
# CLI invocation pays the full TPU compile (tens of seconds over a tunneled
# chip).  Opt out with PLSSVM_TPU_NO_COMPILE_CACHE=1.
if (
    not _os.environ.get("PLSSVM_TPU_NO_COMPILE_CACHE")
    # the experimental tunneled-TPU plugin hangs on executable serialization;
    # its server already caches compiles remotely, so skip the local cache
    and _os.environ.get("JAX_PLATFORMS", "") != "axon"
    # never clobber a cache location the host application configured itself
    and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    and _jax.config.jax_compilation_cache_dir is None
):
    _cache_dir = _os.environ.get(
        "PLSSVM_TPU_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "plssvm_tpu", "jax_cache"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort; never block import
        pass

from .version import __version__
from .exceptions import (
    DataSetError,
    InvalidFileFormatError,
    InvalidParameterError,
    ModelError,
    PLSSVMError,
    UnsupportedBackendError,
    UnsupportedKernelTypeError,
)
from .parameter import (
    BackendType,
    ClassificationType,
    DefaultValue,
    FileFormatType,
    KernelFunctionType,
    Parameter,
    TargetPlatform,
)
from .data_set import DataSet, LabelMapper, Scaling
from .model import Model
from .csvm import (
    CSVM,
    csvm_backend_exists,
    list_available_backends,
    list_available_target_platforms,
    make_csvm,
)
from .kernel_functions import kernel_function
from .probability import (
    calibrate_model,
    calibrate_svr_noise,
    predict_probabilities,
)
from .one_class import fit_one_class, fit_one_class_multihost
from .robust import reweighted_fit
from .sklearn import SVC, SVR, OneClassSVM
from .sparse import (
    nystroem_fit,
    nystroem_fit_from_file,
    nystroem_fit_multihost,
    nystroem_fit_one_class,
    nystroem_fit_one_class_from_file,
    pruned_fit,
    pruned_fit_one_class,
)
from .utils.logger import VerbosityLevel, get_verbosity, set_verbosity
from .utils.tracker import global_tracker

__all__ = [
    "__version__",
    "PLSSVMError",
    "InvalidParameterError",
    "InvalidFileFormatError",
    "DataSetError",
    "ModelError",
    "UnsupportedBackendError",
    "UnsupportedKernelTypeError",
    "BackendType",
    "ClassificationType",
    "DefaultValue",
    "FileFormatType",
    "KernelFunctionType",
    "Parameter",
    "TargetPlatform",
    "DataSet",
    "LabelMapper",
    "Scaling",
    "Model",
    "CSVM",
    "SVC",
    "SVR",
    "OneClassSVM",
    "make_csvm",
    "kernel_function",
    "calibrate_model",
    "calibrate_svr_noise",
    "reweighted_fit",
    "fit_one_class",
    "fit_one_class_multihost",
    "pruned_fit",
    "pruned_fit_one_class",
    "nystroem_fit",
    "nystroem_fit_from_file",
    "nystroem_fit_multihost",
    "nystroem_fit_one_class",
    "nystroem_fit_one_class_from_file",
    "predict_probabilities",
    "csvm_backend_exists",
    "list_available_backends",
    "list_available_target_platforms",
    "VerbosityLevel",
    "set_verbosity",
    "get_verbosity",
    "global_tracker",
]
