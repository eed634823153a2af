"""plssvm_tpu — a TPU-native Least Squares SVM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of PLSSVM
(reference: github.com/SC-SGS/PLSSVM): binary LS-SVM classification trained
by matrix-free Conjugate Gradient where each iteration applies the implicit
kernel matrix as a fused tiled matvec on the MXU, sharded over TPU meshes.

Public API mirrors the reference's (csvm/data_set/model/parameter/make_csvm,
include/plssvm/*.hpp) with Pythonic naming.
"""

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
    "make_csvm",
    "csvm_backend_exists",
    "list_available_backends",
    "list_available_target_platforms",
    "VerbosityLevel",
    "set_verbosity",
    "get_verbosity",
    "global_tracker",
]
