"""Version metadata (reference: include/plssvm/version/version.hpp)."""

__version__ = "0.1.0"
__version_info__ = (0, 1, 0)

NAME = "plssvm_tpu"
DESCRIPTION = "TPU-native Least Squares Support Vector Machine (JAX/XLA/Pallas)"
