"""Device compute ops: implicit kernel matvec (XLA + Pallas), prediction."""

from .matvec import kernel_matvec_xla, linear_kernel_matvec
from .predict import calculate_w, predict_values

__all__ = [
    "kernel_matvec_xla",
    "linear_kernel_matvec",
    "calculate_w",
    "predict_values",
]
