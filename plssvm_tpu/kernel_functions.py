"""The three SVM kernel functions, as elementwise epilogues over Gram blocks.

reference: include/plssvm/kernel_function_types.hpp:75-97 —
linear ``u.v``; polynomial ``(gamma*u.v + coef0)^degree``;
rbf ``exp(-gamma*|u-v|^2)``.

TPU-native design: the hot path never evaluates kernels pairwise on scalars.
Instead a Gram block ``G = X_i @ X_j^T`` is produced on the MXU and the kernel
is applied as a fused elementwise epilogue (VPU), using
``|u-v|^2 = |u|^2 + |v|^2 - 2 u.v`` for the RBF kernel.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from .parameter import KernelFunctionType, Parameter

ArrayLike = Union[np.ndarray, jnp.ndarray]


def apply_kernel_to_gram(
    gram: ArrayLike,
    sq_row: ArrayLike,
    sq_col: ArrayLike,
    kind: KernelFunctionType,
    gamma: ArrayLike,
    coef0: ArrayLike,
    degree: int,
):
    """Apply the kernel elementwise to a Gram block.

    ``gram[i, j] = x_i . x_j``; ``sq_row`` / ``sq_col`` are the squared norms
    broadcast along rows / columns (only used by RBF).

    ``degree`` is static: XLA unrolls the integer power into multiplies, and
    the reference uses ``std::pow`` with an integer exponent
    (kernel_function_types.hpp:86).
    """
    if kind == KernelFunctionType.LINEAR:
        return gram
    if kind == KernelFunctionType.POLYNOMIAL:
        base = gamma * gram + coef0
        return _integer_power(base, degree)
    if kind == KernelFunctionType.RBF:
        sq_dist = sq_row + sq_col - 2.0 * gram
        return jnp.exp(-gamma * sq_dist)
    raise ValueError(f"unknown kernel function type {kind!r}")


def _integer_power(base, degree: int):
    """x**degree by repeated squaring for non-negative static integer degree."""
    if degree < 0:
        return 1.0 / _integer_power(base, -degree)
    result = None
    acc = base
    n = degree
    if n == 0:
        return jnp.ones_like(base)
    while n > 0:
        if n & 1:
            result = acc if result is None else result * acc
        acc = acc * acc
        n >>= 1
    return result


def kernel_function(u: ArrayLike, v: ArrayLike, params: Parameter, num_features=None):
    """Evaluate ``k(u, v)`` for single vectors (host-side convenience).

    reference: kernel_function_types.hpp:114-115 (runtime-dispatched
    kernel_function used for QA_cost on the host, gpu_csvm.hpp:508).
    """
    u = np.asarray(u)
    v = np.asarray(v)
    kind = params.kernel_type.value
    gamma = params.resolved_gamma(num_features if num_features is not None else u.shape[-1])
    dot = float(np.dot(u, v))
    if kind == KernelFunctionType.LINEAR:
        return dot
    if kind == KernelFunctionType.POLYNOMIAL:
        return float((gamma * dot + params.coef0.value) ** params.degree.value)
    if kind == KernelFunctionType.RBF:
        diff = u - v
        return float(np.exp(-gamma * np.dot(diff, diff)))
    raise ValueError(f"unknown kernel function type {kind!r}")


def kernel_against_point(
    X: ArrayLike,
    point: ArrayLike,
    kind: KernelFunctionType,
    gamma,
    coef0,
    degree: int,
):
    """Vectorized ``k(x_i, point)`` for all rows of ``X`` (the "q kernel").

    reference: src/plssvm/backends/CUDA/q_kernel.cu:16-49 — one thread per
    row; here a single matvec + epilogue.
    """
    gram = X @ point  # (n,)
    if kind == KernelFunctionType.LINEAR:
        return gram
    if kind == KernelFunctionType.POLYNOMIAL:
        return _integer_power(gamma * gram + coef0, degree)
    if kind == KernelFunctionType.RBF:
        sq_x = jnp.sum(X * X, axis=-1)
        sq_p = jnp.dot(point, point)
        return jnp.exp(-gamma * (sq_x + sq_p - 2.0 * gram))
    raise ValueError(f"unknown kernel function type {kind!r}")
