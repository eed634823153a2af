"""Explicit-kernel-matrix CG: materialize K once, then O(n^2) iterations.

Upstream PLSSVM v3 calls this solver type ``cg_explicit`` (the bundled
reference snapshot has only the implicit solve, gpu_csvm.hpp:477-654 — every
CG iteration recomputes the kernel matrix on the fly at O(n^2 d) FLOPs).

When the (m, m) kernel matrix fits device memory, building it ONCE and
running CG against the stored matrix changes the per-iteration cost from
O(n^2 d) MXU work to an O(n^2) HBM-bandwidth-bound matvec.  On a TPU v5e
(~197 bf16 TFLOP/s, ~819 GB/s HBM) the crossover is at ``d ~ 2 R/BW ~ 900``
features for the Pallas implicit kernel — and the win is dramatic for the
VPU-bound distance kernels (laplacian / chi-squared), whose pairwise
reduction is paid once at build time instead of every iteration.

TPU-native design notes:
- the matrix build is one fused XLA op for Gram kernels (MXU matmul +
  elementwise epilogue, the output IS the only O(m^2) buffer) and a
  row-blocked VPU scan for distance kernels;
- ``precision="bf16"`` stores K in bfloat16 — half the HBM traffic per
  iteration (the matvec is bandwidth-bound, so ~2x faster) and half the
  memory, with f32 accumulation in the matvec;
- the CG loop is the SAME ``cg_ls_svm_core`` / ``cg_ls_svm_multi_core`` as
  the implicit path (solver/cg.py) — only the ``kernel_mv`` closure changes
  to ``v -> K @ v`` — so preconditioning, compensated scalars, the 50-iter
  exact residual, checkpoint/resume and the multiclass block solve all work
  identically.

Padding correctness: K's padded rows/columns hold garbage kernel values
(e.g. exp(-gamma |0 - x_j|^2) != 0), but every vector entering the matvec is
zero on padded entries (b, x0, r, d are all built under ``mask``) and the
core masks the matvec output — identical reasoning to the implicit path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..kernel_functions import (
    _largest_divisor_leq,
    apply_kernel_to_gram,
    is_gram_kernel,
    pairwise_distance,
)
from ..parameter import KernelFunctionType
from .cg import (
    CGResult,
    MultiCGResult,
    cg_ls_svm_core,
    cg_ls_svm_multi_core,
    _scalar_reductions,
    compensated_sum,
)


def kernel_matrix_block(
    X_rows: jnp.ndarray,
    X_cols: jnp.ndarray,
    gamma,
    coef0,
    *,
    kind: KernelFunctionType,
    degree: int,
    precision: str = "f32",
    row_block: int = 256,
) -> jnp.ndarray:
    """Dense ``K[i, j] = k(X_rows_i, X_cols_j)`` -> (m_rows, m_cols).

    The traced building block behind both the single-device matrix and the
    row-sharded per-chip block (parallel.sharded).  Gram kernels build in
    one fused MXU matmul + epilogue; ``"highest"`` runs the Gram contraction
    with full-f32 multi-pass dots (reference-grade accuracy), ``"bf16"``
    stores the result in bfloat16 (half the memory and per-iteration HBM
    traffic).  Distance kernels build with the tiled VPU pairwise reduction,
    row-blocked so the broadcast temporary stays bounded.
    """
    if is_gram_kernel(kind):
        sq_r = jnp.sum(X_rows * X_rows, axis=-1)
        sq_c = jnp.sum(X_cols * X_cols, axis=-1)
        gram = jax.lax.dot_general(
            X_rows, X_cols,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=(
                jax.lax.Precision.HIGHEST if precision == "highest" else None
            ),
            preferred_element_type=(
                jnp.float32 if X_rows.dtype == jnp.float32 else None
            ),
        )
        K = apply_kernel_to_gram(
            gram, sq_r[:, None], sq_c[None, :], kind, gamma, coef0, degree
        )
    else:
        m = X_rows.shape[0]
        rb = _largest_divisor_leq(m, row_block)
        if rb == m:
            K = jnp.exp(-gamma * pairwise_distance(X_rows, X_cols, kind))
        else:
            Xb = X_rows.reshape(m // rb, rb, X_rows.shape[1])

            def body(_, blk):
                return None, jnp.exp(
                    -gamma * pairwise_distance(blk, X_cols, kind)
                )

            _, K = jax.lax.scan(body, None, Xb)
            K = K.reshape(m, X_cols.shape[0])
    if precision == "bf16":
        K = K.astype(jnp.bfloat16)
    return K


@functools.partial(
    jax.jit, static_argnames=("kind", "degree", "precision", "row_block")
)
def build_kernel_matrix(
    X: jnp.ndarray,
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    precision: str = "f32",
    row_block: int = 256,
) -> jnp.ndarray:
    """Dense kernel matrix ``K[i, j] = k(x_i, x_j)`` -> (m, m), jitted."""
    return kernel_matrix_block(
        X, X, gamma, coef0,
        kind=kind, degree=degree, precision=precision, row_block=row_block,
    )


def _explicit_matvec(K: jnp.ndarray, out_dtype, precision: str):
    """``v -> K @ v`` (and ``V -> K @ V``) with f32 accumulation.

    bf16-stored K contracts bf16 x bf16 -> f32 (the bandwidth win is the
    point; accumulation stays f32).  ``"highest"`` forces full-precision
    dots so the explicit solve matches the implicit "highest" tier.
    """
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None

    def kv(X, sq_norms, v, gamma, coef0):
        return jax.lax.dot_general(
            K, v.astype(K.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=out_dtype,
        )

    return kv


@functools.partial(
    jax.jit,
    static_argnames=("kind", "degree", "preconditioner", "scalars",
                     "precision", "debug"),
)
def solve_ls_svm_explicit(
    K: jnp.ndarray,        # (m, m) prebuilt kernel matrix (f32 or bf16)
    X: jnp.ndarray,        # (m, d) zero-padded rows (for q / diag / QA_cost)
    x_last: jnp.ndarray,
    y: jnp.ndarray,
    y_last: jnp.ndarray,
    mask: jnp.ndarray,
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    preconditioner: str = "none",
    scalars: str = "plain",
    precision: str = "f32",
    x_init=None,
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> CGResult:
    """Single-device binary LS-SVM CG against the explicit kernel matrix.

    ``x_init`` warm-starts CG from a previous fit's alpha (see
    solver.cg.solve_ls_svm) — combined with the CSVM-level kernel-matrix
    cache this makes hyperparameter sweeps over C nearly free.
    """
    dot, vsum = _scalar_reductions(scalars)
    return cg_ls_svm_core(
        X, x_last, y, y_last, mask, gamma, coef0, cost, eps, max_iter,
        kind=kind, degree=degree,
        kernel_mv=_explicit_matvec(K, X.dtype, precision),
        dot=dot, vsum=vsum, preconditioner=preconditioner, x_init=x_init,
        weights=weights, weight_last=weight_last, debug=debug,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kind", "degree", "preconditioner", "scalars",
                     "precision", "debug"),
)
def solve_ls_svm_explicit_resume(
    K: jnp.ndarray,
    X: jnp.ndarray,
    x_last: jnp.ndarray,
    y: jnp.ndarray,
    y_last: jnp.ndarray,
    mask: jnp.ndarray,
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter: jnp.ndarray,
    x0: jnp.ndarray,
    r0: jnp.ndarray,
    d0: jnp.ndarray,
    delta: jnp.ndarray,
    delta0: jnp.ndarray,
    it0: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    preconditioner: str = "none",
    scalars: str = "plain",
    precision: str = "f32",
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> CGResult:
    """Continue a checkpointed explicit-matrix solve."""
    dot, vsum = _scalar_reductions(scalars)
    return cg_ls_svm_core(
        X, x_last, y, y_last, mask, gamma, coef0, cost, eps, max_iter,
        kind=kind, degree=degree,
        kernel_mv=_explicit_matvec(K, X.dtype, precision),
        dot=dot, vsum=vsum, preconditioner=preconditioner,
        init_state=(x0, r0, d0, delta, delta0, it0),
        weights=weights, weight_last=weight_last, debug=debug,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kind", "degree", "preconditioner", "scalars",
                     "precision", "debug"),
)
def solve_ls_svm_explicit_multi(
    K: jnp.ndarray,
    X: jnp.ndarray,
    x_last: jnp.ndarray,
    Y: jnp.ndarray,        # (m, C) one-vs-all targets
    y_last: jnp.ndarray,   # (C,)
    mask: jnp.ndarray,
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    preconditioner: str = "none",
    scalars: str = "plain",
    precision: str = "f32",
    x_init=None,
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> MultiCGResult:
    """One-vs-all block CG against the explicit matrix: K is read from HBM
    once per iteration for ALL C right-hand sides (K @ V).  ``x_init``
    warm-starts from a previous (m, C) alpha block."""
    colsum = compensated_sum if scalars == "compensated" else (
        lambda M: jnp.sum(M, axis=0)
    )
    return cg_ls_svm_multi_core(
        X, x_last, Y, y_last, mask, gamma, coef0, cost, eps, max_iter,
        kind=kind, degree=degree,
        kernel_mm=_explicit_matvec(K, X.dtype, precision),
        colsum=colsum, preconditioner=preconditioner, x_init=x_init,
        weights=weights, weight_last=weight_last, debug=debug,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kind", "degree", "preconditioner", "scalars",
                     "precision", "debug"),
)
def solve_ls_svm_explicit_multi_resume(
    K: jnp.ndarray,
    X: jnp.ndarray,
    x_last: jnp.ndarray,
    Y: jnp.ndarray,
    y_last: jnp.ndarray,
    mask: jnp.ndarray,
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter: jnp.ndarray,
    x0: jnp.ndarray,
    r0: jnp.ndarray,
    d0: jnp.ndarray,
    delta: jnp.ndarray,
    delta0: jnp.ndarray,
    it0: jnp.ndarray,
    itpc0: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    preconditioner: str = "none",
    scalars: str = "plain",
    precision: str = "f32",
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> MultiCGResult:
    """Continue a checkpointed explicit-matrix block solve."""
    colsum = compensated_sum if scalars == "compensated" else (
        lambda M: jnp.sum(M, axis=0)
    )
    return cg_ls_svm_multi_core(
        X, x_last, Y, y_last, mask, gamma, coef0, cost, eps, max_iter,
        kind=kind, degree=degree,
        kernel_mm=_explicit_matvec(K, X.dtype, precision),
        colsum=colsum, preconditioner=preconditioner,
        init_state=(x0, r0, d0, delta, delta0, it0, itpc0),
        weights=weights, weight_last=weight_last, debug=debug,
    )
