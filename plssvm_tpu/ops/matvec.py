"""Implicit kernel-matrix matvec — the computational heart of LS-SVM training.

The CG solver repeatedly applies the implicit matrix

    A_hat[i][j] = k(x_i, x_j) + QA_cost - q[i] - q[j]   (+ 1/C on the diagonal)

without ever materializing it (reference: src/plssvm/backends/CUDA/
svm_kernel.cu:17-222, gpu_csvm.hpp:431-447).

TPU-native re-design — two key departures from the reference:

1. **Rank-1 epilogue decomposition.**  The affine terms separate:

       A_hat @ v = K @ v + (QA_cost - q) * sum(v) - (q . v) * 1 + (1/C) * v

   so only the *pure kernel* matvec ``K @ v`` touches O(n^2) work; the
   epilogue is O(n) vector algebra fused by XLA.  The reference instead fuses
   ``QA_cost - q_i - q_j`` into every matrix element.

2. **Factored linear kernel.**  For the linear kernel K = X X^T, so
       K @ v = X @ (X^T @ v)
   costs O(n d) per CG iteration instead of the reference's O(n^2 d / P)
   (the reference always walks the full kernel matrix, svm_kernel.cu:17-88).
   This is an asymptotic win, not a constant-factor one.

For the other kernels the matrix is computed blockwise: a row-block kernel
block (Gram on the MXU + fused epilogue for polynomial/RBF/sigmoid; tiled
VPU pairwise distance for laplacian/chi-squared) immediately contracted
against ``v`` — O(row_block * n) memory, never O(n^2).

Padded rows/columns: callers zero-pad X and guarantee ``v == 0`` on padded
entries; every K column belonging to a padded index is therefore harmless
(multiplied by 0) and padded *output* rows are masked by the caller.  This is
the explicit masking strategy SURVEY.md flags as the RBF padding trap (a
zero-padded RBF row has k = exp(0) = 1, unlike the linear kernel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..kernel_functions import kernel_block
from ..parameter import KernelFunctionType

#: default row-block height for the blockwise matvec; a multiple of the MXU
#: tile (128) replacing the reference's 16x6=96 boundary (constants.hpp:22-33)
DEFAULT_ROW_BLOCK = 256


def linear_kernel_matvec(X: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(X X^T) @ v computed as X @ (X^T @ v): O(n d) instead of O(n^2 d)."""
    return X @ (X.T @ v)


def kernel_matvec_xla(
    X: jnp.ndarray,
    sq_norms: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    gamma,
    coef0,
    degree: int,
    row_block: int = DEFAULT_ROW_BLOCK,
) -> jnp.ndarray:
    """``K @ v`` where ``K[i, j] = k(x_i, x_j)`` over the rows of ``X``.

    Blockwise jnp/XLA implementation: plays the role of the reference's
    always-available OpenMP backend (src/plssvm/backends/OpenMP/svm_kernel.cpp)
    and is the test oracle for the Pallas kernel.

    ``X``: (m, d) zero-padded; ``v``: (m,) with zeros on padded entries, or
    (m, C) for a block of right-hand sides (multiclass one-vs-all) — each
    Gram row block is computed ONCE and contracted with all C columns.
    """
    if kind == KernelFunctionType.LINEAR:
        return linear_kernel_matvec(X, v)

    m, _ = X.shape
    block = min(row_block, m)
    if m % block != 0:
        # caller pads to a multiple of row_block; fall back to a single block
        block = m
    nb = m // block

    Xb = X.reshape(nb, block, X.shape[1])
    sb = sq_norms.reshape(nb, block)

    def body(_, inp):
        X_blk, s_blk = inp
        # (block, m): Gram + fused epilogue for Gram kernels, tiled pairwise
        # distance for laplacian/chi-squared (kernel_functions.kernel_block)
        K_blk = kernel_block(
            X_blk, X, s_blk, sq_norms, kind, gamma, coef0, degree
        )
        return None, K_blk @ v

    _, out = jax.lax.scan(body, None, (Xb, sb))
    return out.reshape((m,) + v.shape[1:])


def assemble_matvec(
    kernel_matvec_out: jnp.ndarray,
    v: jnp.ndarray,
    q: jnp.ndarray,
    QA_cost,
    cost_inv,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Apply the rank-1 epilogue: A_hat @ v from K @ v.

        A_hat @ v = K@v + (QA_cost - q) * sum(v) - (q.v) * 1 + (1/C) * v

    ``mask`` zeroes padded output rows (1.0 on real rows, 0.0 on padding).
    """
    s = jnp.sum(v)
    qv = jnp.dot(q, v)
    out = kernel_matvec_out + (QA_cost - q) * s - qv + cost_inv * v
    if mask is not None:
        out = out * mask
    return out
