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
import numpy as np

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
    m_pad = m
    if m % block != 0:
        # caller pads to a multiple of row_block; otherwise keep memory
        # bounded with the largest usable divisor (a single (m, m) block
        # would materialize the full kernel matrix — 160 GB at 200k rows
        # — which this module exists to avoid).  Badly-factored counts
        # (e.g. prime m, where the only divisor is 1 — an m-iteration
        # sequential scan) zero-pad the BLOCKED axis instead; the padded
        # output rows are dropped
        from ..kernel_functions import _largest_divisor_leq

        div = _largest_divisor_leq(m, block)
        if div >= block // 8:
            block = div
        else:
            m_pad = -(-m // block) * block
    nb = m_pad // block

    if m_pad != m:
        pad = m_pad - m
        X_blocked = jnp.concatenate(
            [X, jnp.zeros((pad, X.shape[1]), X.dtype)]
        )
        sq_blocked = jnp.concatenate([sq_norms, jnp.zeros(pad, sq_norms.dtype)])
    else:
        X_blocked, sq_blocked = X, sq_norms
    Xb = X_blocked.reshape(nb, block, X.shape[1])
    sb = sq_blocked.reshape(nb, block)

    def body(_, inp):
        X_blk, s_blk = inp
        # (block, m): Gram + fused epilogue for Gram kernels, tiled pairwise
        # distance for laplacian/chi-squared (kernel_functions.kernel_block)
        K_blk = kernel_block(
            X_blk, X, s_blk, sq_norms, kind, gamma, coef0, degree
        )
        return None, K_blk @ v

    _, out = jax.lax.scan(body, None, (Xb, sb))
    return out.reshape((m_pad,) + v.shape[1:])[:m]


def distance_kernel_matvec_sym(
    X: jnp.ndarray,
    v: jnp.ndarray,
    gamma,
    *,
    kind: KernelFunctionType,
    row_block: int = DEFAULT_ROW_BLOCK,
) -> jnp.ndarray:
    """``K @ v`` for a DISTANCE kernel over the rows of ``X``, walking only
    the upper triangle of block pairs.

    K is symmetric, so block (i, j) serves both output slices: ``out_i +=
    K_blk @ v_j`` and (off-diagonal only) ``out_j += K_blk^T @ v_i`` — the
    same ~2x work saving the fused Pallas dual kernel gets for Gram kernels
    (which cannot apply here: the L1/chi-squared pairwise reductions are
    VPU-bound and twice-computed in the plain blockwise scan).

    ``X``: (m, d) with m % row_block == 0 (the caller pads); ``v``: (m,) or
    (m, C).  Padded rows produce garbage K values but carry v == 0 and the
    caller masks padded output rows — the module-docstring contract.
    """
    from ..kernel_functions import pairwise_distance

    m, _ = X.shape
    rb = min(row_block, m)
    if m % rb != 0:
        raise ValueError(
            f"row_block {rb} must divide the padded row count {m}"
        )
    nb = m // rb
    n_pairs = (nb * (nb + 1)) // 2
    # upper-triangle pair list (static): pair p -> blocks (bi[p], bj[p])
    bi_np, bj_np = np.triu_indices(nb)
    bi = jnp.asarray(bi_np, jnp.int32)
    bj = jnp.asarray(bj_np, jnp.int32)

    def body(p, out):
        i = bi[p] * rb
        j = bj[p] * rb
        Xi = jax.lax.dynamic_slice_in_dim(X, i, rb, 0)
        Xj = jax.lax.dynamic_slice_in_dim(X, j, rb, 0)
        K_blk = jnp.exp(-gamma * pairwise_distance(Xi, Xj, kind))
        vj = jax.lax.dynamic_slice_in_dim(v, j, rb, 0)
        rows = K_blk @ vj
        out = jax.lax.dynamic_update_slice_in_dim(
            out, jax.lax.dynamic_slice_in_dim(out, i, rb, 0) + rows, i, 0
        )
        # the transposed contribution — zeroed on diagonal pairs, which
        # would double-count (branch-free: cond would recompute shapes)
        vi = jax.lax.dynamic_slice_in_dim(v, i, rb, 0)
        off = jnp.where(i == j, 0.0, 1.0).astype(X.dtype)
        cols = (K_blk.T @ vi) * off
        return jax.lax.dynamic_update_slice_in_dim(
            out, jax.lax.dynamic_slice_in_dim(out, j, rb, 0) + cols, j, 0
        )

    out0 = jnp.zeros(v.shape, v.dtype)
    return jax.lax.fori_loop(0, n_pairs, body, out0)


def assemble_matvec(
    kernel_matvec_out: jnp.ndarray,
    v: jnp.ndarray,
    q: jnp.ndarray,
    QA_cost,
    cost_inv,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """REFERENCE implementation of the rank-1 epilogue (golden checks):

        A_hat @ v = K@v + (QA_cost - q) * sum(v) - (q.v) * 1 + (1/C) * v

    ``mask`` zeroes padded output rows (1.0 on real rows, 0.0 on padding).
    The solver cores (solver/cg.py ``_matvec_with``/``_matmat_with``)
    inline this formula with INJECTED reductions (psum'd dot/sum on
    meshes, compensated folds, per-column sums for the (m, C) block, the
    weighted 1/(C s_i) term) — they cannot delegate here, so this stays
    a single-vector reference the epilogue tests pin against the NumPy
    goldens.  Binary vectors only by contract.
    """
    if v.ndim != 1:
        raise ValueError(
            "assemble_matvec is the single-vector reference epilogue; "
            "(m, C) blocks need per-column sums (solver/cg.py "
            "_matmat_with)"
        )
    s = jnp.sum(v)
    qv = jnp.dot(q, v)
    out = kernel_matvec_out + (QA_cost - q) * s - qv + cost_inv * v
    if mask is not None:
        out = out * mask
    return out
