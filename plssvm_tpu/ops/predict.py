"""Batched prediction ops.

reference: gpu_csvm.hpp:656-730 (predict_values_impl),
src/plssvm/backends/CUDA/predict_kernel.cu:17-74 —
for the linear kernel a ``w = sum_i alpha_i sv_i`` vector is computed once and
cached so prediction is a single dot product per point; polynomial/RBF predict
runs a 2-D kernel over (support vector x predict point).

TPU-native: the poly/RBF path is one Gram matmul on the MXU with the kernel
epilogue fused by XLA, contracted against alpha — no atomics, no 2-D
scatter grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..kernel_functions import kernel_block
from ..parameter import KernelFunctionType


@jax.jit
def calculate_w(support_vectors: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """w[j] = sum_i alpha_i * sv[i, j] (reference: gpu_csvm.hpp:386-429).

    ``alpha`` of shape (n_sv, C) yields a per-class (d, C) weight matrix
    (multiclass one-vs-all extension).
    """
    return support_vectors.T @ alpha


@functools.partial(jax.jit, static_argnames=("kind", "degree", "impl"))
def predict_values(
    support_vectors: jnp.ndarray,  # (n_sv, d)
    alpha: jnp.ndarray,            # (n_sv,) or (n_sv, C) one-vs-all columns
    rho: jnp.ndarray,              # scalar or (C,)
    w: jnp.ndarray,                # (d,) or (d, C) — linear fast path
    predict_points: jnp.ndarray,   # (n_pred, d)
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    impl: str = "xla",
) -> jnp.ndarray:
    """Decision values f(x) = sum_i alpha_i k(sv_i, x) - rho for each point.

    ``impl="pallas"`` routes the poly/RBF path through the fused rectangular
    Pallas kernel, ``K(points, sv) @ alpha`` — the same op as the training
    matvec with the SVs as columns (shapes must be 128-padded by the caller;
    zero-padded SVs are harmless because their alpha is zero-padded too).
    """
    if kind == KernelFunctionType.LINEAR:
        return predict_points @ w - rho

    sq_pred = jnp.sum(predict_points * predict_points, axis=-1)
    sq_sv = jnp.sum(support_vectors * support_vectors, axis=-1)

    if impl == "pallas":
        from ..kernel_functions import DISTANCE_KERNELS

        if alpha.ndim == 1 and kind not in DISTANCE_KERNELS:
            from .pallas_matvec import kernel_matvec_pallas_rect

            out = kernel_matvec_pallas_rect(
                predict_points, support_vectors, sq_pred, sq_sv, alpha,
                kind=kind, gamma=gamma, coef0=coef0, degree=degree,
            )
            return out - rho
        # (n_sv, C) one-vs-all blocks and the distance kernels have their
        # own fused paths in csvm._predict_values_pallas (class-major
        # matmat / distance rect walks); this low-level helper falls back
        # to the XLA block instead of crashing on a reshape at trace time

    K = kernel_block(
        predict_points, support_vectors, sq_pred, sq_sv,
        kind, gamma, coef0, degree,
    )  # (n_pred, n_sv)
    return K @ alpha - rho


@functools.partial(jax.jit, static_argnames=("kind", "degree", "row_block"))
def predict_values_blocked(
    support_vectors: jnp.ndarray,  # (n_sv, d)
    alpha: jnp.ndarray,            # (n_sv,) or (n_sv, C) one-vs-all columns
    rho: jnp.ndarray,              # scalar or (C,)
    predict_points: jnp.ndarray,   # (n_pred, d) — n_pred % row_block == 0
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    row_block: int = 256,
) -> jnp.ndarray:
    """Decision values streamed over point row blocks — O(row_block * n_sv)
    extra memory for ANY model size, never the full (n_pred, n_sv) matrix.

    This is the TPU analog of the reference's streaming device predict
    (gpu_csvm.hpp:656-730, predict_kernel.cu:32-74), which computes kernel
    values on the fly with O(n_pred) output memory: here each scan step forms
    one (row_block, n_sv) Gram slab on the MXU, applies the kernel epilogue
    and contracts it against alpha before the next slab is formed.
    """
    n_pred, d = predict_points.shape
    nb = n_pred // row_block
    sq_sv = jnp.sum(support_vectors * support_vectors, axis=-1)
    Pb = predict_points.reshape(nb, row_block, d)

    def body(_, P_blk):
        sq_blk = jnp.sum(P_blk * P_blk, axis=-1)
        K_blk = kernel_block(
            P_blk, support_vectors, sq_blk, sq_sv,
            kind, gamma, coef0, degree,
        )  # (row_block, n_sv)
        return None, K_blk @ alpha

    _, out = jax.lax.scan(body, None, Pb)
    return out.reshape((n_pred,) + alpha.shape[1:]) - rho
