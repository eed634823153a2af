"""The SVM kernel functions, as fused epilogues over Gram / distance blocks.

reference: include/plssvm/kernel_function_types.hpp:75-97 —
linear ``u.v``; polynomial ``(gamma*u.v + coef0)^degree``;
rbf ``exp(-gamma*|u-v|^2)``.  SIGMOID / LAPLACIAN / CHI_SQUARED are
extensions matching upstream PLSSVM v3's kernel set (this reference
snapshot predates them).

TPU-native design: the hot path never evaluates kernels pairwise on scalars.

- **Gram kernels** (linear / polynomial / rbf / sigmoid): a Gram block
  ``G = X_i @ X_j^T`` is produced on the MXU and the kernel is applied as a
  fused elementwise epilogue (VPU), using ``|u-v|^2 = |u|^2 + |v|^2 - 2 u.v``
  for the RBF kernel.  These run at MXU speed everywhere (including the
  fused Pallas kernels).
- **Distance kernels** (laplacian / chi-squared): the pairwise reduction
  (L1 / chi-squared distance) cannot be factored through a matmul, so the
  distance block is computed with tiled elementwise reductions on the VPU
  (:func:`pairwise_distance`).  This is inherently slower than the Gram
  kernels — the same is true on GPUs, where no tensor-core formulation
  exists either — and therefore always runs on the XLA path.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from .parameter import KernelFunctionType, Parameter

ArrayLike = Union[np.ndarray, jnp.ndarray]

#: kernels whose pairwise value is a function of the Gram entry u.v (and the
#: row/column squared norms) — computed MXU-first via Gram blocks + epilogue
GRAM_KERNELS = frozenset(
    {
        KernelFunctionType.LINEAR,
        KernelFunctionType.POLYNOMIAL,
        KernelFunctionType.RBF,
        KernelFunctionType.SIGMOID,
    }
)

#: kernels over a non-Euclidean pairwise distance — VPU-bound; the pallas
#: impl runs the fused VMEM-resident dual walk (ops/pallas_distance.py),
#: the XLA blocked path stays as the portable oracle
DISTANCE_KERNELS = frozenset(
    {KernelFunctionType.LAPLACIAN, KernelFunctionType.CHI_SQUARED}
)


def is_gram_kernel(kind: KernelFunctionType) -> bool:
    """Whether ``kind`` factors through a Gram matmul (MXU-friendly)."""
    return kind in GRAM_KERNELS


def uses_pallas_kernels(kind: KernelFunctionType) -> bool:
    """Whether the fused MXU Pallas matvec/matmat kernels apply to ``kind``.

    One rule for every dispatch site: a Gram kernel other than linear.
    The linear kernel always takes the factored ``X (X^T v)`` O(n d) path
    (a fused walk over the full kernel matrix could never beat it); the
    distance kernels have their OWN fused VPU walk
    (ops/pallas_distance.py) gated separately by the matvec factory.
    """
    return kind != KernelFunctionType.LINEAR and kind in GRAM_KERNELS


def apply_kernel_to_gram(
    gram: ArrayLike,
    sq_row: ArrayLike,
    sq_col: ArrayLike,
    kind: KernelFunctionType,
    gamma: ArrayLike,
    coef0: ArrayLike,
    degree: int,
):
    """Apply a *Gram* kernel elementwise to a Gram block.

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
    if kind == KernelFunctionType.SIGMOID:
        return jnp.tanh(gamma * gram + coef0)
    raise ValueError(f"kernel function type {kind!r} is not Gram-expressible")


def kernel_self_diag(
    sq_norms: ArrayLike,
    kind: KernelFunctionType,
    gamma: ArrayLike,
    coef0: ArrayLike,
    degree: int,
):
    """``k(x, x)`` from squared norms — the kernel-matrix diagonal.

    Used for ``QA_cost = k(x_last, x_last) + 1/C`` (reference:
    gpu_csvm.hpp:508) and the Jacobi preconditioner diagonal.  All distance
    kernels have ``k(x, x) = exp(0) = 1``.
    """
    if kind == KernelFunctionType.LINEAR:
        return sq_norms
    if kind == KernelFunctionType.POLYNOMIAL:
        return _integer_power(gamma * sq_norms + coef0, degree)
    if kind == KernelFunctionType.SIGMOID:
        return jnp.tanh(gamma * sq_norms + coef0)
    # RBF / LAPLACIAN / CHI_SQUARED: k(x, x) = 1
    return jnp.ones_like(sq_norms)


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


# ---------------------------------------------------------------------------
# Distance kernels: tiled pairwise L1 / chi-squared distance (VPU)
# ---------------------------------------------------------------------------


def _largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is <= ``cap`` (at least 1)."""
    for c in range(min(cap, n), 0, -1):
        if n % c == 0:
            return c
    return 1


def _distance_tile(A, B, kind: KernelFunctionType):
    """Pairwise distance of two small tiles: (a, d) x (b, d) -> (a, b).

    laplacian: ``sum_k |A_ik - B_jk|``; chi-squared:
    ``sum_k (A_ik - B_jk)^2 / (A_ik + B_jk)`` with the 0/0 limit defined as 0
    (zero-padded features therefore contribute nothing).
    """
    diff = A[:, None, :] - B[None, :, :]
    if kind == KernelFunctionType.LAPLACIAN:
        return jnp.sum(jnp.abs(diff), axis=-1)
    den = A[:, None, :] + B[None, :, :]
    nonzero = den != 0
    safe = jnp.where(nonzero, den, 1.0)
    return jnp.sum(jnp.where(nonzero, diff * diff / safe, 0.0), axis=-1)


def pairwise_distance(
    Xb: ArrayLike,
    Y: ArrayLike,
    kind: KernelFunctionType,
    *,
    col_block: int = 256,
    feature_block: int = 256,
):
    """Pairwise distance block ``D[i, j] = dist(Xb_i, Y_j)`` -> (b, m).

    Tiled over Y's rows and the feature axis so the broadcast temporary is
    bounded by ``b * col_block * feature_block`` elements regardless of the
    operand sizes.  Axes with no usable divisor (e.g. a prime SV count) are
    zero-padded internally — padded feature entries contribute 0 to both
    distances and padded column rows are sliced off.
    """
    b, d = Xb.shape
    m = Y.shape[0]

    m_out = m
    cb = _largest_divisor_leq(m, col_block)
    if cb < min(128, m):
        m_pad = -(-m // col_block) * col_block
        Y = jnp.zeros((m_pad, d), Y.dtype).at[:m].set(Y)
        m, cb = m_pad, col_block

    dk = _largest_divisor_leq(d, feature_block)
    if dk < min(64, d):
        d_pad = -(-d // feature_block) * feature_block
        pad = [(0, d_pad - d)]
        Xb = jnp.pad(Xb, [(0, 0)] + pad)
        Y = jnp.pad(Y, [(0, 0)] + pad)
        d, dk = d_pad, feature_block

    nk = d // dk
    if m == cb and nk == 1:
        return _distance_tile(Xb, Y, kind)[:, :m_out]

    Xk = Xb.reshape(b, nk, dk).transpose(1, 0, 2)  # (nk, b, dk)
    Yc = Y.reshape(m // cb, cb, nk, dk)

    def col_body(_, Y_blk):  # (cb, nk, dk)
        Yk = Y_blk.transpose(1, 0, 2)  # (nk, cb, dk)

        # stacked-outputs scan + sum instead of a carried accumulator: a
        # zeros-initialized carry has no varying-mesh-axes metadata, which
        # trips shard_map's VMA check when this runs inside a sharded solve
        # (e.g. the row-sharded explicit kernel-matrix build); the (nk, b,
        # cb) stack is small — nk = d / feature_block
        def feat_body(_, ab):
            a_blk, y_blk = ab
            return None, _distance_tile(a_blk, y_blk, kind)

        _, parts = jax.lax.scan(feat_body, None, (Xk, Yk))
        return None, jnp.sum(parts, axis=0)

    _, out = jax.lax.scan(col_body, None, Yc)  # (m//cb, b, cb)
    return out.transpose(1, 0, 2).reshape(b, m)[:, :m_out]


def distance_to_point(
    X: ArrayLike,
    point: ArrayLike,
    kind: KernelFunctionType,
    *,
    row_block: int = 4096,
):
    """``dist(x_i, point)`` for all rows of ``X`` -> (m,), row-blocked.

    Row counts with no usable divisor (e.g. a prime m, where the largest
    divisor <= row_block is 1 — an m-iteration sequential scan) zero-pad
    to the next block multiple instead, like :func:`pairwise_distance`;
    padded distance rows are simply dropped.
    """
    m, d = X.shape
    rb = _largest_divisor_leq(m, row_block)
    if rb == m:
        return _distance_tile(X, point[None, :], kind)[:, 0]
    if rb < min(row_block, m) // 8:
        rb = min(row_block, m)
        m_pad = -(-m // rb) * rb
        X = jnp.concatenate(
            [jnp.asarray(X), jnp.zeros((m_pad - m, d), X.dtype)]
        )
    else:
        m_pad = m
    Xb = jnp.asarray(X).reshape(m_pad // rb, rb, d)

    def body(_, blk):
        return None, _distance_tile(blk, point[None, :], kind)[:, 0]

    _, out = jax.lax.scan(body, None, Xb)
    return out.reshape(m_pad)[:m]


def kernel_block(
    Xb: ArrayLike,
    Y: ArrayLike,
    sq_row: ArrayLike,
    sq_col: ArrayLike,
    kind: KernelFunctionType,
    gamma: ArrayLike,
    coef0: ArrayLike,
    degree: int,
):
    """Dense kernel block ``K[i, j] = k(Xb_i, Y_j)`` -> (b, m).

    Gram kernels: one MXU ``dot_general`` + fused epilogue.  Distance
    kernels: tiled VPU pairwise distance + ``exp`` epilogue.  This is the
    single block primitive behind every XLA-path matvec / predict /
    ring-block computation.
    """
    if is_gram_kernel(kind):
        gram = jax.lax.dot_general(
            Xb, Y,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=(
                jnp.float32 if Xb.dtype == jnp.float32 else None
            ),
        )
        return apply_kernel_to_gram(
            gram, sq_row[:, None], sq_col[None, :], kind, gamma, coef0, degree
        )
    dist = pairwise_distance(Xb, Y, kind)
    return jnp.exp(-gamma * dist)


# ---------------------------------------------------------------------------
# Host / vector conveniences
# ---------------------------------------------------------------------------


def kernel_function(u: ArrayLike, v: ArrayLike, params: Parameter, num_features=None):
    """Evaluate ``k(u, v)`` for single vectors (host-side convenience).

    reference: kernel_function_types.hpp:114-115 (runtime-dispatched
    kernel_function used for QA_cost on the host, gpu_csvm.hpp:508).
    """
    u = np.asarray(u)
    v = np.asarray(v)
    kind = params.kernel_type.value
    gamma = params.resolved_gamma(num_features if num_features is not None else u.shape[-1])
    if kind == KernelFunctionType.LINEAR:
        return float(np.dot(u, v))
    if kind == KernelFunctionType.POLYNOMIAL:
        return float((gamma * np.dot(u, v) + params.coef0.value) ** params.degree.value)
    if kind == KernelFunctionType.RBF:
        diff = u - v
        return float(np.exp(-gamma * np.dot(diff, diff)))
    if kind == KernelFunctionType.SIGMOID:
        return float(np.tanh(gamma * np.dot(u, v) + params.coef0.value))
    if kind == KernelFunctionType.LAPLACIAN:
        return float(np.exp(-gamma * np.sum(np.abs(u - v))))
    if kind == KernelFunctionType.CHI_SQUARED:
        den = u + v
        num = (u - v) ** 2
        terms = np.divide(num, den, out=np.zeros_like(num, dtype=np.float64),
                          where=den != 0)
        return float(np.exp(-gamma * np.sum(terms)))
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
    row; here a single matvec + epilogue (Gram kernels) or a row-blocked
    pairwise distance (distance kernels).
    """
    if kind in DISTANCE_KERNELS:
        return jnp.exp(-gamma * distance_to_point(X, point, kind))
    gram = X @ point  # (n,)
    if kind == KernelFunctionType.LINEAR:
        return gram
    if kind == KernelFunctionType.POLYNOMIAL:
        return _integer_power(gamma * gram + coef0, degree)
    if kind == KernelFunctionType.SIGMOID:
        return jnp.tanh(gamma * gram + coef0)
    if kind == KernelFunctionType.RBF:
        sq_x = jnp.sum(X * X, axis=-1)
        sq_p = jnp.dot(point, point)
        return jnp.exp(-gamma * (sq_x + sq_p - 2.0 * gram))
    raise ValueError(f"unknown kernel function type {kind!r}")
