"""One-class LS-SVM: novelty detection through the same solver machinery.

EXTENSION — neither the reference nor upstream PLSSVM supports one-class
training (LIBSVM does, ``svm-train -s 2``).  This implements the
least-squares one-class SVM (Choi, "Least squares one-class support vector
machine", Pattern Recognition Letters 30, 2009): describe the training
cloud by the kernel expansion ``g(x) = sum_i alpha_i k(x_i, x)`` with
``alpha`` solving the ridge system

    (K + I/C) alpha = 1

(kernel ridge regression of the constant-one "support function"), then
threshold at the ``nu``-quantile of the training scores, so a ``nu``
fraction of the training data lands outside.  The decision function and
model-file layout are exactly LIBSVM's one-class form
``f(x) = sum_i alpha_i k(x_i, x) - rho`` (``svm_type one_class`` header,
no label lines), so models written by LIBSVM's ``svm-train -s 2`` load and
predict through the ordinary paths, and models trained here are readable
by ``svm-predict`` — the training objective differs (least-squares vs the
nu-SVM margin program), the serving contract does not.

TPU-first shape: the solve is one jitted ``lax.while_loop`` CG whose
matvec comes from the classifier's implementation factory
(``solver.cg._make_kernel_matvec`` — the ridge matrix is the classifier's
implicit matrix with q = 0 and QA_cost = 0), so the fused Pallas
dual-contraction walk, the factored linear path and the symmetric distance
walk all serve one-class training too; 50-iteration exact-residual
correction, no host round-trips per iteration.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data_set import DataSet
from .exceptions import InvalidParameterError
from .kernel_functions import KernelFunctionType
from .model import Model
from .parameter import BackendType
from .solver.cg import _make_kernel_matvec
from .utils.logger import VerbosityLevel, log


@partial(jax.jit, static_argnames=("kind", "degree", "impl", "precision"))
def _ridge_cg(X, sq, mask, gamma, coef0, cost_inv, eps, max_iter,
              kind, degree, impl="xla", precision="f32"):
    """CG on ``(K + I/C) x = 1`` (masked rows), x0 = 0.

    Same convergence contract as the classifier's CG (solver/cg.py):
    relative squared-residual stop ``delta <= eps^2 * delta0`` and an exact
    residual recomputation every 50 iterations (reference:
    gpu_csvm.hpp:595-619).
    """
    # the ridge matrix (K + I/C) is the classifier's implicit matrix with
    # q = 0 and QA_cost = 0, so the SAME kernel matvec implementations
    # apply — including the fused Pallas dual-contraction walk
    kv_fn = _make_kernel_matvec(kind, degree, impl, 256, precision)

    def matvec(v):
        kv = kv_fn(X, sq, v, gamma, coef0)
        return (kv + cost_inv * v) * mask

    b = mask
    x = jnp.zeros_like(b)
    r = b  # r = b - A@0
    d = r
    delta0 = jnp.dot(r, r)
    delta = delta0
    target = eps * eps * delta0

    def cond(state):
        x, r, d, delta, it = state
        return jnp.logical_and(it < max_iter, delta > target)

    def body(state):
        x, r, d, delta, it = state
        Ad = matvec(d)
        a = delta / jnp.dot(d, Ad)
        x = x + a * d
        r_cheap = r - a * Ad
        r = jax.lax.cond(
            (it + 1) % 50 == 0,
            lambda: (b - matvec(x)),
            lambda: r_cheap,
        )
        delta_new = jnp.dot(r, r)
        beta = delta_new / delta
        d = r + beta * d
        return x, r, d, delta_new, it + 1

    x, r, d, delta, it = jax.lax.while_loop(
        cond, body, (x, r, d, delta, jnp.asarray(0, jnp.int32))
    )
    # training scores g = K @ alpha (for the nu-quantile threshold)
    g = kv_fn(X, sq, x, gamma, coef0) * mask
    return x, g, delta, delta0, it


def fit_one_class(
    csvm,
    data: DataSet,
    *,
    nu: float = 0.5,
    epsilon: float = 0.001,
    max_iter: Optional[int] = None,
) -> Model:
    """Fit a one-class LS-SVM on ``data``'s points (labels are ignored).

    ``nu`` is the training outlier fraction: ``rho`` is set to the
    ``nu``-quantile of the training scores, so ~``nu`` of the training
    points get ``f(x) < 0`` (LIBSVM's -n role, by quantile rather than by
    the nu-SVM margin program).  Returns a Model with ``is_one_class``
    set: ``csvm.predict`` yields +1 (inlier) / -1 (outlier),
    ``csvm.predict_values`` the decision values, ``model.save`` LIBSVM's
    ``one_class`` file layout.
    """
    if not 0.0 < nu < 1.0:
        raise InvalidParameterError(
            f"nu must be in (0, 1), but is {nu}!"
        )
    if epsilon <= 0.0:
        raise InvalidParameterError(
            f"epsilon must be less than 0.0, but is {epsilon}!"
        )
    n = data.num_data_points
    d = data.num_features
    if max_iter is None:
        max_iter = n
    elif max_iter <= 0:
        raise InvalidParameterError(
            f"max_iter must be greater than 0, but is {max_iter}!"
        )

    from .csvm import _ensure_x64_if_needed

    _ensure_x64_if_needed(csvm.dtype)
    params = csvm.params.copy()
    if params.gamma.is_default():
        params.gamma.value = 1.0 / d
    kind = params.kernel_type.value
    if kind == KernelFunctionType.CHI_SQUARED and np.any(
        np.asarray(data.data) < 0.0
    ):
        raise InvalidParameterError(
            "chi-squared kernel requires non-negative data!"
        )

    dt = csvm.dtype
    X = np.asarray(data.data, dtype=dt)
    block = 256
    n_pad = int(-(-n // block) * block)
    Xp = np.zeros((n_pad, d), dtype=dt)
    Xp[:n] = X
    mask = np.zeros(n_pad, dtype=dt)
    mask[:n] = 1.0

    with csvm._device_ctx():
        Xd = jnp.asarray(Xp)
        sq = jnp.sum(Xd * Xd, axis=1)
        alpha_p, g_p, delta, delta0, it = _ridge_cg(
            Xd, sq, jnp.asarray(mask),
            dt.type(params.resolved_gamma(d)), dt.type(params.coef0.value),
            dt.type(1.0 / params.cost.value), dt.type(epsilon),
            jnp.asarray(max_iter, jnp.int32),
            kind, params.degree.value,
            impl="pallas" if csvm.backend == BackendType.PALLAS else "xla",
            precision=getattr(csvm, "gram_precision", "f32"),
        )
        alpha = np.asarray(jax.device_get(alpha_p))[:n]
        g = np.asarray(jax.device_get(g_p), dtype=np.float64)[:n]
        iterations = int(jax.device_get(it))

    log(
        VerbosityLevel.FULL | VerbosityLevel.LIBSVM,
        "optimization finished, #iter = {}\n", iterations,
    )
    from .utils.tracker import add_tracking_entry

    add_tracking_entry("cg", "iterations", iterations)
    add_tracking_entry("cg", "max_iterations", int(max_iter))
    add_tracking_entry("cg", "residuum", float(jax.device_get(delta)))
    add_tracking_entry("cg", "epsilon", float(epsilon))
    add_tracking_entry("parameter", "nu", float(nu))
    rho = float(np.quantile(g, nu))
    model = Model(params, DataSet(X, dtype=dt), alpha=alpha, rho=rho)
    model.is_one_class = True
    model.n_iter = iterations
    return model
