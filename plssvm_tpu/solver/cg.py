"""Matrix-free Conjugate Gradient solver for the LS-SVM dual system.

Solves ``(K + I/C) a = y`` after the dimensionality reduction that folds the
last data point into the system (reference: include/plssvm/backends/
gpu_csvm.hpp:477-654, src/plssvm/backends/OpenMP/csvm.cpp:71-183):

- ``dept = n - 1`` rows are solved, not ``n``
- ``q[i] = k(x_i, x_last)``; ``QA_cost = k(x_last, x_last) + 1/C``
- rhs ``b[i] = y[i] - y[n-1]``
- implicit matrix ``A_hat[i][j] = k(x_i,x_j) + QA_cost - q[i] - q[j]``
  plus ``1/C`` on the diagonal
- start vector ``x = 1``; residual ``r = b - A_hat x``
- stop when ``r.r <= eps^2 * (r0.r0)``; every 50th iteration the residual is
  recomputed exactly as ``r = b - A_hat x`` to fight floating-point drift —
  this cadence is what keeps f32 CG viable on TPU
- bias ``= y_last + QA_cost * sum(alpha) - q.alpha``;
  ``alpha_n = -sum(alpha)``; returns ``rho = -bias``

TPU-native design: the whole solve is ONE jitted function whose loop is a
``lax.while_loop`` — every CG iteration stays on device.  The reference
instead round-trips vectors between host and device twice per iteration
(gpu_csvm.hpp:585-633); removing that is the main structural speedup.

The core (:func:`cg_ls_svm_core`) is written against abstract ``dot`` /
``vsum`` reductions and an abstract kernel matvec so the multi-chip solver
(plssvm_tpu.parallel.sharded) can run the *same* algorithm inside a
``shard_map`` with ``psum``-reduced scalars — no second CG implementation.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..kernel_functions import (
    DISTANCE_KERNELS,
    kernel_against_point,
    kernel_self_diag,
    uses_pallas_kernels,
)
from ..parameter import KernelFunctionType
from ..ops.matvec import (
    DEFAULT_ROW_BLOCK,
    distance_kernel_matvec_sym,
    kernel_matvec_xla,
    linear_kernel_matvec,
)
from ..ops.pallas_matvec import PALLAS_MAX_OPERAND_BYTES  # re-export (compat)

#: exact-residual recomputation cadence (reference: gpu_csvm.hpp:595)
EXACT_RESIDUAL_INTERVAL = 50


def _two_sum(a, b):
    """Error-free transformation: a + b = s + err exactly (Knuth TwoSum)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def compensated_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Double-float pairwise sum: ~exact accumulation in the input dtype.

    TPUs have no f64 compute, so the f64 scalar accumulators the reference
    gets for free (it solves in double, gpu_csvm.hpp:617-619) are emulated
    with an error-free pairwise fold: at every halving step the rounding
    error of each addition is captured by TwoSum and carried in a
    compensation vector.  log2(n) fused vector ops — O(n) work, no scan.
    The result equals f64 accumulation of the (already-rounded) f32 inputs
    to within O(eps^2).  This is SURVEY.md §7 hard-part #1.

    A 2-D input is reduced along axis 0 (one compensated sum per column —
    the multiclass block-CG reduction); 1-D reduces to a scalar.
    """
    s = x if x.ndim > 1 else x.reshape(-1)
    c = jnp.zeros_like(s)
    while s.shape[0] > 1:
        n = s.shape[0]
        half = (n + 1) // 2
        if n % 2 == 1:
            pad = jnp.zeros((1,) + s.shape[1:], s.dtype)
            s = jnp.concatenate([s, pad])
            c = jnp.concatenate([c, pad])
        s, err = _two_sum(s[:half], s[half:])
        c = c[:half] + c[half:] + err
    return (s + c)[0]


def compensated_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product with double-float accumulation of the f32 products."""
    return compensated_sum(a * b)


class CGResult(NamedTuple):
    """Solve outputs (still padded; the host wrapper unpads).

    ``r``/``d`` are returned alongside the solution so a partial solve can be
    checkpointed and resumed exactly (plssvm_tpu.solver.checkpoint).
    """

    x: jnp.ndarray        # solution over the padded dept axis
    rho: jnp.ndarray      # -bias
    alpha_last: jnp.ndarray  # the folded-out last alpha = -sum(x)
    iterations: jnp.ndarray
    delta: jnp.ndarray    # final squared residual norm
    delta0: jnp.ndarray   # initial squared residual norm
    r: jnp.ndarray        # final residual vector
    d: jnp.ndarray        # final search direction




def _make_kernel_matvec(
    kind: KernelFunctionType, degree: int, impl: str, row_block: int,
    precision: str = "f32",
):
    """Select the K@v implementation for the static configuration.

    The MXU Pallas kernels require a Gram-expressible kernel; the
    laplacian / chi-squared distance reductions are inherently VPU work
    but get their OWN fused Pallas walk (ops/pallas_distance.py — VMEM-
    resident tiles, symmetric dual contraction, no broadcast temporaries)
    on the pallas impl.  The linear kernel always uses the factored
    O(n d) path — a fused Pallas walk over the full kernel matrix could
    never beat it.

    ``precision="bf16"`` (Gram Pallas path only) casts the Gram
    contraction inputs to bfloat16 with f32 accumulation — ~2x MXU rate
    and half the HBM traffic; see ``solve_ls_svm``'s gram_precision
    contract.
    """
    if impl == "pallas" and uses_pallas_kernels(kind):
        from ..ops.pallas_matvec import kernel_matvec_pallas_big

        def kv(X, sq_norms, v, gamma, coef0):
            # size-agnostic: one dual-contraction call when the operand fits
            # the per-call 32-bit offset range, a triangle of chunk-pair
            # calls beyond it (the round-1 XLA fallback at >1.5 GiB is gone)
            return kernel_matvec_pallas_big(
                X, sq_norms, v, kind=kind, gamma=gamma, coef0=coef0,
                degree=degree, precision=precision,
            )

        return kv

    if impl == "pallas" and kind in DISTANCE_KERNELS:
        from ..ops.pallas_distance import (
            distance_matvec_pallas_big,
            distance_supported,
        )

        def kv(X, sq_norms, v, gamma, coef0):
            if distance_supported(X.shape[0], X.shape[1]):
                # trace-time heads-up: the whole chunk composition runs as
                # ONE device program per matvec; on runtimes with a strict
                # device-call watchdog (e.g. the tunneled dev TPU, ~60-80 s)
                # a VPU-bound matvec beyond ~2e14 ops can kill the worker —
                # prefer multi-chip (the ring divides per-chip work) or the
                # explicit solver where K fits (BENCHMARKS.md)
                m_, d_ = X.shape
                per_elem = 3 if kind == KernelFunctionType.LAPLACIAN else 6
                if per_elem * float(m_) * m_ * d_ / 2 > 2e14:
                    import warnings

                    warnings.warn(
                        f"distance-kernel matvec at {m_} x {d_} is "
                        "~minutes of VPU work per CG iteration in one "
                        "device call — runtimes with a device-call "
                        "watchdog may kill it; consider multi-chip or "
                        "solver='cg_explicit' if K fits.",
                        stacklevel=2,
                    )
                return distance_matvec_pallas_big(
                    X, v, kind=kind, gamma=gamma
                )
            # unpadded shapes (rows not a 128-multiple) keep the XLA walk
            return distance_kernel_matvec_sym(
                X, v, gamma, kind=kind,
                row_block=min(row_block, X.shape[0]),
            ) if X.shape[0] % min(row_block, X.shape[0]) == 0 else (
                kernel_matvec_xla(
                    X, sq_norms, v, kind=kind, gamma=gamma, coef0=coef0,
                    degree=degree, row_block=row_block,
                )
            )

        return kv

    def kv(X, sq_norms, v, gamma, coef0):
        if kind == KernelFunctionType.LINEAR:
            return linear_kernel_matvec(X, v)
        m = X.shape[0]
        if kind in DISTANCE_KERNELS and m % min(row_block, m) == 0:
            # training matvec is K(X, X) @ v: walk only the upper triangle
            # of block pairs — ~2x less of the VPU-bound distance work
            return distance_kernel_matvec_sym(
                X, v, gamma, kind=kind, row_block=row_block
            )
        return kernel_matvec_xla(
            X, sq_norms, v, kind=kind, gamma=gamma, coef0=coef0,
            degree=degree, row_block=row_block,
        )

    return kv


def cg_ls_svm_core(
    X: jnp.ndarray,        # (m_local, d) rows owned by this shard (zero-padded)
    x_last: jnp.ndarray,   # (d,) the folded-out last data point (replicated)
    y: jnp.ndarray,        # (m_local,) mapped labels, 0 on padding
    y_last: jnp.ndarray,   # scalar mapped label of the last point
    mask: jnp.ndarray,     # (m_local,) 1.0 on real rows, 0.0 on padding
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    kernel_mv: Callable,   # (X, sq_norms, v, gamma, coef0) -> K @ v over local rows
    dot: Callable = jnp.dot,    # GLOBAL dot product (psum'd when sharded)
    vsum: Callable = jnp.sum,   # GLOBAL vector sum (psum'd when sharded)
    init_state=None,       # optional (x, r, d, delta, delta0, it) to resume from
    preconditioner: str = "none",  # "none" (exact reference semantics) | "jacobi"
    kernel_mv_exact: Callable = None,  # full-precision K @ v for the exact residual
    x_init=None,           # optional warm-start solution (replaces x0 = 1)
    weights=None,          # optional (m_local,) per-sample weights s_i and
    weight_last=None,      # the folded-out last row's weight — Suykens'
                           # weighted LS-SVM: the regularizer is 1/(C s_i)
    debug: bool = False,   # checkify NaN/Inf guards on the CG state
) -> CGResult:
    """The CG algorithm, agnostic to single-chip vs sharded execution.

    When sharded, ``X/y/mask`` hold this chip's row block, ``kernel_mv``
    computes this chip's rows of ``K @ v`` (e.g. via a ring rotation of column
    blocks over ICI), and ``dot``/``vsum`` are psum-reduced so every chip sees
    identical CG scalars.

    ``init_state`` resumes a previous solve mid-CG (checkpoint/resume — a
    capability the reference lacks; its only checkpoint is the finished model
    file, SURVEY.md §5).

    ``preconditioner="jacobi"`` runs *preconditioned* CG with the diagonal of
    the implicit matrix — ``diag = k(x_i,x_i) + QA_cost - 2 q_i + 1/C`` —
    an O(n)-cost improvement over the reference (which has no preconditioner)
    that reduces time-to-epsilon on ill-conditioned problems.  The stop
    criterion stays the reference's plain ``r.r <= eps^2 r0.r0`` either way.

    ``kernel_mv_exact``: optional alternative matvec for the INITIAL
    residual and the every-50th exact recomputation ``r = b - A x``.
    Default (and the only configuration the standard wrappers use): the
    same ``kernel_mv``.  WARNING — a higher-precision recompute mixed with
    reduced-precision iterations breaks CG's conjugacy and stalls (see the
    precision-consistency note above ``solve_ls_svm_multi``); only pass a
    different operator from solver variants designed for it.

    ``debug=True`` inserts ``checkify.check`` NaN/Inf guards on the CG
    state (delta, the step size rz/d.Ad, the iterate x) with iteration
    context.  Without the guard, a poisoned input silently terminates the
    loop "converged" (the stop test ``NaN > target`` is False) and the
    fit returns garbage; with it the caller's ``checkify.checkify``
    wrapper raises a located error instead (CSVM(debug=True) /
    ``solve_checked``).  Extends SURVEY §5's sanitizer row — the
    reference has no runtime numeric guard at all.
    """
    dtype = X.dtype
    cost_inv = 1.0 / cost
    # per-row diagonal regularizer: 1/C (reference) or 1/(C s_i) for
    # Suykens-style weighted LS-SVM (sample/class weights — EXTENSION)
    if weights is None:
        civ = cost_inv
        civ_last = cost_inv
    else:
        civ = (cost_inv / weights) * mask
        civ_last = cost_inv / weight_last
    sq_norms = jnp.sum(X * X, axis=-1)

    # q[i] = k(x_i, x_last)  (reference: gpu_csvm.hpp:505, q_kernel.cu:16-49)
    q = kernel_against_point(X, x_last, kind, gamma, coef0, degree) * mask
    # QA_cost = k(x_last, x_last) + 1/C  (gpu_csvm.hpp:508) — the 1/C term
    # is the folded-out LAST row's regularizer, hence weight_last
    xl_sq = jnp.dot(x_last, x_last)
    qa = kernel_self_diag(xl_sq, kind, gamma, coef0, degree)
    QA_cost = qa + civ_last

    # rhs: b = y[:dept] - y_last  (gpu_csvm.hpp:511-513)
    b = (y - y_last) * mask

    def _matvec_with(kmv, v):
        # A_hat @ v = K@v + (QA_cost - q)*sum(v) - (q.v)*1 + diag/C * v; the
        # rank-1 epilogue needs the GLOBAL sum(v) and q.v
        s = vsum(v)
        qv = dot(q, v)
        out = kmv(X, sq_norms, v, gamma, coef0)
        out = out + (QA_cost - q) * s - qv + civ * v
        return out * mask

    def matvec(v):
        return _matvec_with(kernel_mv, v)

    def matvec_exact(v):
        return _matvec_with(kernel_mv_exact or kernel_mv, v)

    if preconditioner == "jacobi":
        # diag(A_hat) = k(x_i, x_i) + QA_cost - 2 q_i + 1/(C s_i)
        k_diag = kernel_self_diag(sq_norms, kind, gamma, coef0, degree)
        diag = k_diag + QA_cost - 2.0 * q + civ
        minv = mask / diag

        def precond(r):
            return minv * r
    else:
        def precond(r):
            return r

    if init_state is None:
        # start vector x = 1 on real rows (OpenMP/csvm.cpp:95), or the
        # caller's warm start (a previous fit's alpha)
        x0 = mask.astype(dtype) if x_init is None else x_init.astype(dtype) * mask
        r0 = b - matvec_exact(x0)
        delta_init = dot(r0, r0)
        if x_init is None:
            delta0 = delta_init
        else:
            # the stop criterion is RELATIVE (eps^2 * delta0); anchoring
            # delta0 to the warm residual would demand eps^2 of an already
            # tiny value and never terminate.  Anchor it to the reference's
            # cold start (x = 1) instead — one extra matvec — so a warm fit
            # stops at exactly the accuracy a cold fit would
            r_cold = b - matvec_exact(mask.astype(dtype))
            delta0 = dot(r_cold, r_cold)
        d_init = precond(r0)
        it0 = jnp.asarray(0, jnp.int32)
    else:
        x0, r0, d_init, delta_init, delta0, it0 = init_state
        it0 = jnp.asarray(it0, jnp.int32)
    target = eps * eps * delta0

    use_pcg = preconditioner == "jacobi"

    class State(NamedTuple):
        it: jnp.ndarray
        x: jnp.ndarray
        r: jnp.ndarray
        d: jnp.ndarray
        delta: jnp.ndarray    # r.r — drives the reference stop criterion
        rz: jnp.ndarray       # r.z (== delta when unpreconditioned)

    def cond(s: State):
        return jnp.logical_and(s.it < max_iter, s.delta > target)

    if debug:
        from jax.experimental import checkify

        # a NaN initial residual would make cond() False immediately (NaN >
        # target is False) and the "converged" result would be garbage —
        # guard before the loop ever runs
        checkify.check(
            jnp.isfinite(delta_init),
            "initial CG residual |r0|^2 is non-finite — the training data, "
            "labels or kernel parameters contain NaN/Inf",
        )

    def body(s: State) -> State:
        Ad = matvec(s.d)
        dAd = dot(s.d, Ad)
        alpha_cd = s.rz / dAd
        x = s.x + alpha_cd * s.d
        # every 50th iteration: exact residual r = b - A x (gpu_csvm.hpp:595-609)
        r = jax.lax.cond(
            (s.it % EXACT_RESIDUAL_INTERVAL) == (EXACT_RESIDUAL_INTERVAL - 1),
            lambda: b - matvec_exact(x),
            lambda: s.r - alpha_cd * Ad,
        )
        delta = dot(r, r)
        if debug:
            checkify.check(
                jnp.isfinite(alpha_cd),
                "CG step size rz/d.Ad became non-finite at iteration {it} "
                "(d.Ad = {dad}) — singular/indefinite system or numeric "
                "blowup",
                it=s.it, dad=dAd,
            )
            checkify.check(
                jnp.isfinite(delta),
                "CG residual |r|^2 became non-finite at iteration {it}",
                it=s.it,
            )
            checkify.check(
                jnp.all(jnp.isfinite(x)),
                "CG iterate x contains non-finite values at iteration {it}",
                it=s.it,
            )
        if use_pcg:
            z = precond(r)
            rz = dot(r, z)
        else:
            z = r
            rz = delta
        beta = rz / s.rz
        d = beta * s.d + z
        return State(s.it + 1, x, r, d, delta, rz)

    # r.z for the current residual; on resume the checkpointed d is NOT z,
    # so recompute from r rather than using d
    rz_init = dot(r0, precond(r0)) if use_pcg else delta_init
    init = State(it0, x0, r0, d_init, delta_init, rz_init)
    final = jax.lax.while_loop(cond, body, init)

    # bias and the folded-out last alpha (gpu_csvm.hpp:648-653)
    alpha_sum = vsum(final.x)
    bias = y_last + QA_cost * alpha_sum - dot(q, final.x)
    return CGResult(
        x=final.x,
        rho=-bias,
        alpha_last=-alpha_sum,
        iterations=final.it,
        delta=final.delta,
        delta0=delta0,
        r=final.r,
        d=final.d,
    )


def ridge_cg_core(
    b: jnp.ndarray,        # (m_local,) rhs — the one-class mask (1 on real rows)
    matvec,                # v -> A @ v over the local rows (masked)
    dot=jnp.dot,           # GLOBAL dot product (psum'd when sharded)
    *,
    eps,
    max_iter,
    x_init=None,           # optional warm start (pruning refits)
    init_state=None,       # optional (x, r, d, delta, delta0, it) to resume
    debug: bool = False,   # checkify NaN/Inf guards (see cg_ls_svm_core)
):
    """Plain ridge CG ``A x = b``, agnostic to single-chip vs sharded runs.

    The one-class LS-SVM solve (one_class.py): ``A = K + I/C`` — the
    classifier's implicit matrix with q = 0 and QA_cost = 0, so there is no
    dimensionality reduction, no rank-1 epilogue and no bias recovery.  The
    convergence contract is the classifier's (reference:
    gpu_csvm.hpp:595-619): relative squared-residual stop
    ``delta <= eps^2 * delta0`` with an exact residual recomputation every
    50 iterations.  ``x_init`` warm-starts from a previous solve; the stop
    target stays anchored to the cold start (x0 = 0, so delta0 = b.b — no
    extra matvec needed, unlike the classifier's x0 = 1 anchor).
    ``init_state`` resumes a checkpointed solve mid-CG (solver.checkpoint),
    the one-class analog of ``cg_ls_svm_core``'s resume.

    Returns ``(x, r, d, delta, delta0, iterations)`` — r/d/delta are the
    live solver state a checkpoint needs.
    """
    if init_state is not None:
        x, r, d, delta, delta0, it0 = init_state
        it0 = jnp.asarray(it0, jnp.int32)
    else:
        # cold anchor: x0 = 0 gives r = b, so delta0 = b.b always
        delta0 = dot(b, b)
        if x_init is None:
            x = jnp.zeros_like(b)
            r = b
            delta = delta0
        else:
            x = x_init.astype(b.dtype)
            r = b - matvec(x)
            delta = dot(r, r)
        d = r
        it0 = jnp.asarray(0, jnp.int32)
    target = eps * eps * delta0

    def cond(state):
        x, r, d, delta, it = state
        return jnp.logical_and(it < max_iter, delta > target)

    if debug:
        from jax.experimental import checkify

        checkify.check(
            jnp.isfinite(delta),
            "initial ridge-CG residual |r0|^2 is non-finite — the training "
            "data or kernel parameters contain NaN/Inf",
        )

    def body(state):
        x, r, d, delta, it = state
        Ad = matvec(d)
        dAd = dot(d, Ad)
        a = delta / dAd
        x = x + a * d
        r = jax.lax.cond(
            (it % EXACT_RESIDUAL_INTERVAL) == (EXACT_RESIDUAL_INTERVAL - 1),
            lambda: b - matvec(x),
            lambda: r - a * Ad,
        )
        delta_new = dot(r, r)
        if debug:
            checkify.check(
                jnp.isfinite(a),
                "ridge-CG step size became non-finite at iteration {it} "
                "(d.Ad = {dad})",
                it=it, dad=dAd,
            )
            checkify.check(
                jnp.isfinite(delta_new),
                "ridge-CG residual |r|^2 became non-finite at iteration "
                "{it}",
                it=it,
            )
            checkify.check(
                jnp.all(jnp.isfinite(x)),
                "ridge-CG iterate contains non-finite values at iteration "
                "{it}",
                it=it,
            )
        beta = delta_new / delta
        d = r + beta * d
        return x, r, d, delta_new, it + 1

    x, r, d, delta, it = jax.lax.while_loop(
        cond, body, (x, r, d, delta, it0)
    )
    return x, r, d, delta, delta0, it


def _scalar_reductions(scalars: str):
    """(dot, vsum) pair for the requested scalar accumulation mode."""
    if scalars == "compensated":
        return compensated_dot, compensated_sum
    return jnp.dot, jnp.sum


def solve_checked(solve_fn, *args, **kwargs):
    """Run a CG solver wrapper under checkify with the NaN/Inf guards on.

    Forces ``debug=True`` (the cores' checkify.check guards on delta /
    step size / iterate), functionalizes the error state through the
    jitted while_loop, and discharges it on the host: a numeric blowup
    raises ``checkify.JaxRuntimeError`` carrying the failing-iteration
    message instead of returning a silently-"converged" garbage model.
    Used by ``CSVM(debug=True)`` / ``fit_one_class(..., debug=True)``.
    """
    from jax.experimental import checkify

    kwargs = dict(kwargs, debug=True)
    err, result = checkify.checkify(
        functools.partial(solve_fn, **kwargs)
    )(*args)
    err.throw()
    return result


class MultiCGResult(NamedTuple):
    """Block-CG solve outputs for C one-vs-all classes (still padded)."""

    x: jnp.ndarray          # (m, C) solutions over the padded dept axis
    rho: jnp.ndarray        # (C,) -bias per class
    alpha_last: jnp.ndarray  # (C,) folded-out last alpha per class
    iterations: jnp.ndarray  # scalar: block iterations run (= max over classes)
    iterations_per_class: jnp.ndarray  # (C,) iterations each class was active
    delta: jnp.ndarray      # (C,) final squared residual norms
    delta0: jnp.ndarray     # (C,) initial squared residual norms
    r: jnp.ndarray          # (m, C) final residuals
    d: jnp.ndarray          # (m, C) final search directions


def cg_ls_svm_multi_core(
    X: jnp.ndarray,        # (m_local, d) rows owned by this shard (zero-padded)
    x_last: jnp.ndarray,   # (d,) the folded-out last data point (replicated)
    Y: jnp.ndarray,        # (m_local, C) one-vs-all targets, 0 on padding
    y_last: jnp.ndarray,   # (C,) targets of the folded-out last point
    mask: jnp.ndarray,     # (m_local,) 1.0 on real rows, 0.0 on padding
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    kernel_mm: Callable,   # (X, sq_norms, V, gamma, coef0) -> K @ V, V (m, C)
    colsum: Callable = None,  # GLOBAL per-column sum (m, C) -> (C,)
    preconditioner: str = "none",
    init_state=None,       # optional (x, r, d, delta, delta0, it) to resume
    kernel_mm_exact: Callable = None,  # full-precision K @ V (see cg_ls_svm_core)
    x_init=None,           # optional (m, C) warm-start block (replaces x0 = 1)
    weights=None,          # optional per-sample weights (see cg_ls_svm_core)
    weight_last=None,
    debug: bool = False,   # checkify NaN/Inf guards (see cg_ls_svm_core)
) -> MultiCGResult:
    """One-vs-all multiclass LS-SVM: C binary systems solved as ONE block CG.

    EXTENSION beyond the reference (which rejects > 2 labels,
    data_set.hpp:443).  All C systems share the SAME implicit matrix
    ``A_hat`` — only the right-hand sides differ — so the O(n^2 d) kernel
    matvec is computed ONCE per iteration against the (m, C) block of search
    directions: the Gram tiles stream through the MXU a single time and are
    contracted with all C columns.  A sequential one-vs-all (the GPU-library
    norm) pays the Gram C times; this block formulation is the TPU-native
    answer — per-class cost approaches O(n^2 d / C)·C ≈ the binary cost.

    Per-class scalars (alpha_cd, beta, delta) are vectors of length C;
    converged columns are FROZEN (their alpha/beta forced to 0, their
    x/r/d left untouched) so late-converging classes never perturb finished
    ones.  The loop runs until every class meets the reference stop rule
    ``delta_c <= eps^2 * delta0_c`` or ``max_iter`` is hit.  The 50-iteration
    exact-residual recomputation applies to the whole block.
    """
    dtype = X.dtype
    cost_inv = 1.0 / cost
    if weights is None:
        civ = cost_inv
        civ_col = cost_inv
        civ_last = cost_inv
    else:
        civ = (cost_inv / weights) * mask
        civ_col = civ[:, None]
        civ_last = cost_inv / weight_last
    sq_norms = jnp.sum(X * X, axis=-1)
    if colsum is None:
        def colsum(M):
            return jnp.sum(M, axis=0)

    q = kernel_against_point(X, x_last, kind, gamma, coef0, degree) * mask
    xl_sq = jnp.dot(x_last, x_last)
    qa = kernel_self_diag(xl_sq, kind, gamma, coef0, degree)
    QA_cost = qa + civ_last

    B = (Y - y_last[None, :]) * mask[:, None]

    def _matmat_with(kmm, V):
        # A_hat @ V column-wise; the rank-1 epilogue terms need the GLOBAL
        # per-column sums s_c = sum(V[:, c]) and qv_c = q . V[:, c]
        s = colsum(V)
        qv = colsum(q[:, None] * V)
        out = kmm(X, sq_norms, V, gamma, coef0)
        out = (
            out
            + (QA_cost - q)[:, None] * s[None, :]
            - qv[None, :]
            + civ_col * V
        )
        return out * mask[:, None]

    def matmat(V):
        return _matmat_with(kernel_mm, V)

    def matmat_exact(V):
        return _matmat_with(kernel_mm_exact or kernel_mm, V)

    if preconditioner == "jacobi":
        k_diag = kernel_self_diag(sq_norms, kind, gamma, coef0, degree)
        diag = k_diag + QA_cost - 2.0 * q + civ
        minv = mask / diag

        def precond(R):
            return minv[:, None] * R
    else:
        def precond(R):
            return R

    use_pcg = preconditioner == "jacobi"
    C = Y.shape[1]

    if init_state is None:
        if x_init is None:
            x0 = jnp.broadcast_to(
                mask[:, None], (mask.shape[0], C)
            ).astype(dtype)
            r0 = B - matmat_exact(x0)
            delta_init = colsum(r0 * r0)
            delta0 = delta_init
        else:
            x0 = x_init.astype(dtype) * mask[:, None]
            r0 = B - matmat_exact(x0)
            delta_init = colsum(r0 * r0)
            # anchor the relative stop target to the cold start (see the
            # binary core): warm fits stop at cold-fit accuracy
            ones = jnp.broadcast_to(
                mask[:, None], (mask.shape[0], C)
            ).astype(dtype)
            r_cold = B - matmat_exact(ones)
            delta0 = colsum(r_cold * r_cold)
        d_init = precond(r0)
        it0 = jnp.asarray(0, jnp.int32)
        itpc0 = jnp.zeros((C,), jnp.int32)
    else:
        x0, r0, d_init, delta_init, delta0, it0, itpc0 = init_state
        it0 = jnp.asarray(it0, jnp.int32)
    target = eps * eps * delta0

    class State(NamedTuple):
        it: jnp.ndarray
        itpc: jnp.ndarray     # (C,) per-class active-iteration counts
        x: jnp.ndarray
        r: jnp.ndarray
        d: jnp.ndarray
        delta: jnp.ndarray    # (C,) r.r per class
        rz: jnp.ndarray       # (C,) r.z per class

    def cond(s: State):
        return jnp.logical_and(s.it < max_iter, jnp.any(s.delta > target))

    if debug:
        from jax.experimental import checkify

        checkify.check(
            jnp.all(jnp.isfinite(delta_init)),
            "initial block-CG residuals contain non-finite values — the "
            "training data, labels or kernel parameters contain NaN/Inf",
        )

    def body(s: State) -> State:
        active = s.delta > target                       # (C,) frozen classes
        Ad = matmat(s.d)
        dAd = colsum(s.d * Ad)
        alpha_cd = jnp.where(active, s.rz / jnp.where(active, dAd, 1.0), 0.0)
        x = s.x + alpha_cd[None, :] * s.d
        r = jax.lax.cond(
            (s.it % EXACT_RESIDUAL_INTERVAL) == (EXACT_RESIDUAL_INTERVAL - 1),
            lambda: B - matmat_exact(x),
            lambda: s.r - alpha_cd[None, :] * Ad,
        )
        delta = colsum(r * r)
        if debug:
            checkify.check(
                jnp.all(jnp.isfinite(alpha_cd)),
                "block-CG step sizes contain non-finite values at "
                "iteration {it} — singular/indefinite system or numeric "
                "blowup",
                it=s.it,
            )
            checkify.check(
                jnp.all(jnp.isfinite(delta)),
                "block-CG residuals contain non-finite values at "
                "iteration {it}",
                it=s.it,
            )
            checkify.check(
                jnp.all(jnp.isfinite(x)),
                "block-CG iterate contains non-finite values at "
                "iteration {it}",
                it=s.it,
            )
        if use_pcg:
            z = precond(r)
            rz = colsum(r * z)
        else:
            z = r
            rz = delta
        beta = jnp.where(active, rz / s.rz, 0.0)
        d = jnp.where(active[None, :], beta[None, :] * s.d + z, s.d)
        return State(
            s.it + 1, s.itpc + active.astype(jnp.int32), x, r, d, delta, rz
        )

    rz_init = colsum(r0 * precond(r0)) if use_pcg else delta_init
    init = State(it0, itpc0, x0, r0, d_init, delta_init, rz_init)
    final = jax.lax.while_loop(cond, body, init)

    alpha_sum = colsum(final.x)                          # (C,)
    bias = y_last + QA_cost * alpha_sum - colsum(q[:, None] * final.x)
    return MultiCGResult(
        x=final.x,
        rho=-bias,
        alpha_last=-alpha_sum,
        iterations=final.it,
        iterations_per_class=final.itpc,
        delta=final.delta,
        delta0=delta0,
        r=final.r,
        d=final.d,
    )


def _make_kernel_matmat(
    kind: KernelFunctionType, degree: int, row_block: int, impl: str = "xla",
    precision: str = "f32",
):
    """K @ V implementation for the block (multiclass) solve.

    ``impl="pallas"`` uses the dual-contraction block matmat
    (ops/pallas_matvec.py::kernel_matmat_pallas_big): the symmetric
    upper-triangle walk contracts each Gram tile with all C class-major
    columns via tiny MXU matmuls, keeping the ~2x saving over the full
    walk.  ``impl="xla"`` is the shared-Gram blockwise scan — each Gram row
    block computed once and contracted with all C columns (the portable
    oracle path).
    """
    if impl == "pallas" and uses_pallas_kernels(kind):
        from ..ops.pallas_matvec import kernel_matmat_pallas_big

        def kmm(X, sq_norms, V, gamma, coef0):
            return kernel_matmat_pallas_big(
                X, sq_norms, V, kind=kind, gamma=gamma, coef0=coef0,
                degree=degree, precision=precision,
            )

        return kmm

    if impl == "pallas" and kind in DISTANCE_KERNELS:
        from ..ops.pallas_distance import (
            distance_matmat_pallas_big,
            distance_matmat_supported,
        )

        def kmm(X, sq_norms, V, gamma, coef0):
            if distance_matmat_supported(
                X.shape[0], X.shape[1], V.shape[1]
            ):
                return distance_matmat_pallas_big(
                    X, V, kind=kind, gamma=gamma
                )
            m = X.shape[0]
            if m % min(row_block, m) == 0:
                return distance_kernel_matvec_sym(
                    X, V, gamma, kind=kind,
                    row_block=min(row_block, m),
                )
            return kernel_matvec_xla(
                X, sq_norms, V, kind=kind, gamma=gamma, coef0=coef0,
                degree=degree, row_block=row_block,
            )

        return kmm

    def kmm(X, sq_norms, V, gamma, coef0):
        if kind == KernelFunctionType.LINEAR:
            return linear_kernel_matvec(X, V)
        m = X.shape[0]
        if kind in DISTANCE_KERNELS and m % min(row_block, m) == 0:
            # block matmat shares the triangle walk: each distance block is
            # contracted with all C columns both ways
            return distance_kernel_matvec_sym(
                X, V, gamma, kind=kind, row_block=row_block
            )
        return kernel_matvec_xla(
            X, sq_norms, V, kind=kind, gamma=gamma, coef0=coef0,
            degree=degree, row_block=row_block,
        )

    return kmm


class PairsCGResult(NamedTuple):
    """Batched pair-machine CG solve outputs (still padded per machine)."""

    x: jnp.ndarray          # (P, m) solutions over the padded dept axes
    rho: jnp.ndarray        # (P,) -bias per machine
    alpha_last: jnp.ndarray  # (P,) folded-out last alpha per machine
    iterations: jnp.ndarray  # scalar: block iterations run (= max over pairs)
    iterations_per_pair: jnp.ndarray  # (P,) iterations each machine was active
    delta: jnp.ndarray      # (P,) final squared residual norms
    delta0: jnp.ndarray     # (P,) initial squared residual norms


def cg_ls_svm_pairs_core(
    Xb: jnp.ndarray,        # (P, m, d) per-machine rows (zero-padded)
    x_last_b: jnp.ndarray,  # (P, d) each machine's folded-out last point
    Yb: jnp.ndarray,        # (P, m) ±1 targets, 0 on padding
    y_last_b: jnp.ndarray,  # (P,) targets of the folded-out last points
    maskb: jnp.ndarray,     # (P, m) 1.0 on real rows, 0.0 on padding
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter_b: jnp.ndarray,  # (P,) per-machine iteration caps
    *,
    kind: KernelFunctionType,
    degree: int,
    kernel_bmv: Callable,   # (Xb, sq_b, Vb, gamma, coef0) -> batched K_p @ v_p
    bdot: Callable = None,  # per-machine dot: (P, m) x (P, m) -> (P,)
    bsum: Callable = None,  # per-machine sum: (P, m) -> (P,)
    preconditioner: str = "none",
    x_init=None,            # optional (P, m) warm-start block
    weights=None,           # optional (P, m) per-sample weights and
    weight_last=None,       # (P,) folded-out last weights (Suykens)
    debug: bool = False,    # checkify NaN/Inf guards (see cg_ls_svm_core)
) -> PairsCGResult:
    """All C(C-1)/2 one-vs-one machines solved as ONE batched CG.

    EXTENSION (TPU-native OAO design) — each pair machine is an independent
    LS-SVM system over its OWN row subset, so unlike the one-vs-all block CG
    (shared matrix, many right-hand sides, :func:`cg_ls_svm_multi_core`)
    every quantity here carries a leading machine axis: data (P, m, d),
    kernel matvec a batched ``K_p @ v_p`` (Gram tiles become batched MXU
    matmuls), and the CG scalars (alpha_cd, beta, delta) are (P,) vectors.
    A sequential per-machine loop pays one dispatch + compilation + kernel
    launch chain per machine; this core runs them all in a single jitted
    ``lax.while_loop`` — the dominant win for the many-small-machines
    regime OAO produces (P grows quadratically in C while each machine
    shrinks as 2n/C).

    Per-machine semantics are EXACTLY the binary core's: converged machines
    are frozen (their alpha/beta forced to 0) the moment they meet the
    reference stop rule ``delta_p <= eps^2 * delta0_p``, and each machine
    additionally stops at its own ``max_iter_b[p]`` cap (= its dept, the
    reference default), so results match the sequential path to floating-
    point tolerance.  The 50-iteration exact-residual recomputation applies
    to the whole block (reference: gpu_csvm.hpp:595).
    """
    dtype = Xb.dtype
    cost_inv = 1.0 / cost
    if weights is None:
        civ = cost_inv
        civ_last = cost_inv
    else:
        civ = (cost_inv / weights) * maskb
        civ_last = cost_inv / weight_last
    sq_b = jnp.sum(Xb * Xb, axis=-1)  # (P, m)
    if bdot is None:
        def bdot(A, V):
            return jnp.sum(A * V, axis=1)
    if bsum is None:
        def bsum(V):
            return jnp.sum(V, axis=1)

    # per-machine q / QA_cost (the vmapped "q kernel", q_kernel.cu:16-49)
    q = jax.vmap(
        lambda X, xl: kernel_against_point(X, xl, kind, gamma, coef0, degree)
    )(Xb, x_last_b) * maskb
    xl_sq = jnp.sum(x_last_b * x_last_b, axis=-1)
    qa = kernel_self_diag(xl_sq, kind, gamma, coef0, degree)
    QA_cost = qa + civ_last  # (P,)

    B = (Yb - y_last_b[:, None]) * maskb

    def matvec(V):
        s = bsum(V)
        qv = bdot(q, V)
        out = kernel_bmv(Xb, sq_b, V, gamma, coef0)
        out = (
            out
            + (QA_cost[:, None] - q) * s[:, None]
            - qv[:, None]
            + civ * V
        )
        return out * maskb

    if preconditioner == "jacobi":
        k_diag = kernel_self_diag(sq_b, kind, gamma, coef0, degree)
        diag = k_diag + QA_cost[:, None] - 2.0 * q + civ
        minv = maskb / diag

        def precond(R):
            return minv * R
    else:
        def precond(R):
            return R

    use_pcg = preconditioner == "jacobi"
    P = Yb.shape[0]

    if x_init is None:
        x0 = maskb.astype(dtype)
        r0 = B - matvec(x0)
        delta_init = bdot(r0, r0)
        delta0 = delta_init
    else:
        x0 = x_init.astype(dtype) * maskb
        r0 = B - matvec(x0)
        delta_init = bdot(r0, r0)
        # anchor the relative stop target to the cold start (see the binary
        # core): warm fits stop at cold-fit accuracy
        r_cold = B - matvec(maskb.astype(dtype))
        delta0 = bdot(r_cold, r_cold)
    d_init = precond(r0)
    target = eps * eps * delta0

    class State(NamedTuple):
        it: jnp.ndarray
        itpp: jnp.ndarray     # (P,) per-machine active-iteration counts
        x: jnp.ndarray
        r: jnp.ndarray
        d: jnp.ndarray
        delta: jnp.ndarray    # (P,) r.r per machine
        rz: jnp.ndarray       # (P,) r.z per machine

    def active_of(s: State):
        return jnp.logical_and(s.delta > target, s.itpp < max_iter_b)

    def cond(s: State):
        return jnp.any(active_of(s))

    if debug:
        from jax.experimental import checkify

        checkify.check(
            jnp.all(jnp.isfinite(delta_init)),
            "initial pair-CG residuals contain non-finite values — the "
            "training data, labels or kernel parameters contain NaN/Inf",
        )

    def body(s: State) -> State:
        active = active_of(s)
        Ad = matvec(s.d)
        dAd = bdot(s.d, Ad)
        alpha_cd = jnp.where(active, s.rz / jnp.where(active, dAd, 1.0), 0.0)
        x = s.x + alpha_cd[:, None] * s.d
        r = jax.lax.cond(
            (s.it % EXACT_RESIDUAL_INTERVAL) == (EXACT_RESIDUAL_INTERVAL - 1),
            lambda: B - matvec(x),
            lambda: s.r - alpha_cd[:, None] * Ad,
        )
        delta = bdot(r, r)
        if debug:
            checkify.check(
                jnp.all(jnp.isfinite(alpha_cd)),
                "pair-CG step sizes contain non-finite values at "
                "iteration {it}",
                it=s.it,
            )
            checkify.check(
                jnp.all(jnp.isfinite(delta)),
                "pair-CG residuals contain non-finite values at "
                "iteration {it}",
                it=s.it,
            )
            checkify.check(
                jnp.all(jnp.isfinite(x)),
                "pair-CG iterate contains non-finite values at "
                "iteration {it}",
                it=s.it,
            )
        if use_pcg:
            z = precond(r)
            rz = bdot(r, z)
        else:
            z = r
            rz = delta
        beta = jnp.where(active, rz / s.rz, 0.0)
        d = jnp.where(active[:, None], beta[:, None] * s.d + z, s.d)
        return State(
            s.it + 1, s.itpp + active.astype(jnp.int32), x, r, d, delta, rz
        )

    rz_init = bdot(r0, precond(r0)) if use_pcg else delta_init
    # zeros_like(max_iter_b), not zeros((P,)): under the machine-sharded
    # shard_map (parallel.sharded.build_sharded_pairs_solver) the carry
    # must start with the same varying-mesh-axes type the body produces,
    # and max_iter_b carries the machine axis
    init = State(
        jnp.asarray(0, jnp.int32), jnp.zeros_like(max_iter_b),
        x0, r0, d_init, delta_init, rz_init,
    )
    final = jax.lax.while_loop(cond, body, init)

    alpha_sum = bsum(final.x)  # (P,)
    bias = y_last_b + QA_cost * alpha_sum - bdot(q, final.x)
    return PairsCGResult(
        x=final.x,
        rho=-bias,
        alpha_last=-alpha_sum,
        iterations=final.it,
        iterations_per_pair=final.itpp,
        delta=final.delta,
        delta0=delta0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "degree", "row_block", "preconditioner", "scalars", "debug",
    ),
)
def solve_ls_svm_pairs(
    Xb: jnp.ndarray,        # (P, m, d) per-machine zero-padded rows
    x_last_b: jnp.ndarray,  # (P, d)
    Yb: jnp.ndarray,        # (P, m) ±1 targets, 0 on padding
    y_last_b: jnp.ndarray,  # (P,)
    maskb: jnp.ndarray,     # (P, m)
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter_b: jnp.ndarray,  # (P,)
    *,
    kind: KernelFunctionType,
    degree: int,
    row_block: int = DEFAULT_ROW_BLOCK,
    preconditioner: str = "none",
    scalars: str = "plain",
    x_init=None,
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> PairsCGResult:
    """Single-device batched one-vs-one LS-SVM CG solve.

    The batched kernel matvec is the vmapped XLA block path — per-machine
    Gram blocks become one batched ``dot_general`` per scan step, which XLA
    tiles onto the MXU across the machine axis (exactly where small
    per-machine matmuls would under-utilize it).  The Pallas kernels are
    deliberately not used here: they pay off on LARGE single Gram operands,
    the opposite of the many-small-machines regime this solve targets (a
    large pair machine falls back to the sequential per-machine path,
    csvm._fit_oao's gate).
    """
    kv = _make_kernel_matvec(kind, degree, "xla", row_block)
    kernel_bmv = jax.vmap(kv, in_axes=(0, 0, 0, None, None))
    if scalars == "compensated":
        # compensated_sum reduces axis 0 with one compensated fold per
        # column — transpose the (P, m) machine-major blocks into it
        def bdot(A, V):
            return compensated_sum((A * V).T)

        def bsum(V):
            return compensated_sum(V.T)
    else:
        bdot = None
        bsum = None
    return cg_ls_svm_pairs_core(
        Xb, x_last_b, Yb, y_last_b, maskb, gamma, coef0, cost, eps,
        max_iter_b, kind=kind, degree=degree, kernel_bmv=kernel_bmv,
        bdot=bdot, bsum=bsum, preconditioner=preconditioner, x_init=x_init,
        weights=weights, weight_last=weight_last, debug=debug,
    )


# NOTE on precision consistency: the every-50th exact-residual recompute MUST
# use the SAME Gram precision as the per-iteration matvec.  It exists to fight
# floating-point *drift* in the cheap residual recurrence, not operator error:
# injecting a true-operator (multi-pass f32) residual into a CG whose search
# directions come from the single-pass operator breaks conjugacy — measured on
# the 10k x 200 RBF bench problem (cost=100, eps=1e-6), a mixed
# fast-iterations/"highest"-recompute CG stalls at max_iter with 65% train
# accuracy where the consistent single-pass CG converges in 121 iterations at
# 100%.  Users who need reference(f64)-grade solutions set
# gram_precision="highest" end-to-end (106 iterations on the same problem).
# The cores' ``kernel_mv_exact`` hook stays for solvers that CAN use an
# inconsistent recompute (e.g. restarted/flexible variants), but the standard
# wrappers never split precisions.


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "degree", "impl", "row_block", "preconditioner", "scalars",
        "gram_precision", "debug",
    ),
)
def solve_ls_svm_multi(
    X: jnp.ndarray,        # (m, d) zero-padded rows 0..dept-1
    x_last: jnp.ndarray,   # (d,)
    Y: jnp.ndarray,        # (m, C) one-vs-all targets, 0 on padding
    y_last: jnp.ndarray,   # (C,)
    mask: jnp.ndarray,     # (m,)
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,
    eps: jnp.ndarray,
    max_iter: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    impl: str = "xla",
    row_block: int = DEFAULT_ROW_BLOCK,
    preconditioner: str = "none",
    scalars: str = "plain",
    gram_precision: str = "f32",
    x_init=None,
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> MultiCGResult:
    """Single-device one-vs-all multiclass LS-SVM block-CG solve.

    ``x_init`` warm-starts the block CG from a previous fit's (m, C) alpha
    block (EXTENSION — e.g. refining a converged model at a tighter epsilon
    or re-fitting after a small C change); the residual block and stop
    thresholds are recomputed from it exactly.
    """
    kernel_mm = _make_kernel_matmat(
        kind, degree, row_block, impl, precision=gram_precision
    )
    colsum = compensated_sum if scalars == "compensated" else (
        lambda M: jnp.sum(M, axis=0)
    )
    return cg_ls_svm_multi_core(
        X, x_last, Y, y_last, mask, gamma, coef0, cost, eps, max_iter,
        kind=kind, degree=degree, kernel_mm=kernel_mm, colsum=colsum,
        preconditioner=preconditioner, x_init=x_init,
        weights=weights, weight_last=weight_last, debug=debug,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "degree", "impl", "row_block", "preconditioner", "scalars",
        "gram_precision", "debug",
    ),
)
def solve_ls_svm_multi_resume(
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
    x0: jnp.ndarray,       # checkpointed (m, C) solution block
    r0: jnp.ndarray,       # checkpointed (m, C) residual block
    d0: jnp.ndarray,       # checkpointed (m, C) search-direction block
    delta: jnp.ndarray,    # (C,) checkpointed squared residual norms
    delta0: jnp.ndarray,   # (C,) squared residual norms of the ORIGINAL start
    it0: jnp.ndarray,      # block iterations already done
    itpc0: jnp.ndarray,    # (C,) per-class active-iteration counts so far
    *,
    kind: KernelFunctionType,
    degree: int,
    impl: str = "xla",
    row_block: int = DEFAULT_ROW_BLOCK,
    preconditioner: str = "none",
    scalars: str = "plain",
    gram_precision: str = "f32",
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> MultiCGResult:
    """Continue a checkpointed one-vs-all block-CG solve."""
    kernel_mm = _make_kernel_matmat(
        kind, degree, row_block, impl, precision=gram_precision
    )
    colsum = compensated_sum if scalars == "compensated" else (
        lambda M: jnp.sum(M, axis=0)
    )
    return cg_ls_svm_multi_core(
        X, x_last, Y, y_last, mask, gamma, coef0, cost, eps, max_iter,
        kind=kind, degree=degree, kernel_mm=kernel_mm, colsum=colsum,
        preconditioner=preconditioner,
        init_state=(x0, r0, d0, delta, delta0, it0, itpc0),
        weights=weights, weight_last=weight_last, debug=debug,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "degree", "impl", "row_block", "preconditioner", "scalars",
        "gram_precision", "debug",
    ),
)
def solve_ls_svm(
    X: jnp.ndarray,        # (m, d) zero-padded rows 0..dept-1 (dept = n-1)
    x_last: jnp.ndarray,   # (d,) the folded-out last data point
    y: jnp.ndarray,        # (m,) mapped labels of rows 0..dept-1, 0 on padding
    y_last: jnp.ndarray,   # scalar mapped label of the last point
    mask: jnp.ndarray,     # (m,) 1.0 on real rows, 0.0 on padding
    gamma: jnp.ndarray,
    coef0: jnp.ndarray,
    cost: jnp.ndarray,     # the SVM C parameter
    eps: jnp.ndarray,
    max_iter: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    degree: int,
    impl: str = "xla",
    row_block: int = DEFAULT_ROW_BLOCK,
    preconditioner: str = "none",
    scalars: str = "plain",
    gram_precision: str = "f32",
    x_init=None,
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> CGResult:
    """Run the full LS-SVM CG solve on a single device.

    ``x_init`` warm-starts CG from a previous fit's alpha vector (EXTENSION;
    the residual and stop threshold are recomputed from it exactly, so a
    warm start from a converged solution terminates immediately).

    ``scalars="compensated"`` accumulates the CG scalar reductions (delta,
    d.Ad, q.v, sums) with double-float TwoSum folds — f64-equivalent
    accuracy on f32 TPUs (SURVEY.md §7 precision decision).

    ``gram_precision`` selects the Pallas Gram-contraction tier
    (ops/pallas_matvec module docstring): "f32" single-pass MXU (default),
    "bf16" + bfloat16 operand storage (half the HBM traffic), "highest"
    multi-pass full-f32 dots — reference(f64)-grade accuracy; converges on
    ill-conditioned systems where single-pass CG stalls at its residual
    floor.  Every matvec in the solve (incl. the exact-residual recompute)
    runs the SAME tier — see the precision-consistency note above
    ``solve_ls_svm_multi``.  The XLA path ignores the knob.
    """
    kernel_mv = _make_kernel_matvec(
        kind, degree, impl, row_block, precision=gram_precision
    )
    dot, vsum = _scalar_reductions(scalars)
    return cg_ls_svm_core(
        X, x_last, y, y_last, mask, gamma, coef0, cost, eps, max_iter,
        kind=kind, degree=degree, kernel_mv=kernel_mv, dot=dot, vsum=vsum,
        preconditioner=preconditioner, x_init=x_init,
        weights=weights, weight_last=weight_last, debug=debug,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "degree", "impl", "row_block", "preconditioner", "scalars",
        "gram_precision", "debug",
    ),
)
def solve_ls_svm_resume(
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
    x0: jnp.ndarray,       # checkpointed solution vector
    r0: jnp.ndarray,       # checkpointed residual
    d0: jnp.ndarray,       # checkpointed search direction
    delta: jnp.ndarray,    # checkpointed squared residual norm
    delta0: jnp.ndarray,   # squared residual norm of the ORIGINAL start
    it0: jnp.ndarray,      # iterations already done
    *,
    kind: KernelFunctionType,
    degree: int,
    impl: str = "xla",
    row_block: int = DEFAULT_ROW_BLOCK,
    preconditioner: str = "none",
    scalars: str = "plain",
    gram_precision: str = "f32",
    weights=None,
    weight_last=None,
    debug: bool = False,
) -> CGResult:
    """Continue a checkpointed LS-SVM CG solve (see solver.checkpoint)."""
    kernel_mv = _make_kernel_matvec(
        kind, degree, impl, row_block, precision=gram_precision
    )
    dot, vsum = _scalar_reductions(scalars)
    return cg_ls_svm_core(
        X, x_last, y, y_last, mask, gamma, coef0, cost, eps, max_iter,
        kind=kind, degree=degree, kernel_mv=kernel_mv, dot=dot, vsum=vsum,
        init_state=(x0, r0, d0, delta, delta0, it0),
        preconditioner=preconditioner,
        weights=weights, weight_last=weight_last, debug=debug,
    )
