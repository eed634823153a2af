"""Compact LS-SVM models: Suykens pruning and fixed-size (Nystroem) fits.

EXTENSION — the reference stores *every* training point as a support vector
(include/plssvm/model.hpp:49: "in LS-SVM all training points are support
vectors"), so its models are O(n) to store and O(n d) to evaluate.  This
module implements the two standard LS-SVM answers to that:

1. **Pruning** (`pruned_fit`) — Suykens, De Brabanter, Lukas & Vandewalle,
   "Weighted least squares support vector machines: robustness and sparse
   approximation" (Neurocomputing 48, 2002), §4: in LS-SVM the dual weight
   |alpha_i| is proportional to the point's error contribution, so the
   smallest-|alpha| points can be removed and the machine refit on the
   remainder with little accuracy loss.  Each refit here warm-starts from
   the surviving alpha (`fit(initial_model=)`), and with
   ``solver='cg_explicit'`` only the first round builds a kernel matrix
   from scratch, so the whole schedule costs a fraction of a cold fit per
   round.

2. **Fixed-size LS-SVM** (`nystroem_fit`) — Suykens et al., "Least Squares
   Support Vector Machines" (2002), ch. 6: pick m << n landmark points,
   build the Nystroem finite-dimensional feature map
   ``phi(x) = K_mm^{-1/2} k(Z, x)`` and solve the PRIMAL ridge system in
   that basis.  Training touches each data row once (O(n m) kernel
   evaluations, O(m^2) memory — the n x m feature block is streamed in row
   blocks and reduced into the (m+1) x (m+1) normal equations on device),
   so n is unbounded by device memory; the result is re-expressed as a
   standard m-support-vector model (``alpha = K_mm^{-1/2} w``), so
   prediction, model files and LIBSVM interop are the ordinary paths.

Both return ordinary :class:`~plssvm_tpu.model.Model` objects: score them
with ``csvm.score``, save them as LIBSVM model files, warm-start from them.
TPU-first shape: the Nystroem reduction is one ``lax.scan`` of fused
MXU kernel-block + feature-projection matmuls; no per-point host work.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .data_set import DataSet
from .exceptions import InvalidParameterError
from .kernel_functions import is_gram_kernel, kernel_block
from .model import Model
from .parameter import ClassificationType, KernelFunctionType


# ---------------------------------------------------------------------------
# Pruning (Suykens 2002 sparse approximation)
# ---------------------------------------------------------------------------


def _alpha_magnitude(alpha: np.ndarray) -> np.ndarray:
    """Per-point pruning score: |alpha| (binary) or row L2 norm (OAA)."""
    a = np.asarray(alpha, dtype=np.float64)
    if a.ndim == 1:
        return np.abs(a)
    return np.sqrt(np.sum(a * a, axis=1))


def _keep_with_class_floor(
    magnitude: np.ndarray, k: int, class_idx: Optional[np.ndarray]
) -> np.ndarray:
    """Indices of the k largest-magnitude points, each class kept non-empty.

    Plain top-k can silently drop an entire (small or well-separated) class,
    which would change the label mapping of the surviving DataSet; when that
    happens the class's single best point is swapped in for the worst kept
    point of an over-represented class.
    """
    order = np.argsort(-magnitude, kind="stable")
    keep = order[:k]
    if class_idx is None:
        return np.sort(keep)
    kept_classes = set(class_idx[keep].tolist())
    missing = [c for c in np.unique(class_idx) if c not in kept_classes]
    if missing:
        keep = list(keep)
        for c in missing:
            members = np.nonzero(class_idx == c)[0]
            best = members[np.argmax(magnitude[members])]
            # evict the worst kept point whose class retains >= 2 members
            counts = {}
            for i in keep:
                counts[class_idx[i]] = counts.get(class_idx[i], 0) + 1
            for pos in range(len(keep) - 1, -1, -1):
                if counts[class_idx[keep[pos]]] >= 2:
                    counts[class_idx[keep[pos]]] -= 1
                    keep.pop(pos)
                    break
            keep.append(best)
        keep = np.asarray(keep)
    return np.sort(keep)


def pruned_fit(
    csvm,
    data: DataSet,
    *,
    n_sv: int,
    prune_rate: float = 0.25,
    epsilon: float = 0.001,
    max_iter: Optional[int] = None,
    sample_weight=None,
    return_indices: bool = False,
):
    """Sparse LS-SVM by iterative smallest-|alpha| pruning (Suykens 2002).

    Fits on the full ``data``, then repeatedly drops the ``prune_rate``
    fraction of points with the smallest dual weights and refits on the
    survivors (warm-started from their previous alpha) until at most
    ``n_sv`` support vectors remain.  Works for binary and one-vs-all
    multiclass classification and LS-SVR regression, with optional
    ``sample_weight`` (the weights are pruned alongside their rows).

    Returns the compact Model — or ``(model, indices)`` into ``data``'s
    rows when ``return_indices`` is true.
    """
    n = data.num_data_points
    if not 1 <= n_sv < n:
        raise InvalidParameterError(
            f"n_sv must be in [1, {n - 1}] to prune a {n}-point data set, "
            f"but is {n_sv}!"
        )
    if not data.is_regression and data.has_labels():
        n_classes = data.num_different_labels
        if n_sv < n_classes:
            # the class floor keeps one point per class, so the schedule can
            # never shrink below num_classes — reject instead of looping
            raise InvalidParameterError(
                f"n_sv ({n_sv}) must be at least the number of classes "
                f"({n_classes}) — pruning keeps every class non-empty!"
            )
    if not 0.0 < prune_rate < 1.0:
        raise InvalidParameterError(
            f"prune_rate must be in (0, 1), but is {prune_rate}!"
        )
    if sample_weight is not None:
        sample_weight = np.asarray(sample_weight, dtype=np.float64)

    model = csvm.fit(
        data, epsilon=epsilon, max_iter=max_iter, sample_weight=sample_weight
    )
    if model.classification == ClassificationType.OAO:
        raise InvalidParameterError(
            "pruned_fit supports binary/one-vs-all models only — prune the "
            "one-vs-one pair machines individually instead!"
        )

    X = np.asarray(data.data)
    labels = np.asarray(data.labels)
    if data.is_regression:
        class_idx = None
    else:
        # prune within the *label* partition so no class disappears
        _, class_idx = np.unique(labels, return_inverse=True)
    indices = np.arange(n)

    while indices.shape[0] > n_sv:
        current = indices.shape[0]
        target = max(n_sv, int(np.ceil(current * (1.0 - prune_rate))))
        if target >= current:  # prune_rate too small to shrink further
            target = current - 1
        magnitude = _alpha_magnitude(model.alpha)
        ci = class_idx[indices] if class_idx is not None else None
        local_keep = _keep_with_class_floor(magnitude, target, ci)
        indices = indices[local_keep]

        sub = DataSet(
            X[indices],
            labels[indices],
            dtype=X.dtype,
            regression=data.is_regression,
        )
        warm = Model(
            model.params.copy(),
            sub,
            alpha=np.asarray(model.alpha)[local_keep],
            rho=model.rho,
        )
        warm.classification = model.classification
        warm.is_regression = model.is_regression
        sw = sample_weight[indices] if sample_weight is not None else None
        model = csvm.fit(
            sub,
            epsilon=epsilon,
            max_iter=max_iter,
            initial_model=warm,
            sample_weight=sw,
        )
    if return_indices:
        return model, indices
    return model


# ---------------------------------------------------------------------------
# Fixed-size LS-SVM (Nystroem primal ridge)
# ---------------------------------------------------------------------------


def _select_landmarks(
    data: DataSet, m: int, random_state
) -> np.ndarray:
    """m landmark row indices — class-stratified for classification."""
    n = data.num_data_points
    rng = np.random.default_rng(random_state)
    if data.is_regression or not data.has_labels():
        return _stratified_landmarks(None, n, m, rng)
    return _stratified_landmarks(np.asarray(data.labels), n, m, rng)


def _kmm_inv_sqrt(K_mm: np.ndarray, rcond: float) -> np.ndarray:
    """Symmetric K_mm^{-1/2} in f64 with eigenvalue clipping at rcond*max."""
    K = np.asarray(K_mm, dtype=np.float64)
    K = 0.5 * (K + K.T)
    w, V = np.linalg.eigh(K)
    cutoff = rcond * float(w[-1]) if w[-1] > 0 else 0.0
    inv_sqrt = np.where(w > cutoff, 1.0 / np.sqrt(np.maximum(w, cutoff)), 0.0)
    return (V * inv_sqrt[None, :]) @ V.T


def _validated_weights(sample_weight, n) -> np.ndarray:
    """Suykens per-sample weights as a validated (n,) f64 vector (ones
    when unweighted) — ONE rule for every sparse fit variant."""
    if sample_weight is None:
        return np.ones(n, dtype=np.float64)
    s = np.asarray(sample_weight, dtype=np.float64)
    if s.shape != (n,):
        raise InvalidParameterError(
            f"sample_weight must have one entry per data point ({n}), "
            f"but has shape {s.shape}!"
        )
    if not np.all(s > 0.0):
        raise InvalidParameterError(
            "sample_weight entries must all be positive!"
        )
    return s


def _resolve_kernel_params(csvm, d):
    """(params, kind, gamma_v, coef0_v, degree_v, cost) with the gamma
    default resolved against d — ONE rule for every sparse fit variant
    (also enables x64 when the dtype needs it)."""
    from .csvm import _ensure_x64_if_needed

    _ensure_x64_if_needed(csvm.dtype)
    params = csvm.params.copy()
    if params.gamma.is_default():
        params.gamma.value = 1.0 / d
    return (
        params, params.kernel_type.value, params.resolved_gamma(d),
        params.coef0.value, params.degree.value, params.cost.value,
    )


def _landmark_basis(Zd, kind, gamma, coef0, degree, rcond, dt):
    """The m-landmark Nystroem basis pieces (one rule for every fit path).

    Returns ``(sqZ, inv_sqrt, ivr)``: the landmark squared norms, the f64
    host ``K_mm^{-1/2}`` (eigenvalue-clipped at ``rcond``), and its
    device copy in the compute dtype.  Call inside the CSVM's device
    context.
    """
    sqZ = jnp.sum(Zd * Zd, axis=1)
    K_mm = np.asarray(
        jax.device_get(
            kernel_block(Zd, Zd, sqZ, sqZ, kind, dt.type(gamma),
                         dt.type(coef0), degree)
        ),
        dtype=np.float64,
    )
    inv_sqrt = _kmm_inv_sqrt(K_mm, rcond)
    return sqZ, inv_sqrt, jnp.asarray(inv_sqrt, dtype=dt)


def _phi_block_accumulate(
    A, u, Xblk, sblk, Z, sqZ, inv_sqrt, kind, gamma, coef0, degree
):
    """One Phi-projection normal-equation update (the shared core of every
    Nystroem reduction): ``A += Phi' S Phi``, ``u += Phi' S 1`` with
    ``Phi = k(X_blk, Z) K_mm^{-1/2}``.  Returns ``(A, u, Phi_s)`` so
    callers with targets also add ``Phi' S Y`` from the weighted block.
    """
    sq = jnp.sum(Xblk * Xblk, axis=1)
    Kbm = kernel_block(Xblk, Z, sq, sqZ, kind, gamma, coef0, degree)
    Phi = Kbm @ inv_sqrt                      # (block, m) MXU
    Phi_s = Phi * sblk[:, None]
    A = A + jax.lax.dot_general(
        Phi, Phi_s, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=A.dtype,
    )
    u = u + Phi_s.sum(axis=0)
    return A, u, Phi_s


def _bordered_solve(A, c, u, s, Y, cost, inv_sqrt):
    """Solve the bordered (m+1) x (m+1) normal equations on host in f64::

        [A + I/C   u ] [w]   [c ]
        [u'        s1] [b] = [sy]

    Returns ``(alpha, b)`` with ``alpha = K_mm^{-1/2} w`` the (m, C)
    landmark dual block (one rule — the in-memory and streamed fits
    previously carried identical copies of this solve).
    """
    m = A.shape[0]
    s1 = float(np.sum(s))
    sy = (s[:, None] * Y).sum(axis=0)
    H = np.empty((m + 1, m + 1), dtype=np.float64)
    H[:m, :m] = A + np.eye(m) / cost
    H[:m, m] = u
    H[m, :m] = u
    H[m, m] = s1
    rhs = np.concatenate([c, sy[None, :]], axis=0)
    sol = np.linalg.solve(H, rhs)
    return inv_sqrt @ sol[:m], sol[m]


def _nystroem_model(params, Z, sub_labels, alpha, b, dt, regression):
    """Assemble the ordinary m-SV Model from the Nystroem primal solution
    (binary / one-vs-all / regression layouts — one rule for both the
    in-memory and the streamed fit)."""
    if regression:
        sub = DataSet(Z, dtype=dt)
        model = Model(params, sub, alpha=alpha[:, 0], rho=-float(b[0]))
        model.is_regression = True
    else:
        sub = DataSet(Z, sub_labels, dtype=dt)
        if alpha.shape[1] == 1:
            model = Model(params, sub, alpha=alpha[:, 0], rho=-float(b[0]))
        else:
            model = Model(params, sub, alpha=alpha, rho=-b)
            model.classification = ClassificationType.OAA
    model.n_iter = 0  # direct (non-iterative) solve
    return model


def _nystroem_reduce(
    Xp, s, Yp, Z, inv_sqrt, kind, gamma, coef0, degree, block,
    vary_axis=None,
):
    """Stream row blocks; reduce the primal normal equations on device.

    Returns (A, c, u) with ``A = Phi' S Phi`` (m, m), ``c = Phi' S Y``
    (m, C) and ``u = Phi' S 1`` (m,) — the data-dependent parts of the
    (m+1) x (m+1) bordered ridge system.  Padded rows carry s = 0 and
    contribute nothing.  One fused kernel-block + two MXU matmuls per step.
    """
    n_pad, d = Xp.shape
    m = Z.shape[0]
    C = Yp.shape[1]
    steps = n_pad // block
    sqZ = jnp.sum(Z * Z, axis=1)

    Xb = Xp.reshape(steps, block, d)
    sb = s.reshape(steps, block)
    Yb = Yp.reshape(steps, block, C)

    def body(carry, inp):
        A, c, u = carry
        Xblk, sblk, Yblk = inp
        A, u, Phi_s = _phi_block_accumulate(
            A, u, Xblk, sblk, Z, sqZ, inv_sqrt, kind, gamma, coef0, degree
        )
        c = c + jax.lax.dot_general(
            Phi_s, Yblk, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=c.dtype,
        )
        return (A, c, u), None

    dt = Xp.dtype
    init = (
        jnp.zeros((m, m), dt), jnp.zeros((m, C), dt), jnp.zeros((m,), dt)
    )
    if vary_axis is not None:
        # under shard_map the carry output varies over the mesh axis (it
        # depends on the sharded rows); the zero init must be cast to match
        init = jax.tree.map(
            lambda z: jax.lax.pcast(z, vary_axis, to="varying"), init
        )
    (A, c, u), _ = jax.lax.scan(body, init, (Xb, sb, Yb))
    return A, c, u


_NYSTROEM_SHARDED_CACHE: dict = {}


def _nystroem_reduce_sharded_fn(mesh, kind, degree, block):
    """The jitted shard_map'ped Nystroem reduction over a 1-D device mesh
    (operands expected already placed: X/s/Y row-sharded, Z/inv_sqrt
    replicated; gamma/coef0 are TRACED trailing arguments).  Factored out
    so the multi-host variant can place its per-process windows via
    make_array_from_process_local_data.  Cached per (mesh, kind, degree,
    block): CV/calibration folds call the fit repeatedly, and a fresh
    closure per call would re-trace the reduction every fold."""
    key = (mesh, kind, degree, block)
    cached = _NYSTROEM_SHARDED_CACHE.get(key)
    if cached is not None:
        return cached
    from jax.sharding import PartitionSpec as P

    from .parallel.sharded import ROW_AXIS

    row, rep = P(ROW_AXIS), P()

    def local(Xl, sl, Yl, Zr, ivr, gamma, coef0):
        A, c, u = _nystroem_reduce(
            Xl, sl, Yl, Zr, ivr, kind, gamma, coef0, degree, block,
            vary_axis=ROW_AXIS,
        )
        return (
            jax.lax.psum(A, ROW_AXIS),
            jax.lax.psum(c, ROW_AXIS),
            jax.lax.psum(u, ROW_AXIS),
        )

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(row, row, row, rep, rep, rep, rep),
            out_specs=(rep, rep, rep),
        )
    )
    _NYSTROEM_SHARDED_CACHE[key] = fn
    return fn


#: module-level jit: CV folds / calibration refits share the trace cache
#: (a fresh jax.jit wrapper per fit would re-trace every call)
_nystroem_reduce_jit = jax.jit(
    _nystroem_reduce, static_argnames=("kind", "degree", "block")
)


def _nystroem_reduce_sharded(
    mesh, Xp, s, Yp, Z, inv_sqrt, kind, gamma, coef0, degree, block
):
    """Row-sharded Nystroem reduction over a 1-D device mesh.

    Each device streams its own row shard through :func:`_nystroem_reduce`
    and the (m, m)/(m, C)/(m,) partial normal equations are ``psum``-reduced
    over ICI — the multi-chip analog of SURVEY.md §2.4 P3, with O(m^2)
    traffic total (independent of n).  Row counts must divide evenly:
    callers pad to a multiple of ``block * num_devices``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.sharded import ROW_AXIS

    row, rep = P(ROW_AXIS), P()
    fn = _nystroem_reduce_sharded_fn(mesh, kind, degree, block)
    # device_put shards HOST arrays straight to their owners — callers
    # pass numpy so no single device ever stages the full padded operand
    Xp = jax.device_put(Xp, NamedSharding(mesh, row))
    s = jax.device_put(s, NamedSharding(mesh, row))
    Yp = jax.device_put(Yp, NamedSharding(mesh, row))
    Z = jax.device_put(Z, NamedSharding(mesh, rep))
    inv_sqrt = jax.device_put(inv_sqrt, NamedSharding(mesh, rep))
    return fn(Xp, s, Yp, Z, inv_sqrt, gamma, coef0)


def nystroem_fit(
    csvm,
    data: DataSet,
    *,
    n_landmarks: Optional[int] = None,
    landmarks: Optional[Union[Sequence[int], np.ndarray]] = None,
    random_state=0,
    sample_weight=None,
    rcond: float = 1e-10,
    row_block: int = 4096,
    return_indices: bool = False,
):
    """Fixed-size LS-SVM: Nystroem primal ridge fit with m landmark SVs.

    Solves ``min 1/2 |w|^2 + 1/2 sum_i C s_i (y_i - w.phi(x_i) - b)^2`` in
    the m-dimensional Nystroem basis ``phi(x) = K_mm^{-1/2} k(Z, x)`` and
    returns a standard Model whose support vectors are the m landmarks
    (``alpha = K_mm^{-1/2} w``, ``rho = -b``) — so the model is O(m),
    predicts through the ordinary paths and saves as an ordinary LIBSVM
    model file.  Training streams the data once in ``row_block`` rows
    (O(m^2) device memory), so n is unbounded by the kernel-matrix budget
    that limits exact fits.

    ``landmarks`` gives explicit row indices into ``data``; otherwise
    ``n_landmarks`` rows are sampled (class-stratified, seeded by
    ``random_state``).  Binary / one-vs-all multiclass / regression;
    ``sample_weight`` follows the weighted LS-SVM convention (per-point
    penalty ``C * s_i``).  ``return_indices=True`` returns
    ``(model, landmark_indices)``.
    """
    n = data.num_data_points
    d = data.num_features
    if not data.is_regression:
        # same front-door rules as CSVM.fit: unlabeled data and
        # single-class data must fail cleanly, not deep in the target
        # assembly (data.mapper is None without labels)
        if not data.has_labels():
            raise InvalidParameterError(
                "No labels given for training! Maybe the data is only "
                "usable for prediction?"
            )
        if data.num_different_labels < 2:
            raise InvalidParameterError(
                f"At least two classes are needed for classification, but "
                f"the training data contains only "
                f"{data.num_different_labels}!"
            )
    if landmarks is not None:
        raw_idx = np.asarray(landmarks, dtype=np.int64)
        idx = np.unique(raw_idx)
        if (
            idx.size == 0 or idx.size != raw_idx.size
            or idx[0] < 0 or idx[-1] >= n
        ):
            # duplicates must RAISE, not silently shrink the model below
            # the requested size
            raise InvalidParameterError(
                f"landmark indices must be unique and within [0, {n - 1}]!"
            )
    else:
        if n_landmarks is None:
            raise InvalidParameterError(
                "nystroem_fit needs n_landmarks or explicit landmarks!"
            )
        if not 1 <= n_landmarks <= n:
            raise InvalidParameterError(
                f"n_landmarks must be in [1, {n}], but is {n_landmarks}!"
            )
        idx = _select_landmarks(data, int(n_landmarks), random_state)
    m = idx.shape[0]
    if not data.is_regression and data.has_labels():
        if (np.unique(np.asarray(data.labels)[idx]).shape[0]
                != data.num_different_labels):
            raise InvalidParameterError(
                "the landmark sample lost a class — pass class-covering "
                "landmarks or a larger n_landmarks!"
            )

    if data.is_regression:
        Y = np.asarray(data.labels, dtype=np.float64)[:, None]
    elif data.num_different_labels == 2:
        Y = np.asarray(data.y, dtype=np.float64)[:, None]
    else:
        Y = data.mapper.oaa_targets(np.asarray(data.labels), dtype=np.float64)
    C_classes = Y.shape[1]

    s = _validated_weights(sample_weight, n)

    params, kind, gamma_v, coef0_v, degree_v, cost = (
        _resolve_kernel_params(csvm, d)
    )

    dt = csvm.dtype
    X = np.asarray(data.data, dtype=dt)
    if kind == KernelFunctionType.CHI_SQUARED:
        from .csvm import _check_chi_squared_data

        _check_chi_squared_data(X, "training data")
    Z = X[idx]

    devices = getattr(csvm, "devices", None)
    n_dev = len(devices) if devices else 1
    block = int(min(row_block, max(8, -(-n // n_dev))))
    n_pad = int(-(-n // (block * n_dev)) * block * n_dev)
    Xp = np.zeros((n_pad, d), dtype=dt)
    Xp[:n] = X
    sp = np.zeros(n_pad, dtype=dt)
    sp[:n] = s
    Yp = np.zeros((n_pad, C_classes), dtype=dt)
    Yp[:n] = Y

    with csvm._device_ctx():
        Zd = jnp.asarray(Z)
        sqZ, inv_sqrt, ivr = _landmark_basis(
            Zd, kind, gamma_v, coef0_v, degree_v, rcond, dt
        )
        if n_dev > 1:
            from .parallel.sharded import make_row_mesh

            A, c, u = _nystroem_reduce_sharded(
                make_row_mesh(devices), Xp, sp, Yp, Zd, ivr,
                kind, dt.type(gamma_v), dt.type(coef0_v), degree_v, block,
            )
        else:
            A, c, u = _nystroem_reduce_jit(
                jnp.asarray(Xp), jnp.asarray(sp), jnp.asarray(Yp), Zd,
                ivr, kind=kind,
                gamma=dt.type(gamma_v), coef0=dt.type(coef0_v),
                degree=degree_v, block=block,
            )

    # bordered (m+1) x (m+1) normal equations, solved on host in f64
    A = np.asarray(jax.device_get(A), dtype=np.float64)
    c = np.asarray(jax.device_get(c), dtype=np.float64)
    u = np.asarray(jax.device_get(u), dtype=np.float64)
    alpha, b = _bordered_solve(A, c, u, s, Y, cost, inv_sqrt)
    model = _nystroem_model(
        params, Z,
        None if data.is_regression else np.asarray(data.labels)[idx],
        alpha, b, dt, data.is_regression,
    )
    if return_indices:
        return model, idx
    return model


def compact_fold_fit_fn(
    csvm, *, n_landmarks=None, max_sv=None, epsilon=0.001, max_iter=None,
    random_state=None,
):
    """Fold-fit callable for Platt calibration of COMPACT models.

    Probability calibration must reflect the DEPLOYED model's decision
    distribution, so the CV folds train with the same compact procedure,
    scaled to the fold size.  Shared by the sklearn facade and the CLI
    (one rule — the two previously drifted).  Tiny folds where no valid
    pruning target exists (n_fold <= num_classes) fall back to the exact
    fold fit rather than violating pruned_fit's n_sv < n precondition.
    """

    def fit_fn(fold_data, fold_sw):
        n_fold = fold_data.num_data_points
        if n_landmarks is not None:
            return nystroem_fit(
                csvm, fold_data,
                n_landmarks=min(n_landmarks, n_fold),
                random_state=random_state or 0,
                sample_weight=fold_sw,
            )
        n_classes = (
            fold_data.num_different_labels
            if not fold_data.is_regression and fold_data.has_labels()
            else 1
        )
        target = max(n_classes, min(max_sv, n_fold - 1))
        if not n_classes <= target < n_fold:
            # the fold is too small to prune at all — exact fit
            kwargs = {} if max_iter is None else {"max_iter": max_iter}
            if fold_sw is not None:
                kwargs["sample_weight"] = fold_sw
            return csvm.fit(fold_data, epsilon=epsilon, **kwargs)
        return pruned_fit(
            csvm, fold_data, n_sv=target,
            epsilon=epsilon, max_iter=max_iter, sample_weight=fold_sw,
        )

    return fit_fn


# ---------------------------------------------------------------------------
# Windowed file ingest: fixed-size fits at n >> host RAM
# ---------------------------------------------------------------------------


def _stratified_landmarks(labels, n, m, rng) -> np.ndarray:
    """Class-stratified landmark indices from a raw label array (the
    array-level core of :func:`_select_landmarks` for streaming callers
    that have no DataSet)."""
    if labels is None:
        return np.sort(rng.choice(n, size=m, replace=False))
    classes, class_idx = np.unique(labels, return_inverse=True)
    if m < classes.shape[0]:
        raise InvalidParameterError(
            f"n_landmarks ({m}) must be at least the number of classes "
            f"({classes.shape[0]})!"
        )
    # proportional allocation with one landmark guaranteed per class; the
    # max(1,...) floor can overshoot m on imbalanced data, so shrink the
    # largest allocations back (keeping the floor) — exactly m landmarks
    # always come back (the --nystroem M model-size contract)
    counts = np.bincount(class_idx, minlength=classes.shape[0])
    alloc = np.maximum(1, np.floor(m * counts / n).astype(int))
    alloc = np.minimum(alloc, counts)
    while alloc.sum() > m:
        shrink = int(np.argmax(np.where(alloc > 1, alloc, -1)))
        if alloc[shrink] <= 1:
            break
        alloc[shrink] -= 1
    # distribute the remainder to the largest classes that still have room
    while alloc.sum() < m:
        room = counts - alloc
        grow = int(np.argmax(np.where(room > 0, counts, -1)))
        if room[grow] <= 0:
            break
        alloc[grow] += 1
    picked = []
    for ci in range(classes.shape[0]):
        members = np.nonzero(class_idx == ci)[0]
        picked.append(rng.choice(members, size=alloc[ci], replace=False))
    return np.sort(np.concatenate(picked))


def _parse_rows_checked(filename, spans_subset, d, dt):
    """Selected-row parse that fails CLEANLY if the native read breaks
    mid-stream (None = IO-level failure after validation succeeded)."""
    from .exceptions import InvalidFileFormatError
    from .native.loader import parse_libsvm_native_rows

    rows = parse_libsvm_native_rows(filename, spans_subset, d, dtype=dt)
    if rows is None:
        raise InvalidFileFormatError(
            f"selected-row parse of '{filename}' failed mid-stream — "
            "file removed or truncated during the windowed read?"
        )
    return rows


def nystroem_fit_from_file(
    csvm,
    filename: str,
    *,
    n_landmarks: int,
    label_type=None,
    regression: bool = False,
    random_state=0,
    sample_weight=None,
    rcond: float = 1e-10,
    row_block: int = 65536,
    return_indices: bool = False,
):
    """Fixed-size LS-SVM trained STRAIGHT FROM a LIBSVM file in two passes.

    The in-memory :func:`nystroem_fit` needs host-resident X; this variant
    bounds host memory at O(row_block * d + m * d + n) for ANY n:

    1. **Landmark pass** — one metadata parse validates the file and yields
       (n, d) plus the full label column (metadata-scale); ``n_landmarks``
       class-stratified landmark rows are then gathered in ONE selected-row
       native parse against a byte-span line index built with a single
       memchr sweep (native/libsvm_parser.cpp::plssvm_libsvm_line_spans —
       per-call cost O(selected), no whole-file revalidation).
    2. **Reduce pass** — the file streams through ``row_block``-row windows
       (same O(selected) selected-row parses); each window runs the fused
       kernel-block + MXU projection update of the (m+1) x (m+1) normal
       equations on device, donation keeping a single (m, m) accumulator.

    The result is numerically IDENTICAL to ``nystroem_fit(csvm,
    DataSet(filename), landmarks=<same>)`` — same landmarks, same reduction
    order per block row.  Falls back to the in-memory path when the native
    parser is unavailable.  Single-device (the streaming loop is a host
    loop; use ``nystroem_fit`` on meshes or ``fit_multihost`` for exact
    multi-host fits).
    """
    from .data_set import LabelMapper, _infer_label_array
    from .kernel_functions import KernelFunctionType
    from .native.loader import (
        libsvm_line_spans,
        parse_libsvm_native_rows,
        parse_libsvm_native_window,
    )

    # the byte-span index is LIBSVM-grammar-specific; ARFF files (typically
    # metadata-scale) load through the host-resident path below
    is_arff = filename.lower().endswith(".arff")
    meta = (
        None if is_arff
        else parse_libsvm_native_window(filename, 0, 0, dtype=csvm.dtype)
    )
    spans = libsvm_line_spans(filename) if meta is not None else None
    if meta is None or spans is None:
        # native parser unavailable (or ARFF): host-resident fallback
        from .data_set import DataSet as _DS

        data = _DS(
            filename,
            label_type=float if regression else label_type,
            dtype=csvm.dtype, regression=regression,
        )
        return nystroem_fit(
            csvm, data, n_landmarks=n_landmarks,
            random_state=random_state, sample_weight=sample_weight,
            rcond=rcond, return_indices=return_indices,
        )

    _, raw_labels, n, d = meta
    from .native.loader import check_line_spans

    check_line_spans(spans, n)
    if raw_labels is None:
        raise InvalidParameterError(
            "No labels given for training! Maybe the data is only usable "
            "for prediction?"
        )
    if not 1 <= n_landmarks <= n:
        raise InvalidParameterError(
            f"n_landmarks must be in [1, {n}], but is {n_landmarks}!"
        )
    rng = np.random.default_rng(random_state)
    if regression:
        labels = np.asarray(
            _infer_label_array(list(raw_labels), float), dtype=np.float64
        )
        Y = labels[:, None]
        idx = _stratified_landmarks(None, n, int(n_landmarks), rng)
    else:
        labels = _infer_label_array(list(raw_labels), label_type)
        mapper = LabelMapper(labels)
        if mapper.num_mappings > 2:
            Y = mapper.oaa_targets(labels, dtype=np.float64)
        else:
            Y = mapper.map_labels(labels, dtype=np.float64)[:, None]
        idx = _stratified_landmarks(labels, n, int(n_landmarks), rng)
    C_classes = Y.shape[1]
    m = idx.shape[0]

    s = _validated_weights(sample_weight, n)

    params, kind, gamma_v, coef0_v, degree_v, cost = (
        _resolve_kernel_params(csvm, d)
    )
    dt = csvm.dtype

    # ---- pass 1: gather the landmark rows (one O(m d) selected parse) ----
    Z = _parse_rows_checked(filename, spans[idx], d, dt)
    if kind == KernelFunctionType.CHI_SQUARED and np.any(Z < 0.0):
        raise InvalidParameterError(
            "chi-squared kernel requires non-negative data!"
        )

    block = int(min(row_block, max(8, n)))

    @partial(
        jax.jit, static_argnames=("kind", "degree"), donate_argnums=(0, 1, 2)
    )
    def block_update(A, c, u, Xblk, sblk, Yblk, Zd, sqZ, ivr,
                     gamma, coef0, kind, degree):
        A, u, Phi_s = _phi_block_accumulate(
            A, u, Xblk, sblk, Zd, sqZ, ivr, kind, gamma, coef0, degree
        )
        c = c + jax.lax.dot_general(
            Phi_s, Yblk, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=c.dtype,
        )
        return A, c, u

    with csvm._device_ctx():
        Zd = jnp.asarray(Z)
        sqZ, inv_sqrt, ivr = _landmark_basis(
            Zd, kind, gamma_v, coef0_v, degree_v, rcond, dt
        )
        A = jnp.zeros((m, m), dt)
        c = jnp.zeros((m, C_classes), dt)
        u = jnp.zeros((m,), dt)
        g = dt.type(gamma_v)
        c0 = dt.type(coef0_v)
        # ---- pass 2: stream fixed-shape windows (one compile) ----
        for b in range(0, n, block):
            e = min(b + block, n)
            Xw = _parse_rows_checked(filename, spans[b:e], d, dt)
            if kind == KernelFunctionType.CHI_SQUARED and np.any(Xw < 0.0):
                raise InvalidParameterError(
                    "chi-squared kernel requires non-negative data!"
                )
            if e - b < block:  # pad the tail block; s = 0 rows are no-ops
                Xp = np.zeros((block, d), dtype=dt)
                Xp[: e - b] = Xw
                sp = np.zeros(block, dtype=dt)
                sp[: e - b] = s[b:e]
                Yp = np.zeros((block, C_classes), dtype=dt)
                Yp[: e - b] = Y[b:e]
            else:
                Xp, sp, Yp = Xw, s[b:e].astype(dt), Y[b:e].astype(dt)
            A, c, u = block_update(
                A, c, u, jnp.asarray(Xp), jnp.asarray(sp), jnp.asarray(Yp),
                Zd, sqZ, ivr, g, c0, kind=kind, degree=degree_v,
            )
        A = np.asarray(jax.device_get(A), dtype=np.float64)
        c = np.asarray(jax.device_get(c), dtype=np.float64)
        u = np.asarray(jax.device_get(u), dtype=np.float64)

    # bordered (m+1) x (m+1) normal equations — identical to nystroem_fit
    alpha, b_sol = _bordered_solve(A, c, u, s, Y, cost, inv_sqrt)
    model = _nystroem_model(
        params, Z, None if regression else labels[idx],
        alpha, b_sol, dt, regression,
    )
    if return_indices:
        return model, idx
    return model


def nystroem_fit_multihost(
    csvm,
    filename: str,
    *,
    n_landmarks: int,
    label_type=None,
    regression: bool = False,
    random_state=0,
    sample_weight=None,
    rcond: float = 1e-10,
    row_block: int = 65536,
    return_indices: bool = False,
):
    """Multi-host fixed-size (Nystroem) fit from a file on shared storage.

    Each host materializes ONLY its row window of the training data
    (windowed native LIBSVM parse — O(n d / #hosts) data memory) and
    streams it through the row-sharded normal-equation reduction over the
    GLOBAL device mesh: the (m, m)/(m, C)/(m,) partials psum over ICI/DCN
    (O(m^2) traffic, independent of n).  Every piece of host-side work is
    HOST-IDENTICAL by construction — landmark selection is seeded
    stratified sampling on the replicated label column, all hosts parse
    the m landmark rows (one O(m d) selected-row read) and solve the
    bordered system locally in f64 — so every host returns the same
    model.  Works unchanged at ``process_count() == 1``, where it equals
    :func:`nystroem_fit` on the same landmark set.

    ARFF files (typically metadata-scale — the byte-span index that
    enables O(selected) reads is LIBSVM-grammar-specific) are read
    host-resident instead.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .data_set import LabelMapper, _infer_label_array
    from .native.loader import (
        check_line_spans,
        libsvm_line_spans,
        parse_libsvm_native_window,
    )
    from .parallel.multihost import (
        global_row_mesh,
        host_row_range,
        initialize_distributed,
    )
    from .parallel.sharded import ROW_AXIS

    from .csvm import _ensure_x64_if_needed

    initialize_distributed()
    mesh = global_row_mesh()
    n_dev = mesh.devices.size
    dt = csvm.dtype
    _ensure_x64_if_needed(dt)

    # ---- metadata scan: n, d, full label column ----
    is_arff = filename.lower().endswith(".arff")
    X_all = None
    spans = None
    if is_arff:
        from .io.arff import parse_arff_file

        X_all, raw_labels = parse_arff_file(filename, dtype=dt)
        n, d = X_all.shape
    else:
        meta = parse_libsvm_native_window(filename, 0, 0, dtype=dt)
        if meta is not None:
            _, raw_labels, n, d = meta
            spans = libsvm_line_spans(filename)
            if spans is not None:
                check_line_spans(spans, n)
        if meta is None or spans is None:
            # native parser unavailable: host-resident fallback
            from .io.libsvm import parse_libsvm_file

            X_all, raw_labels = parse_libsvm_file(filename, dtype=dt)
            n, d = X_all.shape
    if raw_labels is None:
        raise InvalidParameterError(
            "No labels given for training! Maybe the data is only usable "
            "for prediction?"
        )
    if not 1 <= n_landmarks <= n:
        raise InvalidParameterError(
            f"n_landmarks must be in [1, {n}], but is {n_landmarks}!"
        )

    rng = np.random.default_rng(random_state)
    if regression:
        labels = np.asarray(
            _infer_label_array(list(raw_labels), float), dtype=np.float64
        )
        Y = labels[:, None]
        idx = np.sort(rng.choice(n, size=int(n_landmarks), replace=False))
    else:
        labels = _infer_label_array(list(raw_labels), label_type)
        mapper = LabelMapper(labels)
        if mapper.num_mappings > 2:
            Y = mapper.oaa_targets(labels, dtype=np.float64)
        else:
            Y = mapper.map_labels(labels, dtype=np.float64)[:, None]
        idx = _stratified_landmarks(labels, n, int(n_landmarks), rng)
    C_classes = Y.shape[1]
    m = idx.shape[0]

    s = _validated_weights(sample_weight, n)

    params, kind, gamma_v, coef0_v, degree_v, cost = (
        _resolve_kernel_params(csvm, d)
    )

    # ---- landmark rows: every host gathers the same O(m d) block ----
    if X_all is not None:
        Z = np.ascontiguousarray(np.asarray(X_all, dtype=dt)[idx])
    else:
        Z = _parse_rows_checked(filename, spans[idx], d, dt)

    # ---- this host's row window of the padded row axis ----
    block = int(min(row_block, max(8, -(-n // n_dev))))
    n_pad = int(-(-n // (block * n_dev)) * (block * n_dev))
    begin, end = host_row_range(n_pad)
    real_end = min(end, n)
    rows_local = end - begin
    X_local = np.zeros((rows_local, d), dtype=dt)
    s_local = np.zeros((rows_local,), dtype=dt)
    Y_local = np.zeros((rows_local, C_classes), dtype=dt)
    if real_end > begin:
        if X_all is not None:
            Xw = np.asarray(X_all, dtype=dt)[begin:real_end]
        else:
            Xw = _parse_rows_checked(
                filename, spans[begin:real_end], d, dt
            )
        X_local[: real_end - begin] = Xw
        s_local[: real_end - begin] = s[begin:real_end]
        Y_local[: real_end - begin] = Y[begin:real_end]

    if kind == KernelFunctionType.CHI_SQUARED:
        # global verdict — every host must agree before the first
        # collective (one host raising alone would hang the others)
        local_min = float(min(
            X_local.min() if X_local.size else 0.0, Z.min()
        ))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            mins = np.asarray(
                multihost_utils.process_allgather(np.asarray([local_min]))
            )
            local_min = float(mins.min())
        if local_min < 0.0:
            raise InvalidParameterError(
                "chi-squared kernel requires non-negative data!"
            )

    row2 = NamedSharding(mesh, P(ROW_AXIS, None))
    row1 = NamedSharding(mesh, P(ROW_AXIS))
    X_g = jax.make_array_from_process_local_data(
        row2, X_local, global_shape=(n_pad, d)
    )
    s_g = jax.make_array_from_process_local_data(
        row1, s_local, global_shape=(n_pad,)
    )
    Y_g = jax.make_array_from_process_local_data(
        row2, Y_local, global_shape=(n_pad, C_classes)
    )
    Zd = jnp.asarray(Z)
    _sqZ, inv_sqrt, ivr = _landmark_basis(
        Zd, kind, gamma_v, coef0_v, degree_v, rcond, dt
    )
    A, c, u = _nystroem_reduce_sharded_fn(mesh, kind, degree_v, block)(
        X_g, s_g, Y_g, Zd, ivr,
        jnp.asarray(gamma_v, dtype=dt), jnp.asarray(coef0_v, dtype=dt),
    )

    def _host_copy(arr):
        # the psum'd outputs are REPLICATED: every local device holds the
        # full value, so one addressable shard is the global array (no
        # cross-host gather needed — unlike the row-sharded solver state)
        return np.asarray(
            jax.device_get(arr.addressable_data(0)), dtype=np.float64
        )

    A = _host_copy(A)
    c = _host_copy(c)
    u = _host_copy(u)
    alpha, b = _bordered_solve(A, c, u, s, Y, cost, inv_sqrt)
    model = _nystroem_model(
        params, np.asarray(Z), None if regression else labels[idx],
        alpha, b, dt, regression,
    )
    if return_indices:
        return model, idx
    return model


def nystroem_fit_one_class_from_file(
    csvm,
    filename: str,
    *,
    n_landmarks: int,
    nu: float = 0.5,
    random_state=0,
    rcond: float = 1e-10,
    row_block: int = 65536,
    return_indices: bool = False,
):
    """Fixed-size ONE-CLASS LS-SVM trained straight from a LIBSVM file.

    The one-class analog of :func:`nystroem_fit_from_file` (same two
    O(selected-rows) native passes over a memchr-built line index, host
    memory O(row_block * d + M * d + n)) with a THIRD streaming pass for
    the threshold: the support-function target is the constant 1 (no bias
    row), and after the m x m ridge solve the training scores
    ``g = k(x, Z) @ alpha`` stream through the same windows so the
    nu-quantile ``rho`` is computed over the FULL data without ever
    materializing it.  Labels in the file are ignored (one-class files
    conventionally carry a single +1 class).  Falls back to the in-memory
    :func:`nystroem_fit_one_class` when the native parser is unavailable.
    """
    from .kernel_functions import KernelFunctionType
    from .native.loader import (
        libsvm_line_spans,
        parse_libsvm_native_rows,
        parse_libsvm_native_window,
    )

    if not 0.0 < nu < 1.0:
        raise InvalidParameterError(
            f"nu must be in (0, 1), but is {nu}!"
        )
    is_arff = filename.lower().endswith(".arff")
    meta = (
        None if is_arff
        else parse_libsvm_native_window(filename, 0, 0, dtype=csvm.dtype)
    )
    spans = libsvm_line_spans(filename) if meta is not None else None
    if meta is None or spans is None:
        # one-class ignores labels entirely, and one-class files may carry
        # a single class or string labels that DataSet's classification /
        # regression loaders would reject — parse X directly instead
        if is_arff:
            from .io.arff import parse_arff_file

            X_all, _ = parse_arff_file(filename, dtype=csvm.dtype)
        else:
            from .io.libsvm import parse_libsvm_file

            X_all, _ = parse_libsvm_file(filename, dtype=csvm.dtype)
        return nystroem_fit_one_class(
            csvm, DataSet(X_all, dtype=csvm.dtype),
            n_landmarks=n_landmarks, nu=nu,
            random_state=random_state, rcond=rcond,
            return_indices=return_indices,
        )

    _, _, n, d = meta
    from .native.loader import check_line_spans

    check_line_spans(spans, n)
    if not 1 <= n_landmarks <= n:
        raise InvalidParameterError(
            f"n_landmarks must be in [1, {n}], but is {n_landmarks}!"
        )
    rng = np.random.default_rng(random_state)
    idx = np.sort(rng.choice(n, size=int(n_landmarks), replace=False))
    m = idx.shape[0]

    params, kind, gamma_v, coef0_v, degree_v, cost = (
        _resolve_kernel_params(csvm, d)
    )
    dt = csvm.dtype

    Z = _parse_rows_checked(filename, spans[idx], d, dt)
    if kind == KernelFunctionType.CHI_SQUARED and np.any(Z < 0.0):
        raise InvalidParameterError(
            "chi-squared kernel requires non-negative data!"
        )
    block = int(min(row_block, max(8, n)))

    @partial(
        jax.jit, static_argnames=("kind", "degree"), donate_argnums=(0, 1)
    )
    def block_update(A, c, Xblk, sblk, Zd, sqZ, ivr, gamma, coef0,
                     kind, degree):
        # the one-class rhs c = Phi' 1 IS the bordered system's u vector
        A, c, _ = _phi_block_accumulate(
            A, c, Xblk, sblk, Zd, sqZ, ivr, kind, gamma, coef0, degree
        )
        return A, c

    @partial(jax.jit, static_argnames=("kind", "degree"))
    def block_scores(Xblk, Zd, sqZ, alpha_d, gamma, coef0, kind, degree):
        sq = jnp.sum(Xblk * Xblk, axis=1)
        Kbm = kernel_block(Xblk, Zd, sq, sqZ, kind, gamma, coef0, degree)
        return Kbm @ alpha_d

    def windows():
        for b in range(0, n, block):
            e = min(b + block, n)
            Xw = _parse_rows_checked(filename, spans[b:e], d, dt)
            if kind == KernelFunctionType.CHI_SQUARED and np.any(Xw < 0.0):
                raise InvalidParameterError(
                    "chi-squared kernel requires non-negative data!"
                )
            if e - b < block:
                Xp = np.zeros((block, d), dtype=dt)
                Xp[: e - b] = Xw
                sp = np.zeros(block, dtype=dt)
                sp[: e - b] = 1.0
            else:
                Xp, sp = Xw, np.ones(block, dtype=dt)
            yield b, e, Xp, sp

    with csvm._device_ctx():
        Zd = jnp.asarray(Z)
        sqZ, inv_sqrt, ivr = _landmark_basis(
            Zd, kind, gamma_v, coef0_v, degree_v, rcond, dt
        )
        A = jnp.zeros((m, m), dt)
        c = jnp.zeros((m,), dt)
        g_ = dt.type(gamma_v)
        c0 = dt.type(coef0_v)
        for b, e, Xp, sp in windows():
            A, c = block_update(
                A, c, jnp.asarray(Xp), jnp.asarray(sp), Zd, sqZ, ivr,
                g_, c0, kind=kind, degree=degree_v,
            )
        A = np.asarray(jax.device_get(A), dtype=np.float64)
        c = np.asarray(jax.device_get(c), dtype=np.float64)

        # bias-free m x m ridge: (A + I/C) w = c  (c = Phi' 1)
        w = np.linalg.solve(A + np.eye(m) / cost, c)
        alpha = inv_sqrt @ w

        # threshold pass: stream the training scores g = k(x, Z) @ alpha
        alpha_d = jnp.asarray(alpha, dtype=dt)
        g_all = np.empty(n, dtype=np.float64)
        for b, e, Xp, sp in windows():
            gw = np.asarray(
                jax.device_get(
                    block_scores(jnp.asarray(Xp), Zd, sqZ, alpha_d,
                                 g_, c0, kind=kind, degree=degree_v)
                ),
                dtype=np.float64,
            )
            g_all[b:e] = gw[: e - b]

    model = Model(params, DataSet(Z, dtype=dt), alpha=alpha,
                  rho=float(np.quantile(g_all, nu)))
    model.is_one_class = True
    model.n_iter = 0
    if return_indices:
        return model, idx
    return model


# ---------------------------------------------------------------------------
# Compact one-class models (novelty detection with m << n support vectors)
# ---------------------------------------------------------------------------


def _one_class_rho(csvm, model, data: DataSet, nu: float) -> float:
    """The nu-quantile threshold of a compact one-class model, computed
    from the FULL training data's scores under the compact expansion."""
    saved = model.rho
    model.rho = 0.0
    try:
        g = np.asarray(csvm.predict_values(model, data), dtype=np.float64)
    finally:
        model.rho = saved
    return float(np.quantile(g, nu))


def pruned_fit_one_class(
    csvm,
    data: DataSet,
    *,
    n_sv: int,
    nu: float = 0.5,
    prune_rate: float = 0.25,
    epsilon: float = 0.001,
    max_iter: Optional[int] = None,
    sample_weight=None,
    return_indices: bool = False,
):
    """Compact one-class LS-SVM by iterative smallest-|alpha| pruning.

    The one-class analog of :func:`pruned_fit` (Suykens 2002 applied to the
    novelty-detection ridge system ``(K + I/C) a = 1``, one_class.py):
    fit on all points, repeatedly drop the ``prune_rate`` fraction with the
    smallest |alpha| and refit on the survivors (warm-started), until at
    most ``n_sv`` support vectors remain.  The final ``rho`` is the
    ``nu``-quantile of the FULL training data's scores under the compact
    expansion, so ~``nu`` of the training cloud is still flagged as
    outliers — the m-SV model keeps the n-point threshold semantics.
    """
    from .one_class import fit_one_class

    n = data.num_data_points
    if not 1 <= n_sv < n:
        raise InvalidParameterError(
            f"n_sv must be in [1, {n - 1}] to prune a {n}-point data set, "
            f"but is {n_sv}!"
        )
    if not 0.0 < prune_rate < 1.0:
        raise InvalidParameterError(
            f"prune_rate must be in (0, 1), but is {prune_rate}!"
        )

    if sample_weight is not None:
        sample_weight = np.asarray(sample_weight, dtype=np.float64)
    model = fit_one_class(
        csvm, data, nu=nu, epsilon=epsilon, max_iter=max_iter,
        sample_weight=sample_weight,
    )
    X = np.asarray(data.data)
    indices = np.arange(n)
    while indices.shape[0] > n_sv:
        current = indices.shape[0]
        target = max(n_sv, int(np.ceil(current * (1.0 - prune_rate))))
        if target >= current:
            target = current - 1
        magnitude = _alpha_magnitude(model.alpha)
        local_keep = _keep_with_class_floor(magnitude, target, None)
        indices = indices[local_keep]

        sub = DataSet(X[indices], dtype=X.dtype)
        warm = Model(
            model.params.copy(), sub,
            alpha=np.asarray(model.alpha)[local_keep], rho=model.rho,
        )
        warm.is_one_class = True
        sw = sample_weight[indices] if sample_weight is not None else None
        model = fit_one_class(
            csvm, sub, nu=nu, epsilon=epsilon, max_iter=max_iter,
            initial_model=warm, sample_weight=sw,
        )
    model.rho = _one_class_rho(csvm, model, data, nu)
    if return_indices:
        return model, indices
    return model


def nystroem_fit_one_class(
    csvm,
    data: DataSet,
    *,
    n_landmarks: Optional[int] = None,
    landmarks: Optional[Union[Sequence[int], np.ndarray]] = None,
    nu: float = 0.5,
    random_state=0,
    sample_weight=None,
    rcond: float = 1e-10,
    row_block: int = 4096,
    return_indices: bool = False,
):
    """Fixed-size one-class LS-SVM: Nystroem primal ridge with m landmarks.

    The one-class analog of :func:`nystroem_fit`: solve the support-function
    ridge ``min 1/2 |w|^2 + C/2 sum_i (1 - w.phi(x_i))^2`` in the
    m-dimensional Nystroem basis (no bias term — LIBSVM's one-class
    decision function carries the threshold in ``rho`` alone) and return a
    standard m-SV one-class Model (``alpha = K_mm^{-1/2} w``).  Training
    streams the data once in ``row_block`` rows, so n is unbounded by
    device memory; ``rho`` is the ``nu``-quantile of the full training
    scores under the compact expansion.  Row-shards over multi-device
    CSVMs like :func:`nystroem_fit` (psum'd normal-equation partials).
    """
    n = data.num_data_points
    d = data.num_features
    if not 0.0 < nu < 1.0:
        raise InvalidParameterError(
            f"nu must be in (0, 1), but is {nu}!"
        )
    if landmarks is not None:
        raw_idx = np.asarray(landmarks, dtype=np.int64)
        idx = np.unique(raw_idx)
        if (
            idx.size == 0 or idx.size != raw_idx.size
            or idx[0] < 0 or idx[-1] >= n
        ):
            # duplicates must RAISE, not silently shrink the model below
            # the requested size
            raise InvalidParameterError(
                f"landmark indices must be unique and within [0, {n - 1}]!"
            )
    else:
        if n_landmarks is None:
            raise InvalidParameterError(
                "nystroem_fit_one_class needs n_landmarks or explicit "
                "landmarks!"
            )
        if not 1 <= n_landmarks <= n:
            raise InvalidParameterError(
                f"n_landmarks must be in [1, {n}], but is {n_landmarks}!"
            )
        rng = np.random.default_rng(random_state)
        idx = np.sort(rng.choice(n, size=int(n_landmarks), replace=False))
    m = idx.shape[0]

    params, kind, gamma_v, coef0_v, degree_v, cost = (
        _resolve_kernel_params(csvm, d)
    )

    dt = csvm.dtype
    X = np.asarray(data.data, dtype=dt)
    if kind == KernelFunctionType.CHI_SQUARED:
        from .csvm import _check_chi_squared_data

        _check_chi_squared_data(X, "training data")
    Z = X[idx]
    # the support-function target is the constant 1 (one_class.py)
    Y = np.ones((n, 1), dtype=np.float64)
    s = _validated_weights(sample_weight, n)

    devices = getattr(csvm, "devices", None)
    n_dev = len(devices) if devices else 1
    block = int(min(row_block, max(8, -(-n // n_dev))))
    n_pad = int(-(-n // (block * n_dev)) * block * n_dev)
    Xp = np.zeros((n_pad, d), dtype=dt)
    Xp[:n] = X
    sp = np.zeros(n_pad, dtype=dt)
    sp[:n] = s
    Yp = np.zeros((n_pad, 1), dtype=dt)
    Yp[:n] = Y

    with csvm._device_ctx():
        Zd = jnp.asarray(Z)
        _sqZ, inv_sqrt, ivr = _landmark_basis(
            Zd, kind, gamma_v, coef0_v, degree_v, rcond, dt
        )
        if n_dev > 1:
            from .parallel.sharded import make_row_mesh

            A, c, _u = _nystroem_reduce_sharded(
                make_row_mesh(devices), Xp, sp, Yp, Zd, ivr,
                kind, dt.type(gamma_v), dt.type(coef0_v), degree_v, block,
            )
        else:
            A, c, _u = _nystroem_reduce_jit(
                jnp.asarray(Xp), jnp.asarray(sp), jnp.asarray(Yp), Zd,
                ivr, kind=kind,
                gamma=dt.type(gamma_v), coef0=dt.type(coef0_v),
                degree=degree_v, block=block,
            )

    # bias-free m x m ridge: (A + I/C) w = c  (c = Phi' 1)
    A = np.asarray(jax.device_get(A), dtype=np.float64)
    c = np.asarray(jax.device_get(c), dtype=np.float64)[:, 0]
    w = np.linalg.solve(A + np.eye(m) / cost, c)
    alpha = inv_sqrt @ w

    model = Model(params, DataSet(Z, dtype=dt), alpha=alpha, rho=0.0)
    model.is_one_class = True
    model.n_iter = 0
    model.rho = _one_class_rho(csvm, model, data, nu)
    if return_indices:
        return model, idx
    return model
