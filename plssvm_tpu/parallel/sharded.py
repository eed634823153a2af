"""Multi-chip LS-SVM training: row-sharded CG over a TPU device mesh.

TPU-native replacement for the reference's multi-device scheme
(include/plssvm/backends/gpu_csvm.hpp:284-346,449-475), which

- splits the *feature* axis across GPUs, **linear kernel only** (poly/rbf are
  forced to a single device, gpu_csvm.hpp:288-291), and
- all-reduces per CG iteration by staging every device buffer through the
  host (`device_reduction`, gpu_csvm.hpp:449-475).

Here instead the **data-point (row) axis** is sharded across the mesh — this
works for *all three* kernels (a deliberate capability the reference lacks):

- Each chip owns a row block ``X_p`` of the training data, its slice of every
  CG vector (r, d, x, q, b), and computes its rows of ``K @ v``.
- For poly/RBF the column blocks needed to form ``K[rows_p, :] @ v`` are
  obtained by **ring-rotating** ``(X_q, |X_q|^2, v_q)`` around the mesh with
  ``lax.ppermute`` over ICI — the kernel-matvec analog of ring attention:
  memory stays O(n d / P) per chip, every hop is a nearest-neighbour transfer
  XLA can overlap with the current block's MXU work.
- For the linear kernel ``K @ v = X (X^T v)`` needs only one ``psum`` of the
  d-length partial ``X_p^T v_p`` — O(n d / P) compute, O(d) communication.
- CG scalar reductions (r.r, d.Ad, sum(v), q.v) are ``psum``s over ICI; every
  chip sees identical scalars so the `lax.while_loop` control flow stays in
  lock-step with zero host round-trips (the reference's per-iteration
  host-staged all-reduce disappears entirely).

The CG algorithm itself is the single-chip one — `cg_ls_svm_core` — run
inside `jax.shard_map`; only the reductions and the kernel matvec differ.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernel_functions import apply_kernel_to_gram
from ..parameter import KernelFunctionType
from ..solver.cg import (
    CGResult,
    MultiCGResult,
    cg_ls_svm_core,
    cg_ls_svm_multi_core,
)

#: mesh axis name for the row (data-point) sharding
ROW_AXIS = "rows"


def make_row_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over ``devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (ROW_AXIS,))


def ring_kernel_matvec(
    X_local: jnp.ndarray,     # (m_local, d) this chip's row block
    sq_local: jnp.ndarray,    # (m_local,) squared norms of the row block
    v_local: jnp.ndarray,     # (m_local,) this chip's slice of v
    gamma,
    coef0,
    *,
    kind: KernelFunctionType,
    degree: int,
    axis_name: str,
    num_devices: int,
    impl: str = "xla",
) -> jnp.ndarray:
    """This chip's rows of ``K @ v`` via a ring rotation of column blocks.

    out_p = sum_q K(X_p, X_q) @ v_q.  Step s computes the block against the
    chunk originally owned by chip (p - s) mod P, then forwards it to the
    right neighbour.  The loop is unrolled (P is static and small) so XLA can
    overlap each `ppermute` hop with the current block's MXU work.

    ``impl="pallas"`` runs each block through the fused Pallas kernel
    (TPU only; block shapes must be 128-aligned).
    """
    if impl == "pallas":
        from ..solver.cg import PALLAS_MAX_OPERAND_BYTES

        if X_local.size * X_local.dtype.itemsize > PALLAS_MAX_OPERAND_BYTES:
            impl = "xla"  # per-chip block too large for 32-bit kernel offsets

    perm = [(j, (j + 1) % num_devices) for j in range(num_devices)]
    Xc, sqc, vc = X_local, sq_local, v_local
    acc = jnp.zeros_like(v_local)
    for step in range(num_devices):
        if impl == "pallas":
            from ..ops.pallas_matvec import kernel_matvec_pallas_rect

            # step 0 is the chip's own block: K(X_p, X_p) is symmetric, so
            # the upper-triangle kernel applies
            blk = kernel_matvec_pallas_rect(
                X_local, Xc, sq_local, sqc, vc,
                kind=kind, gamma=gamma, coef0=coef0, degree=degree,
                symmetric=(step == 0),
            )
        else:
            gram = jax.lax.dot_general(
                X_local, Xc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32 if X_local.dtype == jnp.float32 else None,
            )  # (m_local, m_local)
            K_blk = apply_kernel_to_gram(
                gram, sq_local[:, None], sqc[None, :], kind, gamma, coef0, degree
            )
            blk = K_blk @ vc
        acc = acc + blk
        if step + 1 < num_devices:
            Xc = jax.lax.ppermute(Xc, axis_name, perm)
            sqc = jax.lax.ppermute(sqc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
    return acc


def ring_kernel_matmat(
    X_local: jnp.ndarray,     # (m_local, d) this chip's row block
    sq_local: jnp.ndarray,    # (m_local,)
    V_local: jnp.ndarray,     # (m_local, C) this chip's slice of the RHS block
    gamma,
    coef0,
    *,
    kind: KernelFunctionType,
    degree: int,
    axis_name: str,
    num_devices: int,
    impl: str = "xla",
) -> jnp.ndarray:
    """This chip's rows of ``K @ V`` via the ring — the block-matmat analog
    of :func:`ring_kernel_matvec` for the one-vs-all multiclass solve.

    ``impl="pallas"`` contracts each ring block with all C class-major
    columns in one dual-matmat walk (the chip's own block through the
    symmetric upper-triangle kernel); ``xla`` is the portable shared-Gram
    matmul.
    """
    if impl == "pallas":
        from ..solver.cg import PALLAS_MAX_OPERAND_BYTES

        if X_local.size * X_local.dtype.itemsize > PALLAS_MAX_OPERAND_BYTES:
            impl = "xla"  # per-chip block too large for 32-bit kernel offsets

    perm = [(j, (j + 1) % num_devices) for j in range(num_devices)]
    C = V_local.shape[1]
    m_local = V_local.shape[0]
    if impl == "pallas":
        from ..ops.pallas_matvec import kernel_matmat_pallas_dual

        cp = max(8, -(-C // 8) * 8)
        vt_local = jnp.zeros((cp, m_local), jnp.float32).at[:C].set(
            V_local.T.astype(jnp.float32)
        )
        Xc, sqc, vtc = X_local, sq_local, vt_local
        accT = jnp.zeros((cp, m_local), jnp.float32)
        for step in range(num_devices):
            r, c = kernel_matmat_pallas_dual(
                X_local, Xc, sq_local, sqc, vtc, vtc,
                kind=kind, gamma=gamma, coef0=coef0, degree=degree,
                symmetric=(step == 0),
            )
            # the chip's own block walks the upper triangle only: the full
            # contribution is rows + transposed-columns; cross blocks use
            # the row contraction alone
            accT = accT + (r + c if step == 0 else r)
            if step + 1 < num_devices:
                Xc = jax.lax.ppermute(Xc, axis_name, perm)
                sqc = jax.lax.ppermute(sqc, axis_name, perm)
                vtc = jax.lax.ppermute(vtc, axis_name, perm)
        return accT.T[:, :C].astype(V_local.dtype)

    Xc, sqc, vc = X_local, sq_local, V_local
    acc = jnp.zeros_like(V_local)
    for step in range(num_devices):
        gram = jax.lax.dot_general(
            X_local, Xc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32 if X_local.dtype == jnp.float32 else None,
        )
        K_blk = apply_kernel_to_gram(
            gram, sq_local[:, None], sqc[None, :], kind, gamma, coef0, degree
        )
        acc = acc + K_blk @ vc
        if step + 1 < num_devices:
            Xc = jax.lax.ppermute(Xc, axis_name, perm)
            sqc = jax.lax.ppermute(sqc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
    return acc


def linear_sharded_matvec(
    X_local: jnp.ndarray, v_local: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """Row-sharded ``(X X^T) @ v`` via the factored O(n d / P) path.

    The only communication is one psum of the d-length partial ``X_p^T v_p``.
    """
    xtv = jax.lax.psum(X_local.T @ v_local, axis_name)
    return X_local @ xtv


_SOLVER_CACHE: dict = {}


def build_sharded_solver(
    mesh: Mesh, *, kind: KernelFunctionType, degree: int, impl: str = "xla",
    preconditioner: str = "none", scalars: str = "plain",
):
    """A jitted, shard_map'ped LS-SVM CG solve over ``mesh``.

    Inputs are expected already placed with `shard_arrays` (X/y/mask row-
    sharded, everything else replicated); the returned `CGResult.x` is
    row-sharded, scalars replicated.  ``impl="pallas"`` uses the fused Pallas
    kernel for each ring block (TPU meshes only).  ``scalars="compensated"``
    runs the per-chip partial reductions with double-float accumulation
    before the psum (solver.cg.compensated_dot).
    """
    key = (mesh, kind, degree, impl, preconditioner, scalars)
    cached = _SOLVER_CACHE.get(key)
    if cached is not None:
        return cached

    num_devices = mesh.devices.size

    def local_solve(X, x_last, y, y_last, mask, gamma, coef0, cost, eps, max_iter):
        if scalars == "compensated":
            from ..solver.cg import compensated_dot, compensated_sum

            def dot(a, b):
                return jax.lax.psum(compensated_dot(a, b), ROW_AXIS)

            def vsum(v):
                return jax.lax.psum(compensated_sum(v), ROW_AXIS)
        else:
            def dot(a, b):
                return jax.lax.psum(jnp.dot(a, b), ROW_AXIS)

            def vsum(v):
                return jax.lax.psum(jnp.sum(v), ROW_AXIS)

        if kind == KernelFunctionType.LINEAR:
            def kernel_mv(Xl, sq, v, g, c0):
                return linear_sharded_matvec(Xl, v, ROW_AXIS)
        else:
            def kernel_mv(Xl, sq, v, g, c0):
                return ring_kernel_matvec(
                    Xl, sq, v, g, c0,
                    kind=kind, degree=degree,
                    axis_name=ROW_AXIS, num_devices=num_devices,
                    impl=impl,
                )

        return cg_ls_svm_core(
            X, x_last, y, y_last, mask, gamma, coef0, cost, eps, max_iter,
            kind=kind, degree=degree, kernel_mv=kernel_mv, dot=dot, vsum=vsum,
            preconditioner=preconditioner,
        )

    row = P(ROW_AXIS)
    rep = P()
    solve = jax.jit(
        jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=(P(ROW_AXIS, None), rep, row, rep, row,
                      rep, rep, rep, rep, rep),
            out_specs=CGResult(
                x=row, rho=rep, alpha_last=rep,
                iterations=rep, delta=rep, delta0=rep,
                r=row, d=row,
            ),
            # pallas_call outputs carry no varying-mesh-axes metadata, which
            # the replication checker requires; the psum'd scalars are
            # replicated by construction.  The check stays ON for the xla
            # impl so a mis-specced collective is still caught there.
            check_vma=(impl != "pallas"),
        )
    )
    _SOLVER_CACHE[key] = solve
    return solve


_MULTI_SOLVER_CACHE: dict = {}


def build_sharded_multi_solver(
    mesh: Mesh, *, kind: KernelFunctionType, degree: int,
    preconditioner: str = "none", scalars: str = "plain",
    impl: str = "xla",
):
    """A jitted, shard_map'ped one-vs-all multiclass block-CG solve.

    Same row sharding as :func:`build_sharded_solver`, but the CG state is an
    (m, C) block: the ring rotation forwards (m_local/P, C) direction blocks
    and each chip contracts its Gram blocks with ALL C columns — the shared-
    Gram saving of the block solve composes with the ring's O(n d / P)
    per-chip memory.  Per-class CG scalars are (C,) psums.
    """
    key = (mesh, kind, degree, preconditioner, scalars, impl)
    cached = _MULTI_SOLVER_CACHE.get(key)
    if cached is not None:
        return cached

    num_devices = mesh.devices.size

    def local_solve(X, x_last, Y, y_last, mask, gamma, coef0, cost, eps, max_iter):
        if scalars == "compensated":
            from ..solver.cg import compensated_sum

            def colsum(M):
                return jax.lax.psum(compensated_sum(M), ROW_AXIS)
        else:
            def colsum(M):
                return jax.lax.psum(jnp.sum(M, axis=0), ROW_AXIS)

        if kind == KernelFunctionType.LINEAR:
            def kernel_mm(Xl, sq, V, g, c0):
                return linear_sharded_matvec(Xl, V, ROW_AXIS)
        else:
            def kernel_mm(Xl, sq, V, g, c0):
                return ring_kernel_matmat(
                    Xl, sq, V, g, c0,
                    kind=kind, degree=degree,
                    axis_name=ROW_AXIS, num_devices=num_devices,
                    impl=impl,
                )

        return cg_ls_svm_multi_core(
            X, x_last, Y, y_last, mask, gamma, coef0, cost, eps, max_iter,
            kind=kind, degree=degree, kernel_mm=kernel_mm, colsum=colsum,
            preconditioner=preconditioner,
        )

    row2 = P(ROW_AXIS, None)
    rep = P()
    solve = jax.jit(
        jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=(row2, rep, row2, rep, P(ROW_AXIS),
                      rep, rep, rep, rep, rep),
            out_specs=MultiCGResult(
                x=row2, rho=rep, alpha_last=rep,
                iterations=rep, iterations_per_class=rep,
                delta=rep, delta0=rep,
                r=row2, d=row2,
            ),
            # pallas_call outputs carry no varying-mesh-axes metadata (same
            # scoping as build_sharded_solver: the check stays ON for xla)
            check_vma=(impl != "pallas"),
        )
    )
    _MULTI_SOLVER_CACHE[key] = solve
    return solve


_PREDICT_CACHE: dict = {}


def build_sharded_predict(
    mesh: Mesh, *, kind: KernelFunctionType, degree: int, row_block: int = 256,
    multi: bool = False,
):
    """A jitted, shard_map'ped decision-value computation over ``mesh``.

    The **support-vector axis** is sharded (it is the big axis in LS-SVM —
    every training point is an SV), predict points are replicated: each chip
    streams K(points, sv_local) @ alpha_local over point row blocks and a
    single ``psum`` combines the partial decision values.  Per-chip memory is
    O(n_sv d / P + row_block * n_sv / P) — a model too large for one chip can
    be scored (the reference predicts on device 0 only, gpu_csvm.hpp:722).

    Padded SV rows are harmless for every kernel because their alpha is
    zero; padded point rows produce garbage values the caller slices off.
    ``multi=True`` shards an (n_sv, C) one-vs-all alpha matrix along the SV
    axis; decision values come back as (n_pred, C).
    """
    key = (mesh, kind, degree, row_block, multi)
    cached = _PREDICT_CACHE.get(key)
    if cached is not None:
        return cached

    from ..ops.predict import predict_values_blocked

    def local_predict(sv_local, alpha_local, rho, points, gamma, coef0):
        part = predict_values_blocked(
            sv_local, alpha_local, jnp.zeros_like(rho), points, gamma, coef0,
            kind=kind, degree=degree, row_block=row_block,
        )
        return jax.lax.psum(part, ROW_AXIS) - rho

    row = P(ROW_AXIS)
    rep = P()
    fn = jax.jit(
        jax.shard_map(
            local_predict,
            mesh=mesh,
            in_specs=(
                P(ROW_AXIS, None),
                P(ROW_AXIS, None) if multi else row,
                rep, rep, rep, rep,
            ),
            out_specs=rep,
        )
    )
    _PREDICT_CACHE[key] = fn
    return fn


def shard_predict_arrays(mesh: Mesh, sv, alpha, points, dtype):
    """Place model + points for the sharded predict (SVs sharded, points
    replicated).  The SV count must be divisible by the mesh size — the
    caller pads SVs with zero rows and alpha with zeros."""
    row2 = NamedSharding(mesh, P(ROW_AXIS, None))
    row1 = NamedSharding(mesh, P(ROW_AXIS))
    rep = NamedSharding(mesh, P())
    alpha = jnp.asarray(alpha, dtype)
    return (
        jax.device_put(jnp.asarray(sv, dtype), row2),
        # (n_sv,) binary alpha or (n_sv, C) one-vs-all columns
        jax.device_put(alpha, row2 if alpha.ndim == 2 else row1),
        jax.device_put(jnp.asarray(points, dtype), rep),
    )


def shard_arrays(mesh: Mesh, X, x_last, y, y_last, mask, dtype):
    """Place the padded training arrays onto the mesh.

    ``X``/``y``/``mask`` row-sharded, the rest replicated.  Row count must be
    divisible by the mesh size (the CSVM front end pads accordingly).
    """
    row2 = NamedSharding(mesh, P(ROW_AXIS, None))
    row1 = NamedSharding(mesh, P(ROW_AXIS))
    rep = NamedSharding(mesh, P())
    y = jnp.asarray(y, dtype)
    return (
        jax.device_put(jnp.asarray(X, dtype), row2),
        jax.device_put(jnp.asarray(x_last, dtype), rep),
        # (m,) binary targets or (m, C) one-vs-all target columns
        jax.device_put(y, row2 if y.ndim == 2 else row1),
        jax.device_put(jnp.asarray(y_last, dtype), rep),
        jax.device_put(jnp.asarray(mask, dtype), row1),
    )
