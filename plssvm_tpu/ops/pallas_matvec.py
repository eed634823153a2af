"""Fused Pallas TPU kernel for the implicit kernel-matrix matvec ``K @ v``.

This is the TPU-native replacement for the reference's hand-tiled CUDA/HIP/
OpenCL/SYCL "svm kernels" (reference: src/plssvm/backends/CUDA/
svm_kernel.cu:17-222 — 16x16 thread blocks x 6x6 register tiles with
shared-memory staging, triangular symmetry and atomicAdd scatter).

TPU re-design:
- 128-multiple tiles feeding the MXU replace the 96x96 thread-block tiles.
- No scatter atomics exist on TPU, so instead of exploiting triangular
  symmetry with atomicAdd the kernel computes full square tiles; the extra
  FLOPs are nearly free because the matvec is O(n^2 d) compute over O(n d)
  memory — the MXU-dense full tile beats a sparse triangular walk.
- The kernel epilogue (poly power / rbf exp) is fused right after the Gram
  tile, and the tile is immediately contracted against ``v``, so the O(n^2)
  kernel matrix never leaves VMEM, let alone touches HBM.

Two kernels, chosen by feature width:

1. ``d <= _FULL_D_MAX`` (the common case): grid (i, j) over row/col tiles
   with the **whole feature axis in one block**.  The row tile ``X_i`` has
   index map (i, 0) — constant while j sweeps — so Pallas keeps it resident
   in VMEM and only the column tiles stream from HBM: traffic is
   ~m^2 d 4 / TILE bytes per matvec instead of the naive 2 m^2 d 4 / TILE.
   Tiles are **asymmetric** — a short row tile x a wide column tile (e.g.
   512 x 4096) measured fastest on v5e: the wide Gram block amortizes
   per-step overhead while the short row tile keeps the VMEM-resident
   output/row state small.
2. ``d > _FULL_D_MAX``: grid (i, j, k) accumulating the Gram tile over
   feature blocks in VMEM scratch (bounded VMEM at any d).

``precision`` selects the Gram contraction precision:

- "f32" (default): f32 storage/HBM traffic, single-pass MXU dots.  NOTE the
  TPU MXU multiplies in bf16 — a single-pass f32 dot rounds each operand to
  bf16 (JAX's default dot precision), so elementwise Gram error is ~5e-4
  regardless of the f32 storage.  Accumulation is always f32.
- "bf16": additionally stores/streams the operands as bfloat16 — half the
  HBM traffic at the same MXU rate and the same single-pass accuracy.
- "highest": f32 storage + multi-pass f32 dots (``lax.Precision.HIGHEST``)
  — reference(f64)-grade Gram accuracy (~1e-6) at roughly 1/3 the MXU rate;
  for ill-conditioned problems / tiny epsilons.

The CG solve tolerates single-pass precision because the convergence test
uses the same operator and the every-50th exact residual re-anchors drift
(solver/cg.py); model parity with f64 references degrades — see
``solve_ls_svm``'s ``gram_precision`` contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernel_functions import apply_kernel_to_gram
from ..parameter import KernelFunctionType

#: row-tile height candidates; MXU-aligned (multiple of 128)
_TILES = (512, 256, 128)
#: column-tile width candidates (wide tiles amortize per-step overhead)
_COL_TILES = (4096, 2048, 1024, 512, 256, 128)
#: VMEM element budget for (xi + 2*xj + gram); ~24 MB of f32
_VMEM_ELEMS = 6 * 1024 * 1024
#: raised scoped-VMEM cap for the pallas_call (v5e has 128 MB physical VMEM;
#: the 16 MB default rejects the wide-column tiles)
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
#: feature-axis block width per grid step of the k-blocked kernel
_FEATURE_BLOCK = 512
#: widest feature axis the single-block (i, j) kernel will take whole
_FULL_D_MAX = 1024
#: per-pallas_call operand ceiling: beyond ~2 GiB the TPU worker faults
#: (32-bit byte-offset arithmetic inside the kernel).  Larger problems are
#: NOT a fallback anymore — the solve composes chunked dual-contraction
#: calls (kernel_matvec_pallas_big); this constant still bounds each
#: individual call (predict chunking, sharded ring blocks)
PALLAS_MAX_OPERAND_BYTES = 3 << 29  # 1.5 GiB


def _i32(*vals):
    """Index maps must return i32: under jax x64 mode plain ints trace as
    i64, which Mosaic cannot legalize ('func.return' (i64, i64))."""
    return tuple(jnp.asarray(v, jnp.int32) for v in vals)


def _pick_tile(m: int, candidates=_TILES) -> int:
    for candidate in candidates:
        if m % candidate == 0:
            return candidate
    raise ValueError(f"Pallas matvec needs rows padded to a multiple of 128, got {m}")


def _pick_feature_block(d: int) -> int:
    for candidate in (_FEATURE_BLOCK, 256, 128):
        if d % candidate == 0:
            return candidate
    raise ValueError(f"Pallas matvec needs features padded to a multiple of 128, got {d}")


def _epilogue_and_contract(gram, sqi_ref, sqj_ref, vj_ref, out_ref, *, kind, degree, gamma, coef0):
    """Fused kernel epilogue on the Gram tile + contraction against v.

    The contraction runs on the VPU (multiply + reduce, f32): an MXU matvec
    pads the vector operand to 128 lanes, costing ~128/d of the Gram tile
    per pass, while the VPU reduce is exact and overlaps with the MXU.
    """
    k_tile = apply_kernel_to_gram(
        gram,
        sqi_ref[0, :][:, None],
        sqj_ref[0, :][None, :],
        kind,
        gamma,
        coef0,
        degree,
    )
    contrib = jnp.sum(k_tile * vj_ref[0, :][None, :], axis=1)
    out_ref[0, :] = out_ref[0, :] + contrib


def _matvec_kernel_fulld(
    gamma_ref, coef0_ref,          # SMEM (1, 1)
    xi_ref,                        # VMEM (T, d) row tile — resident across j
    xj_ref,                        # VMEM (T, d) col tile — streams
    sqi_ref, sqj_ref, vj_ref,      # VMEM (1, T)
    out_ref,                       # VMEM (1, T) — accumulated across j
    *, kind, degree, dot_prec=None,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    gram = jax.lax.dot_general(
        xi_ref[:], xj_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_prec,
    )
    _epilogue_and_contract(
        gram, sqi_ref, sqj_ref, vj_ref, out_ref,
        kind=kind, degree=degree,
        gamma=gamma_ref[0, 0], coef0=coef0_ref[0, 0],
    )


#: tile candidates for the dual-contraction kernel (large tiles amortize the
#: skipped lower-triangle grid steps)
_SYM_TILES = (2048, 1024, 512, 256, 128)


def _dot_prec(precision: str):
    """In-kernel MXU dot precision for a Gram-precision level.

    "bf16" and "f32" run the MXU's native single pass (f32 *storage* still
    rounds each operand to bf16 inside the MXU — JAX's default dot
    precision on TPU; elementwise Gram error ~5e-4).  "highest" requests
    full-f32 multi-pass dots — reference(f64)-grade Gram accuracy at ~1/3
    the MXU rate; use it for ill-conditioned problems or tiny epsilons.
    """
    if precision not in ("bf16", "f32", "highest"):
        raise ValueError(
            f"unknown gram precision '{precision}' "
            "(must be 'bf16', 'f32' or 'highest')"
        )
    return jax.lax.Precision.HIGHEST if precision == "highest" else None


def _matvec_kernel_blocked(
    gamma_ref, coef0_ref,
    xi_ref,                        # VMEM (T, dk)
    xj_ref,                        # VMEM (T, dk)
    sqi_ref, sqj_ref, vj_ref,      # VMEM (1, T)
    out_ref,                       # VMEM (1, T)
    gram_acc,                      # VMEM scratch (T, T) f32
    *, kind, degree, dot_prec=None,
):
    j = pl.program_id(1)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    partial = jax.lax.dot_general(
        xi_ref[:], xj_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_prec,
    )

    @pl.when(k == 0)
    def _():
        gram_acc[:] = partial

    @pl.when(k != 0)
    def _():
        gram_acc[:] = gram_acc[:] + partial

    @pl.when(k == nk - 1)
    def _():
        _epilogue_and_contract(
            gram_acc[:], sqi_ref, sqj_ref, vj_ref, out_ref,
            kind=kind, degree=degree,
            gamma=gamma_ref[0, 0], coef0=coef0_ref[0, 0],
        )


# ---------------------------------------------------------------------------
# Unified dual-contraction kernel (round 2 redesign)
#
# One kernel covers every regime the round-1 kernels split across three:
# - grid (i, j, k) with the feature axis k-blocked -> any d, bounded VMEM
#   (replaces both the full-d and the k-blocked walks; d <= 1024 runs nk=1)
# - each K tile is contracted against BOTH vectors: rows (K @ v_y) into a
#   per-i output block and columns (K^T @ v_x) into a VMEM-RESIDENT
#   accumulator written back once at the end of the grid.  This removes the
#   round-1 (nt, 8, m) HBM column-partials array entirely — the partials
#   were written + re-read once per matvec and capped the symmetric kernel
#   at ~256 MB of partials, which is why it could not run at 1M rows.
# - `symmetric=True` walks only the upper triangle (j >= i); the conditional
#   index maps keep both tile DMAs constant across skipped steps so the
#   lower triangle costs neither FLOPs nor HBM traffic.
# - operands larger than the 32-bit in-kernel offset range are handled by
#   the triangle-chunked composition `kernel_matvec_pallas_big`: each
#   cross-chunk block is computed ONCE by the dual contraction, preserving
#   the 2x symmetric saving globally (the round-1 chunked composition
#   computed cross blocks twice and lost to the XLA scan).
# ---------------------------------------------------------------------------


def _matvec_kernel_dual(
    gamma_ref, coef0_ref,          # SMEM (1, 1)
    xi_ref,                        # VMEM (t, dk) row tile
    yj_ref,                        # VMEM (t, dk) col tile
    sqi_ref, sqj_ref,              # VMEM (1, t)
    vy_ref, vx_ref,                # VMEM (1, t)
    outr_ref,                      # VMEM (1, t) block i — row accumulator
    outc_ref,                      # VMEM (ntj, t) resident — col accumulator
    gram_acc,                      # VMEM scratch (t, t) f32
    *, kind, degree, nk, symmetric, dot_prec=None,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(jnp.logical_and(i == 0, jnp.logical_and(j == 0, k == 0)))
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)

    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _():
        outr_ref[:] = jnp.zeros_like(outr_ref)

    def compute():
        partial = jax.lax.dot_general(
            xi_ref[:], yj_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_prec,
        )
        if nk > 1:
            @pl.when(k == 0)
            def _():
                gram_acc[:] = partial

            @pl.when(k != 0)
            def _():
                gram_acc[:] = gram_acc[:] + partial

        @pl.when(k == nk - 1)
        def _():
            gram = gram_acc[:] if nk > 1 else partial
            k_tile = apply_kernel_to_gram(
                gram,
                sqi_ref[0, :][:, None],
                sqj_ref[0, :][None, :],
                kind,
                gamma_ref[0, 0],
                coef0_ref[0, 0],
                degree,
            )
            # both contractions on the VPU (overlaps the MXU, exact f32;
            # an MXU matvec would waste ~128/t of the tile per pass)
            row = jnp.sum(k_tile * vy_ref[0, :][None, :], axis=1)
            outr_ref[0, :] = outr_ref[0, :] + row
            col = jnp.sum(k_tile * vx_ref[0, :][:, None], axis=0)
            if symmetric:
                # the diagonal tile contributes rows only — its transpose
                # would double-count
                col = jnp.where(j > i, col, jnp.zeros_like(col))
            cur = outc_ref[pl.ds(j, 1), :]
            outc_ref[pl.ds(j, 1), :] = cur + col[None, :]

    if symmetric:
        @pl.when(j >= i)
        def _():
            compute()
    else:
        compute()


def _pick_dual_tile(mr: int, mc: int, dk: int):
    """Largest tile dividing both row counts within the VMEM budget."""
    for t in _SYM_TILES:
        if mr % t != 0 or mc % t != 0:
            continue
        # xi + yj + gram scratch + k_tile temp + col accumulator + vectors
        vmem = 2 * t * dk * 4 + 2 * t * t * 4 + mc * 4 + 6 * t * 4
        if vmem <= _VMEM_LIMIT_BYTES - (8 << 20):
            return t
    return None


def _dual_index_maps(symmetric: bool):
    """(xi_map, yj_map, colv_map) shared by the dual matvec/matmat
    dispatchers.  Strongly-typed i32 index math: under jax x64 mode the
    weak-typed grid indices and the literal 0 promote to i64 inside
    jnp.where, which Mosaic cannot legalize (infinite _convert_helper
    recursion)."""
    if symmetric:
        def xi_map(i, j, k):
            i, j, k = _i32(i, j, k)
            return i, jnp.where(j >= i, k, jnp.int32(0))

        def yj_map(i, j, k):
            i, j, k = _i32(i, j, k)
            return jnp.maximum(i, j), jnp.where(j >= i, k, jnp.int32(0))

        def colv_map(i, j, k):
            i, j, k = _i32(i, j, k)
            return jnp.int32(0), jnp.maximum(i, j)
    else:
        def xi_map(i, j, k):
            return _i32(i, k)

        def yj_map(i, j, k):
            return _i32(j, k)

        def colv_map(i, j, k):
            return _i32(0, j)
    return xi_map, yj_map, colv_map


def _pick_dual_dk(d: int) -> int:
    if d <= _FULL_D_MAX:
        return d
    for candidate in (_FEATURE_BLOCK, 256, 128):
        if d % candidate == 0:
            return candidate
    raise ValueError(f"Pallas matvec needs features padded to a multiple of 128, got {d}")


#: measured per-shape tile table (tools/tile_autotune.py sweep output,
#: committed as package data).  None until first lookup; {} if the file is
#: absent/invalid.  PLSSVM_TILE_TABLE overrides the path (empty string
#: disables the table entirely — pure heuristic picks).
_TILE_TABLE = None


def _load_tile_table() -> dict:
    global _TILE_TABLE
    if _TILE_TABLE is None:
        import json
        import os

        path = os.environ.get("PLSSVM_TILE_TABLE")
        if path == "":
            _TILE_TABLE = {}
            return _TILE_TABLE
        if path is None:
            path = os.path.join(os.path.dirname(__file__), "tile_table.json")
        try:
            with open(path) as fh:
                _TILE_TABLE = json.load(fh)
        except (OSError, ValueError):
            _TILE_TABLE = {}
    return _TILE_TABLE


def _tuned_dual_tiles(mr: int, mc: int, d: int, precision: str):
    """(dk, tile) for the dual-contraction kernel: the MEASURED table
    first (tools/tile_autotune.py — XLA's compile cache makes re-sweeps
    cheap), the hand-budgeted heuristic otherwise.

    Table entries are validated like heuristic picks (divisibility + the
    VMEM budget) so a stale table from different hardware degrades to the
    heuristic instead of a Mosaic error.  Reference analog: the
    CMake-tunable PLSSVM_THREAD_BLOCK_SIZE / INTERNAL_BLOCK_SIZE
    (include/plssvm/constants.hpp:22-40) — but measured per shape rather
    than fixed per build.
    """
    entry = _load_tile_table().get(f"dual:{mr}x{mc}x{d}:{precision}")
    if entry is not None:
        dk, t = int(entry["dk"]), int(entry["tile"])
        # same feasibility rule as _pick_dual_tile, with the true mc
        vmem = 2 * t * dk * 4 + 2 * t * t * 4 + mc * 4 + 6 * t * 4
        if (
            d % dk == 0 and mr % t == 0 and mc % t == 0
            and vmem <= _VMEM_LIMIT_BYTES - (8 << 20)
        ):
            return dk, t
    dk = _pick_dual_dk(d)
    return dk, _pick_dual_tile(mr, mc, dk)


def _vma_set(vma):
    """Normalize a varying-mesh-axes spec for pallas_call out_shapes.

    Under ``jax.shard_map(..., check_vma=True)`` every pallas_call output
    must DECLARE which mesh axes it varies over (the replication checker
    has no rule for opaque kernels).  The ring callers pass their row-axis
    name; ``None`` (the single-device case) keeps the default.
    """
    if vma is None:
        return None
    return frozenset({vma}) if isinstance(vma, str) else frozenset(vma)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "degree", "precision", "symmetric", "vma", "tile", "dk",
    ),
)
def kernel_matvec_pallas_dual(
    X: jnp.ndarray,          # (mr, d) rows of the kernel block
    Y: jnp.ndarray,          # (mc, d) columns of the kernel block
    sq_rows: jnp.ndarray,    # (mr,)
    sq_cols: jnp.ndarray,    # (mc,)
    v_y: jnp.ndarray,        # (mc,) contracted against K's rows
    v_x: jnp.ndarray,        # (mr,) contracted against K's columns
    *,
    kind: KernelFunctionType,
    gamma,
    coef0,
    degree: int,
    precision: str = "f32",
    symmetric: bool = False,
    vma=None,
    tile: int = None,        # explicit tile override (tools/tile_autotune.py)
    dk: int = None,          # explicit feature-block override
):
    """Dual contraction of one kernel block: ``(K @ v_y, K^T @ v_x)``.

    ``symmetric=True`` requires X and Y to be the SAME array and walks only
    the upper triangle; the full ``K @ v`` is then the SUM of the two
    outputs.  This is the TPU answer to the reference's triangular
    atomicAdd scatter (svm_kernel.cu:26,74,85): half the MXU work and HBM
    traffic, no atomics, no HBM partials.  ``vma`` declares the mesh axes
    the outputs vary over when called inside a checked shard_map.

    ``tile``/``dk`` force a specific (row-tile, feature-block) config —
    the autotune sweep's measurement hook; the default consults the
    measured per-shape table, then the hand-budgeted heuristic
    (``_tuned_dual_tiles``).
    """
    mr, d = X.shape
    mc = Y.shape[0]
    in_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    if tile is None and dk is None:
        dk, t = _tuned_dual_tiles(mr, mc, d, precision)
    else:
        # explicit override(s): validate like the auto-pick would — a
        # non-dividing tile would silently skip rows past grid*t, and a
        # partially-forced config must re-derive (not reuse) the other
        # half so the pairing stays feasible
        if dk is None:
            dk = _pick_dual_dk(d)
        elif d % dk != 0:
            raise ValueError(
                f"forced dk={dk} does not divide the feature axis {d}"
            )
        if tile is None:
            t = _pick_dual_tile(mr, mc, dk)
        else:
            t = tile
            vmem = 2 * t * dk * 4 + 2 * t * t * 4 + mc * 4 + 6 * t * 4
            if (
                mr % t != 0 or mc % t != 0
                or vmem > _VMEM_LIMIT_BYTES - (8 << 20)
            ):
                raise ValueError(
                    f"forced tile config (dk={dk}, tile={t}) is infeasible "
                    f"for shape ({mr}, {mc}, {d}): the tile must divide the "
                    "padded rows and fit the VMEM budget"
                )
    nk = d // dk
    if t is None:
        raise ValueError(
            f"no Pallas tile for shape ({mr}, {mc}, {d}); rows must be "
            "padded to a multiple of 128"
        )
    ni, nj = mr // t, mc // t

    Xc = X.astype(in_dtype)
    Yc = Y.astype(in_dtype)
    sq_r = sq_rows.astype(jnp.float32).reshape(1, mr)
    sq_c = sq_cols.astype(jnp.float32).reshape(1, mc)
    vy_row = v_y.astype(jnp.float32).reshape(1, mc)
    vx_row = v_x.astype(jnp.float32).reshape(1, mr)
    gamma_arr = jnp.asarray(gamma, jnp.float32).reshape(1, 1)
    coef0_arr = jnp.asarray(coef0, jnp.float32).reshape(1, 1)

    itemsize = 2 if precision == "bf16" else 4
    flops = 2 * mr * mc * d + 16 * mr * mc
    if symmetric:
        flops = flops // 2 + flops // 8
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(mr + mc) * d * itemsize + 6 * (mr + mc) * 4,
        transcendentals=(
            (mr * mc // 2 if symmetric else mr * mc)
            if kind in (KernelFunctionType.RBF, KernelFunctionType.SIGMOID)
            else 0
        ),
    )

    xi_map, yj_map, colv_map = _dual_index_maps(symmetric)

    outr, outc = pl.pallas_call(
        functools.partial(
            _matvec_kernel_dual,
            kind=kind, degree=degree, nk=nk, symmetric=symmetric,
            dot_prec=_dot_prec(precision),
        ),
        grid=(ni, nj, nk),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, k: _i32(0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: _i32(0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((t, dk), xi_map),
            pl.BlockSpec((t, dk), yj_map),
            pl.BlockSpec((1, t), lambda i, j, k: _i32(0, i)),
            pl.BlockSpec((1, t), colv_map),
            pl.BlockSpec((1, t), colv_map),
            pl.BlockSpec((1, t), lambda i, j, k: _i32(0, i)),
        ],
        out_specs=(
            pl.BlockSpec((1, t), lambda i, j, k: _i32(0, i)),
            pl.BlockSpec((nj, t), lambda i, j, k: _i32(0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, mr), jnp.float32, vma=_vma_set(vma)),
            jax.ShapeDtypeStruct((nj, t), jnp.float32, vma=_vma_set(vma)),
        ),
        scratch_shapes=[pltpu.VMEM((t, t), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
    )(gamma_arr, coef0_arr, Xc, Yc, sq_r, sq_c, vy_row, vx_row)
    return outr.reshape(mr), outc.reshape(mc)


#: per-operand byte target for one pallas_call in the chunked composition —
#: comfortably inside the 32-bit in-kernel offset range (faults were
#: observed above ~2 GiB round 1)
CHUNK_TARGET_BYTES = 1 << 30


def chunk_spans(m: int, rows_target: int):
    """128-aligned row spans covering [0, m) with chunks <= ~rows_target.

    Every span is a 128-multiple (m itself must be one); the last span
    takes the remainder.  Unlike the former exact-divisor search this
    NEVER degenerates to a single un-chunked call — a prime m/128 simply
    gets one short remainder chunk, so the per-call byte/ops caps hold
    for ANY padded row count.  The chunk count is bounded at ~128 (a
    triangle of more calls would hang compilation); that bound only
    binds for operands far past any real HBM.
    """
    step = max(-(-rows_target // 128) * 128, 128)
    step = max(step, -(-(-(-m // 128)) // 128) * 128)  # <= ~128 chunks
    bounds = list(range(0, m, step)) + [m]
    return list(zip(bounds[:-1], bounds[1:]))


def preferred_row_multiple(dept: int, d_pad: int, itemsize: int = 4) -> int:
    """Row-padding multiple CSVM.fit should use on the Pallas path.

    When the operand needs chunking, rows must split evenly into nc chunks
    of 2048-divisible height so every chunk gets the tallest tile."""
    total = dept * d_pad * itemsize
    nc = max(1, -(-total // CHUNK_TARGET_BYTES))
    return nc * 2048 if nc > 1 else 128


@functools.partial(jax.jit, static_argnames=("kind", "degree", "precision"))
def kernel_matvec_pallas_big(
    X: jnp.ndarray,
    sq_norms: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kind: KernelFunctionType,
    gamma,
    coef0,
    degree: int,
    precision: str = "f32",
) -> jnp.ndarray:
    """Symmetric ``K @ v`` at ANY size (the round-1 1.5 GiB cliff is gone).

    Operands within the per-call range run as ONE dual-contraction call;
    larger ones are split into nc row chunks and composed as a TRIANGLE of
    chunk pairs: diagonal chunks through the symmetric walk, each cross
    block (ci < cj) computed once with both contractions.  Total MXU work
    and HBM traffic stay at the single-call symmetric level (~half the full
    walk) regardless of size — unlike the reference, whose kernels are
    size-agnostic only because each thread block re-reads both row blocks
    (svm_kernel.cu:17-88).
    """
    m, d = X.shape
    itemsize = 2 if precision == "bf16" else 4
    total = m * d * itemsize
    nc = max(1, -(-total // CHUNK_TARGET_BYTES))
    if nc == 1:
        outr, outc = kernel_matvec_pallas_dual(
            X, X, sq_norms, sq_norms, v, v,
            kind=kind, gamma=gamma, coef0=coef0, degree=degree,
            precision=precision, symmetric=True,
        )
        return (outr + outc).astype(X.dtype)

    # 128-aligned SPANS, not exact divisors: any padded m chunks cleanly
    # (a short remainder chunk at worst), so the per-call byte cap holds
    # for every row count — the old divisor search silently fell back to
    # ONE oversized call when m/128 was prime
    spans = chunk_spans(m, -(-m // nc))

    outs = []
    for a0, a1 in spans:
        r, c = kernel_matvec_pallas_dual(
            X[a0:a1], X[a0:a1], sq_norms[a0:a1], sq_norms[a0:a1],
            v[a0:a1], v[a0:a1],
            kind=kind, gamma=gamma, coef0=coef0, degree=degree,
            precision=precision, symmetric=True,
        )
        outs.append(r + c)
    for i, (a0, a1) in enumerate(spans):
        for j in range(i + 1, len(spans)):
            b0, b1 = spans[j]
            r, c = kernel_matvec_pallas_dual(
                X[a0:a1], X[b0:b1], sq_norms[a0:a1], sq_norms[b0:b1],
                v[b0:b1], v[a0:a1],
                kind=kind, gamma=gamma, coef0=coef0, degree=degree,
                precision=precision, symmetric=False,
            )
            outs[i] = outs[i] + r
            outs[j] = outs[j] + c
    return jnp.concatenate(outs).astype(X.dtype)


# ---------------------------------------------------------------------------
# Multiclass block matmat: the dual-contraction walk against C columns
#
# One-vs-all block CG (solver/cg.py::cg_ls_svm_multi_core) contracts each
# Gram tile with C right-hand sides.  The TPU-native answer keeps the
# symmetric upper-triangle walk and swaps the VPU vector contractions for
# tiny MXU matmuls in CLASS-MAJOR layout: with V stored (Cp, m) the row
# contraction is (Cp, t_j) x (t_i, t_j)^T and the column contraction is
# (Cp, t_i) x (t_i, t_j) — both cost ~max(Cp,8)/d of the Gram tile, so C
# classes ride along nearly free.  The column accumulator stays VMEM-resident
# as (nj*Cp, t) rows (Cp*mc*4 bytes — 8 MB at the 256k-row chunk size), the
# same residency trick as the binary dual kernel.
#
# The reference has no multiclass at all (data_set.hpp:443 rejects > 2
# labels); a sequential one-vs-all over its binary kernels would pay the
# full Gram C times (svm_kernel.cu:93-155 per class).
# ---------------------------------------------------------------------------


def _matmat_kernel_dual(
    gamma_ref, coef0_ref,          # SMEM (1, 1)
    xi_ref,                        # VMEM (t, dk) row tile
    yj_ref,                        # VMEM (t, dk) col tile
    sqi_ref, sqj_ref,              # VMEM (1, t)
    vy_ref,                        # VMEM (cp, t) class-major RHS block j
    vx_ref,                        # VMEM (cp, t) class-major RHS block i
    outr_ref,                      # VMEM (cp, t) block i — row accumulator
    outc_ref,                      # VMEM (nj*cp, t) resident — col accumulator
    gram_acc,                      # VMEM scratch (t, t) f32
    *, kind, degree, nk, symmetric, cp, dot_prec=None,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(jnp.logical_and(i == 0, jnp.logical_and(j == 0, k == 0)))
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)

    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _():
        outr_ref[:] = jnp.zeros_like(outr_ref)

    def compute():
        partial = jax.lax.dot_general(
            xi_ref[:], yj_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_prec,
        )
        if nk > 1:
            @pl.when(k == 0)
            def _():
                gram_acc[:] = partial

            @pl.when(k != 0)
            def _():
                gram_acc[:] = gram_acc[:] + partial

        @pl.when(k == nk - 1)
        def _():
            gram = gram_acc[:] if nk > 1 else partial
            k_tile = apply_kernel_to_gram(
                gram,
                sqi_ref[0, :][:, None],
                sqj_ref[0, :][None, :],
                kind,
                gamma_ref[0, 0],
                coef0_ref[0, 0],
                degree,
            )
            # rows: outr[c, ti] += sum_tj k_tile[ti, tj] vy[c, tj]
            rowT = jax.lax.dot_general(
                vy_ref[:], k_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_prec,
            )
            outr_ref[:] = outr_ref[:] + rowT
            # cols: outc[c, tj] += sum_ti k_tile[ti, tj] vx[c, ti]
            colT = jax.lax.dot_general(
                vx_ref[:], k_tile,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_prec,
            )
            if symmetric:
                # the diagonal tile contributes rows only
                colT = jnp.where(j > i, colT, jnp.zeros_like(colT))
            cur = outc_ref[pl.ds(j * cp, cp), :]
            outc_ref[pl.ds(j * cp, cp), :] = cur + colT

    if symmetric:
        @pl.when(j >= i)
        def _():
            compute()
    else:
        compute()


def _pick_dual_tile_multi(mr: int, mc: int, dk: int, cp: int):
    """Largest tile dividing both row counts within the VMEM budget."""
    for t in _SYM_TILES:
        if mr % t != 0 or mc % t != 0:
            continue
        # xi + yj + gram scratch + k_tile temp + resident col accumulator
        # + class-major vector blocks (vy, vx, outr)
        vmem = (
            2 * t * dk * 4 + 2 * t * t * 4 + cp * mc * 4 + 3 * cp * t * 4
        )
        if vmem <= _VMEM_LIMIT_BYTES - (8 << 20):
            return t
    return None


def class_pad(n_classes: int) -> int:
    """Class-axis padding for the matmat kernels: multiple of 8 (f32
    sublane tile), minimum 8."""
    return max(8, -(-n_classes // 8) * 8)


def pack_class_major(V: jnp.ndarray) -> jnp.ndarray:
    """(m, C) row-major right-hand sides -> (cp, m) class-major f32 with
    zero-padded class rows, the layout the matmat kernels contract."""
    m, C = V.shape
    cp = class_pad(C)
    return jnp.zeros((cp, m), jnp.float32).at[:C].set(V.T.astype(jnp.float32))


def ring_block_supported(
    m_local: int, d: int, n_classes: int | None = None, itemsize: int = 4
) -> bool:
    """Can ONE dual pallas_call contract an (m_local, m_local, d) ring
    block?  Checks both the 32-bit in-kernel offset range and that a VMEM-
    feasible tile exists (the matmat kernels keep a (cp * m_local) column
    accumulator resident, so many classes or tall shards can exhaust the
    budget even when the operand itself fits).  The sharded-solve impl
    selection (CSVM / multihost) must call this so an infeasible shape
    degrades to the XLA ring instead of raising mid-fit."""
    if m_local % 128 != 0 or d % 128 != 0:
        return False
    if m_local * d * itemsize > PALLAS_MAX_OPERAND_BYTES:
        return False
    dk = _pick_dual_dk(d)
    if n_classes is None:
        return _pick_dual_tile(m_local, m_local, dk) is not None
    return (
        _pick_dual_tile_multi(m_local, m_local, dk, class_pad(n_classes))
        is not None
    )


@functools.partial(
    jax.jit,
    static_argnames=("kind", "degree", "precision", "symmetric", "vma"),
)
def kernel_matmat_pallas_dual(
    X: jnp.ndarray,          # (mr, d) rows of the kernel block
    Y: jnp.ndarray,          # (mc, d) columns of the kernel block
    sq_rows: jnp.ndarray,    # (mr,)
    sq_cols: jnp.ndarray,    # (mc,)
    Vy: jnp.ndarray,         # (cp, mc) class-major, contracted against K rows
    Vx: jnp.ndarray,         # (cp, mr) class-major, contracted against K cols
    *,
    kind: KernelFunctionType,
    gamma,
    coef0,
    degree: int,
    precision: str = "f32",
    symmetric: bool = False,
    vma=None,
):
    """Dual contraction of one kernel block against C class-major columns:
    ``(K @ Vy^T, K^T @ Vx^T)`` returned class-major as (cp, mr), (cp, mc).

    The block-matmat analog of :func:`kernel_matvec_pallas_dual` — same
    upper-triangle walk, same residency, MXU contractions instead of VPU.
    ``cp`` (the leading axis of Vy/Vx) must be a multiple of 8 (f32 sublane
    tile); pad unused class rows with zeros.  ``vma`` as in the matvec dual.
    """
    mr, d = X.shape
    mc = Y.shape[0]
    cp = Vy.shape[0]
    in_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    dk = _pick_dual_dk(d)
    nk = d // dk
    t = _pick_dual_tile_multi(mr, mc, dk, cp)
    if t is None:
        raise ValueError(
            f"no Pallas tile for shape ({mr}, {mc}, {d}, C={cp}); rows must "
            "be padded to a multiple of 128"
        )
    ni, nj = mr // t, mc // t

    Xc = X.astype(in_dtype)
    Yc = Y.astype(in_dtype)
    sq_r = sq_rows.astype(jnp.float32).reshape(1, mr)
    sq_c = sq_cols.astype(jnp.float32).reshape(1, mc)
    Vy_c = Vy.astype(jnp.float32)
    Vx_c = Vx.astype(jnp.float32)
    gamma_arr = jnp.asarray(gamma, jnp.float32).reshape(1, 1)
    coef0_arr = jnp.asarray(coef0, jnp.float32).reshape(1, 1)

    itemsize = 2 if precision == "bf16" else 4
    flops = 2 * mr * mc * (d + 2 * max(cp, 8)) + 16 * mr * mc
    if symmetric:
        flops = flops // 2 + flops // 8
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(mr + mc) * d * itemsize + 3 * cp * (mr + mc) * 4,
        transcendentals=(
            (mr * mc // 2 if symmetric else mr * mc)
            if kind in (KernelFunctionType.RBF, KernelFunctionType.SIGMOID)
            else 0
        ),
    )

    xi_map, yj_map, colv_map = _dual_index_maps(symmetric)

    outr, outc = pl.pallas_call(
        functools.partial(
            _matmat_kernel_dual,
            kind=kind, degree=degree, nk=nk, symmetric=symmetric, cp=cp,
            dot_prec=_dot_prec(precision),
        ),
        grid=(ni, nj, nk),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, k: _i32(0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: _i32(0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((t, dk), xi_map),
            pl.BlockSpec((t, dk), yj_map),
            pl.BlockSpec((1, t), lambda i, j, k: _i32(0, i)),
            pl.BlockSpec((1, t), colv_map),
            pl.BlockSpec((cp, t), colv_map),
            pl.BlockSpec((cp, t), lambda i, j, k: _i32(0, i)),
        ],
        out_specs=(
            pl.BlockSpec((cp, t), lambda i, j, k: _i32(0, i)),
            pl.BlockSpec((nj * cp, t), lambda i, j, k: _i32(0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, mr), jnp.float32, vma=_vma_set(vma)),
            jax.ShapeDtypeStruct(
                (nj * cp, t), jnp.float32, vma=_vma_set(vma)
            ),
        ),
        scratch_shapes=[pltpu.VMEM((t, t), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
    )(gamma_arr, coef0_arr, Xc, Yc, sq_r, sq_c, Vy_c, Vx_c)
    outc = (
        outc.reshape(nj, cp, t).transpose(1, 0, 2).reshape(cp, mc)
    )
    return outr, outc


@functools.partial(jax.jit, static_argnames=("kind", "degree", "precision"))
def kernel_matmat_pallas_big(
    X: jnp.ndarray,          # (m, d)
    sq_norms: jnp.ndarray,   # (m,)
    V: jnp.ndarray,          # (m, C) block of right-hand sides
    *,
    kind: KernelFunctionType,
    gamma,
    coef0,
    degree: int,
    precision: str = "f32",
) -> jnp.ndarray:
    """Symmetric ``K @ V`` at ANY size — the block-matmat analog of
    :func:`kernel_matvec_pallas_big` (same triangle-of-chunks composition,
    same per-call operand ceiling).  Takes and returns row-major (m, C)."""
    m, d = X.shape
    C = V.shape[1]
    cp = class_pad(C)
    Vt = pack_class_major(V)

    itemsize = 2 if precision == "bf16" else 4
    total = m * d * itemsize
    dk = _pick_dual_dk(d)

    nc = max(1, -(-total // CHUNK_TARGET_BYTES))
    rows_target = -(-m // nc)
    # the VMEM-resident (cp, rows) column accumulator must also fit —
    # many classes over tall chunks can exhaust the budget even when the
    # operand itself is within the per-call byte range
    rows_target = max((rows_target // 128) * 128, 128)
    while (
        rows_target > 128
        and _pick_dual_tile_multi(rows_target, rows_target, dk, cp) is None
    ):
        rows_target -= 128
    if nc == 1 and _pick_dual_tile_multi(m, m, dk, cp) is not None:
        outr, outc = kernel_matmat_pallas_dual(
            X, X, sq_norms, sq_norms, Vt, Vt,
            kind=kind, gamma=gamma, coef0=coef0, degree=degree,
            precision=precision, symmetric=True,
        )
        return (outr + outc).T[:, :C].astype(V.dtype)

    spans = chunk_spans(m, rows_target)

    outs = []
    for a0, a1 in spans:
        r, c = kernel_matmat_pallas_dual(
            X[a0:a1], X[a0:a1], sq_norms[a0:a1], sq_norms[a0:a1],
            Vt[:, a0:a1], Vt[:, a0:a1],
            kind=kind, gamma=gamma, coef0=coef0, degree=degree,
            precision=precision, symmetric=True,
        )
        outs.append(r + c)
    for i, (a0, a1) in enumerate(spans):
        for j in range(i + 1, len(spans)):
            b0, b1 = spans[j]
            r, c = kernel_matmat_pallas_dual(
                X[a0:a1], X[b0:b1], sq_norms[a0:a1], sq_norms[b0:b1],
                Vt[:, b0:b1], Vt[:, a0:a1],
                kind=kind, gamma=gamma, coef0=coef0, degree=degree,
                precision=precision, symmetric=False,
            )
            outs[i] = outs[i] + r
            outs[j] = outs[j] + c
    out = jnp.concatenate(outs, axis=1)
    return out.T[:, :C].astype(V.dtype)


@functools.partial(jax.jit, static_argnames=("kind", "degree", "precision"))
def kernel_matvec_pallas(
    X: jnp.ndarray,          # (m, d) zero-padded, m % 128 == 0, d % 128 == 0
    sq_norms: jnp.ndarray,   # (m,)
    v: jnp.ndarray,          # (m,) zeros on padded entries
    *,
    kind: KernelFunctionType,
    gamma,
    coef0,
    degree: int,
    precision: str = "f32",
) -> jnp.ndarray:
    """``K @ v`` with ``K[i,j] = k(x_i, x_j)`` as one fused Pallas kernel."""
    return kernel_matvec_pallas_rect(
        X, X, sq_norms, sq_norms, v,
        kind=kind, gamma=gamma, coef0=coef0, degree=degree,
        precision=precision, symmetric=True,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kind", "degree", "precision", "symmetric", "vma"),
)
def kernel_matvec_pallas_rect(
    X: jnp.ndarray,          # (mr, d) rows of the kernel block
    Y: jnp.ndarray,          # (mc, d) columns of the kernel block
    sq_rows: jnp.ndarray,    # (mr,) squared norms of X's rows
    sq_cols: jnp.ndarray,    # (mc,) squared norms of Y's rows
    v: jnp.ndarray,          # (mc,) vector to contract against
    *,
    kind: KernelFunctionType,
    gamma,
    coef0,
    degree: int,
    precision: str = "f32",
    symmetric: bool = False,
    vma=None,
) -> jnp.ndarray:
    """``K(X, Y) @ v`` with ``K[i,j] = k(x_i, y_j)`` — the rectangular form.

    Used directly by the single-device solve (X == Y, pass
    ``symmetric=True``) and per ring step by the sharded solve, where Y is
    the rotating column block.  ``symmetric`` must only be set when X and Y
    are the SAME array — it dispatches the upper-triangle-only kernel.
    ``vma`` as in :func:`kernel_matvec_pallas_dual`.
    """
    mr, d = X.shape
    mc = Y.shape[0]

    in_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    Xc = X.astype(in_dtype)
    Yc = Y.astype(in_dtype)
    sq_r = sq_rows.astype(jnp.float32).reshape(1, mr)
    sq_c = sq_cols.astype(jnp.float32).reshape(1, mc)
    v_row = v.astype(jnp.float32).reshape(1, mc)
    gamma_arr = jnp.asarray(gamma, jnp.float32).reshape(1, 1)
    coef0_arr = jnp.asarray(coef0, jnp.float32).reshape(1, 1)

    itemsize = 2 if precision == "bf16" else 4
    flops = 2 * mr * mc * d + 8 * mr * mc
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(mr + mc) * d * itemsize + 3 * mc * 4,
        transcendentals=(
            mr * mc
            if kind in (KernelFunctionType.RBF, KernelFunctionType.SIGMOID)
            else 0
        ),
    )

    # square case: exploit K's symmetry via the dual-contraction kernel —
    # ~half the MXU work and HBM traffic of the full tile walk
    if symmetric:
        outr, outc = kernel_matvec_pallas_dual(
            X, X, sq_rows, sq_rows, v, v,
            kind=kind, gamma=gamma, coef0=coef0, degree=degree,
            precision=precision, symmetric=True, vma=vma,
        )
        return (outr + outc).astype(X.dtype)

    if d <= _FULL_D_MAX:
        # Tile regime depends on what binds:
        # - small problems are MXU-bound: short rows x wide columns (the
        #   wide Gram block amortizes per-step overhead);
        # - once the column operand is large (mc*d >> VMEM), HBM streaming
        #   binds: per matvec the columns are re-streamed (mr/ti) times, so
        #   the ROW tile should be as tall as VMEM allows.
        dma_bound = mc * d * itemsize > (512 << 20)
        row_candidates = (2048, 1024, 512, 256, 128) if dma_bound else _TILES
        ti = None
        tj = None
        for ti_c in row_candidates:
            if mr % ti_c != 0:
                continue
            for tj_c in _COL_TILES:
                if mc % tj_c != 0:
                    continue
                elems = ti_c * d + 2 * tj_c * d + ti_c * tj_c
                if elems <= _VMEM_ELEMS:
                    ti, tj = ti_c, tj_c
                    break
            if ti is not None:
                break
        if ti is None:
            ti = _pick_tile(mr, (128,))
            tj = _pick_tile(mc, (128,))
        grid = (mr // ti, mc // tj)
        out = pl.pallas_call(
            functools.partial(
                _matvec_kernel_fulld, kind=kind, degree=degree,
                dot_prec=_dot_prec(precision),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: _i32(0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j: _i32(0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((ti, d), lambda i, j: _i32(i, 0)),
                pl.BlockSpec((tj, d), lambda i, j: _i32(j, 0)),
                pl.BlockSpec((1, ti), lambda i, j: _i32(0, i)),
                pl.BlockSpec((1, tj), lambda i, j: _i32(0, j)),
                pl.BlockSpec((1, tj), lambda i, j: _i32(0, j)),
            ],
            out_specs=pl.BlockSpec((1, ti), lambda i, j: _i32(0, i)),
            out_shape=jax.ShapeDtypeStruct(
                (1, mr), jnp.float32, vma=_vma_set(vma)
            ),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
        )(gamma_arr, coef0_arr, Xc, Yc, sq_r, sq_c, v_row)
    else:
        ti = _pick_tile(mr, (256, 128))
        tj = _pick_tile(mc, (256, 128))
        dk = _pick_feature_block(d)
        grid = (mr // ti, mc // tj, d // dk)
        out = pl.pallas_call(
            functools.partial(
                _matvec_kernel_blocked, kind=kind, degree=degree,
                dot_prec=_dot_prec(precision),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j, k: _i32(0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j, k: _i32(0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((ti, dk), lambda i, j, k: _i32(i, k)),
                pl.BlockSpec((tj, dk), lambda i, j, k: _i32(j, k)),
                pl.BlockSpec((1, ti), lambda i, j, k: _i32(0, i)),
                pl.BlockSpec((1, tj), lambda i, j, k: _i32(0, j)),
                pl.BlockSpec((1, tj), lambda i, j, k: _i32(0, j)),
            ],
            out_specs=pl.BlockSpec((1, ti), lambda i, j, k: _i32(0, i)),
            out_shape=jax.ShapeDtypeStruct(
                (1, mr), jnp.float32, vma=_vma_set(vma)
            ),
            scratch_shapes=[pltpu.VMEM((ti, tj), jnp.float32)],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
        )(gamma_arr, coef0_arr, Xc, Yc, sq_r, sq_c, v_row)

    return out.reshape(mr).astype(X.dtype)
