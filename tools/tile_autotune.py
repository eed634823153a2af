#!/usr/bin/env python3
"""One-shot tile-config sweep for the Pallas dual-contraction kernel.

The (row-tile, feature-block) picks in ``ops/pallas_matvec.py`` were
hand-budgeted (``_SYM_TILES`` + the VMEM feasibility rule).  This tool
MEASURES each candidate config on the live device for the shapes the
bench/ladder hot path actually runs, and persists the best per shape to
``plssvm_tpu/ops/tile_table.json`` — the table ``_tuned_dual_tiles``
consults before falling back to the heuristic.  Full sweep evidence
(every candidate's measured rate) goes to
``tools/tile_autotune_results.json``.

XLA's compile cache makes re-sweeps cheap: every candidate's executable
is cached by shape+config, so repeating the sweep after a software
update costs seconds, not the first run's compile minutes.

Reference analog: the CMake-tunable ``PLSSVM_THREAD_BLOCK_SIZE`` /
``INTERNAL_BLOCK_SIZE`` (include/plssvm/constants.hpp:22-40) — fixed
per build there, measured per shape here.

Usage:
  python tools/tile_autotune.py                 # ladder/bench shapes
  python tools/tile_autotune.py --shapes 65536x1024,204800x1024
  python tools/tile_autotune.py --dry-run       # list candidates only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLE_PATH = os.path.join(REPO, "plssvm_tpu", "ops", "tile_table.json")
RESULTS_PATH = os.path.join(REPO, "tools", "tile_autotune_results.json")


def _round_up(x, mult):
    return -(-x // mult) * mult


def default_shapes():
    """The dual-matvec shapes the bench headline + BASELINE ladder run.

    Each ladder rung's solve pads rows with
    ``preferred_row_multiple`` and features to a 128 multiple; operands
    past the per-call range split into equal chunks, so the shape the
    dual kernel SEES for the 1M north star is its chunk, not 1M.
    """
    from plssvm_tpu.ops.pallas_matvec import (
        CHUNK_TARGET_BYTES,
        preferred_row_multiple,
    )

    shapes = [(65536, 1024)]  # bench.py headline matvec
    for n, d in ((10240, 200), (51200, 500), (204800, 1024),
                 (1048576, 1024)):
        dept = n - 1
        d_pad = _round_up(d, 128)
        m_pad = _round_up(dept, preferred_row_multiple(dept, d_pad))
        total = m_pad * d_pad * 4
        nc = max(1, -(-total // CHUNK_TARGET_BYTES))
        while nc <= min(m_pad // 128, 128) and (
            m_pad % nc != 0 or (m_pad // nc) % 128 != 0
        ):
            nc += 1
        rows = m_pad // nc if 1 < nc <= 128 else m_pad
        if (rows, d_pad) not in shapes:
            shapes.append((rows, d_pad))
    return shapes


def candidates(m, d):
    """Feasible (dk, tile) configs for a symmetric (m, m, d) dual call."""
    from plssvm_tpu.ops.pallas_matvec import (
        _FULL_D_MAX,
        _SYM_TILES,
        _VMEM_LIMIT_BYTES,
    )

    dks = []
    if d <= _FULL_D_MAX:
        dks.append(d)
    for c in (512, 256, 128):
        if d % c == 0 and c < d and c not in dks:
            dks.append(c)
    # prune configs that cannot plausibly win (keeps tunnel compile time
    # bounded): very narrow feature blocks on wide d re-stream the vector
    # epilogue too often; 128-row tiles under-utilize the MXU at scale
    dks = [dk for dk in dks if dk * 4 >= d or d <= 256][:2]
    out = []
    for dk in dks:
        for t in _SYM_TILES:
            if m % t != 0:
                continue
            if t == 128 and m > 2048:
                continue
            if t == 256 and m > 65536:
                continue
            vmem = 2 * t * dk * 4 + 2 * t * t * 4 + m * 4 + 6 * t * 4
            if vmem <= _VMEM_LIMIT_BYTES - (8 << 20):
                out.append((dk, t))
    return out


def measure(m, d, dk, t, iters=8, precision="f32"):
    """TFLOP/s of the symmetric dual matvec at (m, m, d) with (dk, t).

    Timed through ``jax.device_get`` of a result element (the tunneled
    runtime's ``block_until_ready`` can return early — BENCHMARKS.md).
    FLOPs counted as the full-matrix 2 m^2 d like the bench headline.
    """
    import jax
    import jax.numpy as jnp

    from plssvm_tpu.ops.pallas_matvec import kernel_matvec_pallas_dual
    from plssvm_tpu.parameter import KernelFunctionType

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
    sq = jnp.sum(X * X, axis=-1)
    gamma = jnp.asarray(1.0 / d, jnp.float32)
    coef0 = jnp.asarray(0.0, jnp.float32)

    @jax.jit
    def run(X, sq, v):
        def body(_, vv):
            r, c = kernel_matvec_pallas_dual(
                X, X, sq, sq, vv, vv,
                kind=KernelFunctionType.RBF, gamma=gamma, coef0=coef0,
                degree=3, precision=precision, symmetric=True,
                tile=t, dk=dk,
            )
            out = r + c
            return out / jnp.linalg.norm(out)

        return jax.lax.fori_loop(0, iters, body, v)

    jax.device_get(run(X, sq, v)[0])  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(run(X, sq, v)[0])
        best = min(best, time.perf_counter() - t0)
    flops = (2.0 * m * m * d + 8.0 * m * m) * iters
    return flops / best / 1e12


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default=None,
                    help="comma-separated MxD list (default: ladder/bench)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--precision", default="f32",
                    choices=["f32", "bf16", "highest"])
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--no-write", action="store_true",
                    help="measure but do not update the committed table")
    args = ap.parse_args()

    if args.shapes:
        shapes = [
            tuple(int(v) for v in s.split("x")) for s in args.shapes.split(",")
        ]
    else:
        shapes = default_shapes()

    from plssvm_tpu.ops.pallas_matvec import _tuned_dual_tiles

    results = []
    table = {}
    if os.path.isfile(TABLE_PATH):
        with open(TABLE_PATH) as fh:
            table = json.load(fh)

    for m, d in shapes:
        cands = candidates(m, d)
        # heuristic pick with the table DISABLED, so re-sweeps compare
        # against the hand-budgeted rule, not a previous sweep
        import plssvm_tpu.ops.pallas_matvec as pm

        os.environ["PLSSVM_TILE_TABLE"] = ""
        try:
            pm._TILE_TABLE = None
            heur = _tuned_dual_tiles(m, m, d, args.precision)
        finally:
            pm._TILE_TABLE = None
            del os.environ["PLSSVM_TILE_TABLE"]
        print(f"shape {m}x{d}: {len(cands)} candidates, heuristic "
              f"(dk={heur[0]}, tile={heur[1]})", flush=True)
        if args.dry_run:
            for dk, t in cands:
                print(f"  dk={dk:5d} tile={t:5d}")
            continue
        rates = {}
        for dk, t in cands:
            # a candidate the kernel's own validation rejects (the two
            # feasibility rules are maintained independently) must not
            # abort the sweep and lose every measurement
            try:
                rate = measure(m, d, dk, t, iters=args.iters,
                               precision=args.precision)
            except Exception as exc:
                print(f"  dk={dk:5d} tile={t:5d}  FAILED: {exc}",
                      flush=True)
                continue
            rates[(dk, t)] = rate
            mark = " <- heuristic" if (dk, t) == heur else ""
            print(f"  dk={dk:5d} tile={t:5d}  {rate:8.1f} TFLOP/s{mark}",
                  flush=True)
        if not rates:
            print(f"shape {m}x{d}: every candidate failed — skipped",
                  flush=True)
            continue
        best_cfg = max(rates, key=rates.get)
        heur_rate = rates.get(heur)
        entry = {
            "shape": f"{m}x{d}",
            "precision": args.precision,
            "heuristic": {"dk": heur[0], "tile": heur[1],
                          "tflops": round(heur_rate, 1) if heur_rate else None},
            "best": {"dk": best_cfg[0], "tile": best_cfg[1],
                     "tflops": round(rates[best_cfg], 1)},
            "all": [
                {"dk": dk, "tile": t, "tflops": round(r, 1)}
                for (dk, t), r in sorted(rates.items())
            ],
        }
        results.append(entry)
        key = f"dual:{m}x{m}x{d}:{args.precision}"
        table[key] = {
            "dk": best_cfg[0], "tile": best_cfg[1],
            "tflops": round(rates[best_cfg], 1),
            "heuristic_tflops": (
                round(heur_rate, 1) if heur_rate is not None else None
            ),
        }
        print(f"  best (dk={best_cfg[0]}, tile={best_cfg[1]}) "
              f"{rates[best_cfg]:.1f} TFLOP/s vs heuristic "
              f"{heur_rate:.1f}" if heur_rate else "", flush=True)

    if args.dry_run:
        return 0
    # merge into existing evidence (keyed by shape+precision) so a bf16
    # re-sweep does not erase the f32 record
    existing = []
    if os.path.isfile(RESULTS_PATH):
        try:
            with open(RESULTS_PATH) as fh:
                existing = json.load(fh)
        except ValueError:
            existing = []
    new_keys = {(e["shape"], e.get("precision", "f32")) for e in results}
    merged = [
        e for e in existing
        if (e["shape"], e.get("precision", "f32")) not in new_keys
    ] + results
    with open(RESULTS_PATH, "w") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")
    print(f"evidence -> {RESULTS_PATH}")
    if not args.no_write:
        with open(TABLE_PATH, "w") as fh:
            json.dump(table, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"table -> {TABLE_PATH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
