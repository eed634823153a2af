#!/usr/bin/env python3
"""Benchmark the distance-kernel implicit matvec: fused Pallas vs XLA.

Round-4 verdict item 4: the laplacian/chi-squared implicit path lost 28x
to explicit-K, and past the K-fits-in-HBM ceiling the implicit matvec is
the only option.  Target: the fused Pallas walk (ops/pallas_distance.py)
>= 3x over the XLA blocked path at 64k x 512.

Timing through jax.device_get of an element (block_until_ready can lie
under the tunneled runtime — BENCHMARKS.md).  "TOP/s" counts the VPU op
model from the kernel's CostEstimate (3 ops/elem laplacian, 6 chi2).

Usage: python tools/bench_distance.py [--m 65536] [--d 512] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--kinds", default="laplacian,chi_squared")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from plssvm_tpu.ops.matvec import distance_kernel_matvec_sym
    from plssvm_tpu.ops.pallas_distance import distance_matvec_pallas_big
    from plssvm_tpu.parameter import KernelFunctionType

    m, d, iters = args.m, args.d, args.iters
    rng = np.random.default_rng(0)
    # non-negative data (chi-squared requirement); same operand for both
    X = jnp.asarray(np.abs(rng.normal(size=(m, d))).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
    gamma = np.float32(1.0 / d)

    def loop(mv):
        @jax.jit
        def run(X, v):
            def body(_, vv):
                out = mv(X, vv)
                return out / jnp.linalg.norm(out)
            return jax.lax.fori_loop(0, iters, body, v)
        return run

    results = {}
    for kind_name in args.kinds.split(","):
        kind = KernelFunctionType[kind_name.upper()]
        per_elem = 3 if kind == KernelFunctionType.LAPLACIAN else 6
        ops_per_mv = per_elem * float(m) * m * d

        impls = {
            "pallas": lambda X, v, k=kind: distance_matvec_pallas_big(
                X, v, kind=k, gamma=gamma
            ),
            "xla": lambda X, v, k=kind: distance_kernel_matvec_sym(
                X, v, gamma, kind=k, row_block=2048
            ),
        }
        row = {}
        for name, mv in impls.items():
            run = loop(mv)
            t_compile = time.perf_counter()
            jax.device_get(run(X, v0)[0])  # compile + warm
            print(
                f"[{kind_name}/{name}] compile+first "
                f"{time.perf_counter() - t_compile:.1f}s",
                file=sys.stderr, flush=True,
            )
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                jax.device_get(run(X, v0)[0])
                best = min(best, time.perf_counter() - t0)
            row[name] = {
                "s_per_matvec": round(best / iters, 4),
                "top_per_s": round(ops_per_mv * iters / best / 1e12, 2),
            }
        row["speedup"] = round(
            row["xla"]["s_per_matvec"] / row["pallas"]["s_per_matvec"], 2
        )
        results[kind_name] = row
        print(json.dumps({kind_name: row}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
