#!/usr/bin/env python3
"""Projected multi-chip scaling for the sharded LS-SVM solve.

Real multi-chip hardware is not reachable from this environment (one
tunneled chip), so this tool produces the next-best evidence for
BASELINE.md's >= 80% scaling target (round-4 verdict item 7):

1. **Measured collective counts** — build the row-sharded CG solver on a
   P-virtual-device CPU mesh, compile it, and COUNT the collectives
   (collective-permute / all-reduce) and their operand bytes in the
   optimized HLO.  These are the actual collectives XLA will issue per CG
   iteration on a pod — not a hand-derived estimate.
2. **Analytic projection** — combine the per-iteration communication
   volume with (a) the measured single-chip kernel floor (the per-round
   bench's matvec TFLOP/s) and (b) the public v5e ICI bandwidth, into
   projected per-iteration times and scaling efficiencies for 2-8 chips.

Usage: python tools/scaling_projection.py [--devices 8] [--json]
The written model lives in BENCHMARKS.md ("Projected multi-chip scaling").
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# append (not setdefault): a pre-set XLA_FLAGS must not silently drop the
# virtual-device flag — that would shrink the mesh to 1 device and report
# an EMPTY collective inventory (same fix as tests/conftest.py)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np


#: public TPU v5e per-chip ICI bandwidth (spec sheet: 1600 Gbps aggregate)
V5E_ICI_BYTES_PER_S = 200e9
#: measured single-chip implicit-matvec throughput (BENCH_r03/r04 headline)
MEASURED_TFLOPS = 351.0


def count_collectives(hlo_text: str) -> dict:
    """Per-op counts and total operand bytes of the collectives in an
    optimized HLO module."""
    out = {}
    dtype_bytes = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4}
    for op in ("collective-permute", "all-reduce", "all-gather",
               "reduce-scatter", "all-to-all"):
        total = 0
        count = 0
        # e.g.:  %x = f32[131072,1026]{1,0} collective-permute(...)
        # XLA's combiner can fuse several all-reduces into ONE tuple-
        # result op: (f32[], f32[], f32[2]) all-reduce(...) — sum the
        # bytes of EVERY tuple element, not just the last shape token
        for m in re.finditer(
            rf"((?:\(?[^=\n]*?)?) {op}\(", hlo_text
        ):
            lhs = m.group(1)
            shapes = re.findall(r"(\w+)\[([\d,]*)\]", lhs)
            if not shapes:
                continue
            for dt, shape in shapes:
                elems = 1
                if shape:
                    for s in shape.split(","):
                        elems *= int(s)
                total += elems * dtype_bytes.get(dt, 4)
            count += 1
        if count:
            out[op] = {"count": count, "bytes": total}
    return out


def measure_collectives(n_devices: int, m_per_dev: int, d: int, kind: str):
    """Compile the sharded solve on a CPU mesh; return its collective
    inventory from the optimized HLO."""
    import jax
    import jax.numpy as jnp

    from plssvm_tpu.parallel.sharded import (
        build_sharded_solver,
        make_row_mesh,
        shard_arrays,
    )
    from plssvm_tpu.parameter import KernelFunctionType

    devs = jax.devices("cpu")[:n_devices]
    mesh = make_row_mesh(devs)
    dtype = np.float32
    m_pad = n_devices * m_per_dev
    X = np.zeros((m_pad, d), dtype)
    y = np.ones(m_pad, dtype)
    mask = np.ones(m_pad, dtype)
    args = shard_arrays(mesh, X, X[0], y, 1.0, mask, dtype)
    scal = (
        jnp.asarray(0.01, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(1e-3, dtype),
        jnp.asarray(2, jnp.int32),
    )
    solver = build_sharded_solver(
        mesh, kind=KernelFunctionType[kind.upper()], degree=3, impl="xla"
    )
    compiled = jax.jit(solver).lower(*args, *scal).compile()
    hlo = compiled.as_text()
    return count_collectives(hlo)


def ring_model(P: int, n: int, d: int, tflops=MEASURED_TFLOPS,
               ici=V5E_ICI_BYTES_PER_S) -> dict:
    """Analytic per-CG-iteration time model for the symmetric ring.

    Compute: the symmetric walk does ~half the full 2 n^2 d Gram FLOPs,
    split evenly across P chips; the measured single-chip rate already
    reflects the symmetric saving (it is quoted in full-matrix FLOPs), so
    per-chip compute time = (2 n^2 d / tflops) / P.

    Communication: floor(P/2) sequential ring hops per matvec; each hop
    forwards this chip's (n/P, d) row block + its squared norms + its v
    slice = (n/P)(d + 2) * 4 bytes, nearest-neighbour over ICI (both
    directions of the ring are active, so the per-link traffic is one
    hop's bytes).  The transposed contributions ride floor((P-1)/2)
    ppermutes of (n/P) * 4 bytes (small).  CG scalar psums are O(P)
    latency-bound and amortize to ~microseconds.

    XLA overlaps each hop's transfer with the previous block's compute;
    both the overlapped (max) and serialized (sum) estimates are reported
    — the truth lies between.
    """
    compute_s = (2.0 * n * n * d / (tflops * 1e12)) / P
    hop_bytes = (n / P) * (d + 2) * 4
    hops = P // 2
    back_bytes = ((P - 1) // 2) * (n / P) * 4
    comm_s = (hops * hop_bytes + back_bytes) / ici
    overlapped = max(compute_s, comm_s)
    serialized = compute_s + comm_s
    t1 = 2.0 * n * n * d / (tflops * 1e12)
    return {
        "chips": P,
        "compute_s_per_iter": round(compute_s, 4),
        "comm_s_per_iter": round(comm_s, 4),
        "projected_s_per_iter_overlapped": round(overlapped, 4),
        "projected_s_per_iter_serialized": round(serialized, 4),
        "scaling_efficiency_overlapped": round(t1 / (P * overlapped), 4),
        "scaling_efficiency_serialized": round(t1 / (P * serialized), 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--m_per_dev", type=int, default=512)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    result = {"collectives_hlo": {}}
    for kind in ("rbf", "linear"):
        result["collectives_hlo"][kind] = measure_collectives(
            args.devices, args.m_per_dev, args.d, kind
        )
    # the north-star config: 1M x 1k RBF
    result["projection_1Mx1k_rbf"] = [
        ring_model(P, 1048576, 1024) for P in (1, 2, 4, 8, 16)
    ]
    result["assumptions"] = {
        "ici_bytes_per_s": V5E_ICI_BYTES_PER_S,
        "measured_single_chip_tflops": MEASURED_TFLOPS,
        "mesh": f"{args.devices} virtual CPU devices "
                f"(m/P={args.m_per_dev}, d={args.d})",
    }
    if args.json:
        print(json.dumps(result, indent=1))
    else:
        for kind, c in result["collectives_hlo"].items():
            print(f"{kind}: {c}")
        for row in result["projection_1Mx1k_rbf"]:
            print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
