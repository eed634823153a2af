#!/usr/bin/env python3
"""Kernel-matvec scaling-efficiency sweep over mesh sizes.

Measures CG iterations/second of the row-sharded solve at increasing device
counts and reports scaling efficiency vs the single-device run — the
BASELINE.md target is >= 80 % from 1 host to 2+ hosts on a 1M x 1k RBF
problem.  On this machine (1 TPU chip / N virtual CPU devices) it validates
the machinery and measures virtual-device overhead; on a real pod slice the
same script measures true ICI/DCN scaling.

Usage:
  python tools/scaling_sweep.py [--n 32768] [--d 256] [--iters 25]
      [--devices cpu|default] [--mesh-sizes 1,2,4,8]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _main_multihost(args) -> int:
    """Multi-process sweep leg: the process group comes up FIRST (the
    ordering rule initialize_distributed enforces), the solve row-shards
    over the GLOBAL mesh with per-process local blocks, and efficiency is
    reported vs a 1-local-device baseline.  On a pod this measures true
    ICI/DCN scaling (BASELINE.md's >=80% line); under the 2-process CPU
    harness (tests/test_multiprocess.py) it rehearses the exact script a
    pod run would use."""
    from plssvm_tpu.parallel.multihost import (
        global_row_mesh,
        host_row_range,
        initialize_distributed,
        shard_arrays_multihost,
    )

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax
    import jax.numpy as jnp

    from plssvm_tpu.parallel.sharded import build_sharded_solver
    from plssvm_tpu.parameter import KernelFunctionType
    from plssvm_tpu.solver.cg import solve_ls_svm

    kind = KernelFunctionType.from_string(args.kernel)
    dtype = np.float32
    n, d = args.n, args.d
    # identical seed on every host -> identical global data, no file IO
    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, d)).astype(dtype)
    y = np.where(X[:, 0] > 0, 1.0, -1.0).astype(dtype)
    gamma = dtype(1.0 / d)
    dept = n - 1
    ndev = len(jax.devices())
    is_p0 = jax.process_index() == 0

    def pad(rows_multiple):
        m_pad = (
            (dept + rows_multiple - 1) // rows_multiple
        ) * rows_multiple
        Xp = np.zeros((m_pad, d), dtype)
        Xp[:dept] = X[:dept]
        yp = np.zeros((m_pad,), dtype)
        yp[:dept] = y[:dept]
        mask = np.zeros((m_pad,), dtype)
        mask[:dept] = 1.0
        return Xp, yp, mask

    scalars = (
        jnp.asarray(gamma), jnp.asarray(dtype(0.0)),
        jnp.asarray(dtype(1.0)),
        jnp.asarray(dtype(1e-20)),  # never converge: run exactly --iters
        jnp.asarray(args.iters, jnp.int32),
    )

    def timed(run):
        # honest timing: fetch a replicated result scalar inside the
        # timed region (block_until_ready can lie on tunneled runtimes)
        float(jax.device_get(run().delta))  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(jax.device_get(run().delta))
            best = min(best, time.perf_counter() - t0)
        return args.iters / best

    # 1-local-device baseline (what one chip of this job does alone)
    Xp, yp, mask = pad(128)
    with jax.default_device(jax.local_devices()[0]):
        base_rate = timed(
            lambda: solve_ls_svm(
                jnp.asarray(Xp), jnp.asarray(X[-1]), jnp.asarray(yp),
                jnp.asarray(y[-1]), jnp.asarray(mask), *scalars,
                kind=kind, degree=3, impl="xla",
            )
        )

    # global-mesh run: each process places ONLY its local row block
    mesh = global_row_mesh()
    Xp, yp, mask = pad(max(ndev * 128, 128))
    begin, end = host_row_range(Xp.shape[0])
    sharded = shard_arrays_multihost(
        mesh, Xp[begin:end], X[-1], yp[begin:end], y[-1],
        mask[begin:end], dtype,
    )
    solver = build_sharded_solver(mesh, kind=kind, degree=3)
    rate = timed(lambda: solver(*sharded, *scalars))
    eff = rate / (base_rate * ndev) * 100.0

    if is_p0:
        print(
            f"processes={jax.process_count()}  devices={ndev:3d}  "
            f"baseline {base_rate:8.2f} CG it/s/device  "
            f"global {rate:8.2f} CG it/s  scaling efficiency {eff:6.1f}%",
            flush=True,
        )
        if args.performance_tracking:
            from plssvm_tpu.utils.tracker import (
                add_tracking_entry, global_tracker,
            )

            add_tracking_entry("scaling", "num_processes",
                               jax.process_count())
            add_tracking_entry("scaling", "num_devices", ndev)
            add_tracking_entry("scaling", "baseline_cg_iterations_per_second",
                               base_rate)
            add_tracking_entry("scaling", "cg_iterations_per_second", rate)
            add_tracking_entry("scaling", "efficiency_percent", eff)
            add_tracking_entry("parameter", "num_data_points", n)
            add_tracking_entry("parameter", "num_features", d)
            add_tracking_entry("parameter", "kernel_type", args.kernel)
            global_tracker.save(args.performance_tracking)
    return 0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=32768)
    parser.add_argument("--d", type=int, default=256)
    parser.add_argument("--iters", type=int, default=25,
                        help="CG iterations to run per mesh size")
    parser.add_argument("--devices", default="default",
                        choices=["cpu", "default"])
    parser.add_argument("--mesh-sizes", default=None,
                        help="comma-separated device counts (default: 1,2,4,..,max)")
    parser.add_argument("--kernel", default="rbf")
    parser.add_argument(
        "--performance_tracking", metavar="FILE", default=None,
        help="append the sweep results to FILE in the tracker YAML schema "
        "(one document per run, categories scaling/parameter)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="multi-process mode for pod slices: every process in the "
        "jax.distributed job runs this script; the solve row-shards over "
        "the GLOBAL mesh (each process places only its local row block) "
        "and efficiency is measured vs a 1-local-device baseline. On a "
        "pod the job env configures the process group automatically; for "
        "a manual/CPU rehearsal pass --coordinator/--num-processes/"
        "--process-id (see tests/test_multiprocess.py)",
    )
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (multihost only)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    if args.multihost:
        return _main_multihost(args)

    import jax
    import jax.numpy as jnp

    from plssvm_tpu.parallel.sharded import (
        build_sharded_solver, make_row_mesh, shard_arrays,
    )
    from plssvm_tpu.parameter import KernelFunctionType
    from plssvm_tpu.solver.cg import solve_ls_svm

    devices = jax.devices("cpu") if args.devices == "cpu" else jax.devices()
    if args.mesh_sizes:
        sizes = [int(s) for s in args.mesh_sizes.split(",")]
    else:
        sizes = []
        k = 1
        while k <= len(devices):
            sizes.append(k)
            k *= 2
    kind = KernelFunctionType.from_string(args.kernel)
    dtype = np.float32

    n, d = args.n, args.d
    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, d)).astype(dtype)
    y = np.where(X[:, 0] > 0, 1.0, -1.0).astype(dtype)
    gamma = dtype(1.0 / d)

    def pad(rows_multiple):
        dept = n - 1
        m_pad = ((dept + rows_multiple - 1) // rows_multiple) * rows_multiple
        Xp = np.zeros((m_pad, d), dtype)
        Xp[:dept] = X[:dept]
        yp = np.zeros((m_pad,), dtype)
        yp[:dept] = y[:dept]
        mask = np.zeros((m_pad,), dtype)
        mask[:dept] = 1.0
        return Xp, yp, mask

    base_per_dev = None
    for ndev in sizes:
        Xp, yp, mask = pad(max(ndev * 128, 128))
        scalars = (
            jnp.asarray(gamma), jnp.asarray(dtype(0.0)), jnp.asarray(dtype(1.0)),
            jnp.asarray(dtype(1e-20)),  # never converge: run exactly --iters
            jnp.asarray(args.iters, jnp.int32),
        )
        if ndev == 1:
            def run():
                # pin to the sweep's device pool so the 1-device baseline is
                # comparable (otherwise it runs on the default device, which
                # may be a different platform than the mesh)
                with jax.default_device(devices[0]):
                    return solve_ls_svm(
                        jnp.asarray(Xp), jnp.asarray(X[-1]), jnp.asarray(yp),
                        jnp.asarray(y[-1]), jnp.asarray(mask), *scalars,
                        kind=kind, degree=3, impl="xla",
                    )
        else:
            mesh = make_row_mesh(devices[:ndev])
            solver = build_sharded_solver(mesh, kind=kind, degree=3)
            sharded = shard_arrays(mesh, Xp, X[-1], yp, y[-1], mask, dtype)
            run = lambda: solver(*sharded, *scalars)

        # time through device_get of the replicated residual scalar —
        # block_until_ready can return early on tunneled runtimes
        # (tools/_bench_util; the multihost leg above already does this)
        float(jax.device_get(run().delta))  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(jax.device_get(run().delta))
            best = min(best, time.perf_counter() - t0)
        rate = args.iters / best
        if base_per_dev is None:
            # normalize by the FIRST rung's device count so a
            # --mesh-sizes list not starting at 1 still reports
            # efficiency vs the per-device baseline
            base_per_dev = rate / ndev
        eff = rate / (base_per_dev * ndev) * 100.0
        print(
            f"devices={ndev:3d}  {rate:8.2f} CG it/s  "
            f"scaling efficiency {eff:6.1f}%",
            flush=True,
        )
        if args.performance_tracking:
            from plssvm_tpu.utils.tracker import add_tracking_entry

            add_tracking_entry("scaling", "num_devices", ndev)
            add_tracking_entry("scaling", "cg_iterations_per_second", rate)
            add_tracking_entry("scaling", "efficiency_percent", eff)

    if args.performance_tracking:
        from plssvm_tpu.utils.tracker import (
            add_tracking_entry, global_tracker,
        )

        add_tracking_entry("parameter", "num_data_points", n)
        add_tracking_entry("parameter", "num_features", d)
        add_tracking_entry("parameter", "kernel_type", args.kernel)
        global_tracker.save(args.performance_tracking)
    return 0


if __name__ == "__main__":
    sys.exit(main())
