"""Microbenchmark: kernel-matvec implementations across shapes/precisions.

Usage: python tools/bench_matvec.py [m] [d] [iters] [only] [kernel]
``kernel`` is any KernelFunctionType name (default rbf).  Gram kernels
(rbf/polynomial/sigmoid) run the XLA + Pallas variants; distance kernels
(laplacian/chi_squared) run the blockwise scan vs the symmetric
block-pair walk (both VPU-bound by nature — TOPS, not MXU TFLOP/s).
Runs on the default device (the TPU under axon).  Use a large iteration
count: the tunneled chip has ~40-60 ms fixed dispatch latency per jitted
call, which must be amortized for a true device-side throughput number.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from plssvm_tpu.kernel_functions import is_gram_kernel
from plssvm_tpu.ops.matvec import distance_kernel_matvec_sym, kernel_matvec_xla
from plssvm_tpu.ops.pallas_matvec import (
    kernel_matvec_pallas,
    kernel_matvec_pallas_big,
    kernel_matvec_pallas_rect,
)
from plssvm_tpu.parameter import KernelFunctionType


def bench(fn, X, sq, v0, flops, iters, reps=2):
    # X/sq are jit ARGUMENTS: closing over them would embed hundreds of MB
    # of constants in the HLO (the tunneled compiler rejects >some size)
    @jax.jit
    def run(X, sq, v):
        def body(_, vv):
            out = fn(X, sq, vv)
            return out / jnp.linalg.norm(out)
        return jax.lax.fori_loop(0, iters, body, v)

    # time through device_get of one element: block_until_ready can return
    # before the computation finishes on the tunneled runtime (see
    # tools/bench_solver.py::bench_loop)
    jax.device_get(run(X, sq, v0)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run(X, sq, v0)[0])
        best = min(best, time.perf_counter() - t0)
    return flops * iters / best / 1e12


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    kind = KernelFunctionType.from_string(
        sys.argv[5] if len(sys.argv) > 5 else "rbf"
    )
    rng = np.random.default_rng(0)
    Xh = rng.normal(size=(m, d)).astype(np.float32)
    if kind == KernelFunctionType.CHI_SQUARED:
        Xh = np.abs(Xh)
    X = jnp.asarray(Xh)
    v0 = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
    sq = jnp.sum(X * X, axis=-1)
    gamma = jnp.float32(1.0 / d)
    coef0 = jnp.float32(0.0)

    flops = 2 * m * m * d + 8 * m * m

    if not is_gram_kernel(kind):
        variants = {
            "xla_scan_rb256": lambda X, sq, v: kernel_matvec_xla(
                X, sq, v, kind=kind, gamma=gamma, coef0=coef0, degree=3,
                row_block=256),
            "sym_walk_rb256": lambda X, sq, v: distance_kernel_matvec_sym(
                X, v, gamma, kind=kind, row_block=256),
            "sym_walk_rb512": lambda X, sq, v: distance_kernel_matvec_sym(
                X, v, gamma, kind=kind, row_block=512),
        }
    else:
        variants = {
        "xla_rb2048": lambda X, sq, v: kernel_matvec_xla(
            X, sq, v, kind=kind, gamma=gamma, coef0=coef0, degree=3, row_block=2048),
        "pallas_f32": lambda X, sq, v: kernel_matvec_pallas(
            X, sq, v, kind=kind, gamma=gamma, coef0=coef0, degree=3, precision="f32"),
        "pallas_bf16": lambda X, sq, v: kernel_matvec_pallas(
            X, sq, v, kind=kind, gamma=gamma, coef0=coef0, degree=3, precision="bf16"),
        "dual_f32": lambda X, sq, v: kernel_matvec_pallas_big(
            X, sq, v, kind=kind, gamma=gamma, coef0=coef0, degree=3, precision="f32"),
        "dual_bf16": lambda X, sq, v: kernel_matvec_pallas_big(
            X, sq, v, kind=kind, gamma=gamma, coef0=coef0, degree=3, precision="bf16"),
        "dual_hi": lambda X, sq, v: kernel_matvec_pallas_big(
            X, sq, v, kind=kind, gamma=gamma, coef0=coef0, degree=3, precision="highest"),
        # the 2x full walk (every (i, j) tile computed) — the round-1 design
        # the dual kernel replaced; kept benchable for the comparison
        "rect_full": lambda X, sq, v: kernel_matvec_pallas_rect(
            X, X, sq, sq, v, kind=kind, gamma=gamma, coef0=coef0, degree=3,
            symmetric=False),
        }
    only = sys.argv[4].split(",") if len(sys.argv) > 4 and sys.argv[4] != "all" else None
    if only:
        variants = {k: v for k, v in variants.items() if k in only}

    # correctness vs f64 NumPy golden (skipped for m too big to materialize)
    ref = refn = None
    if m <= 16384:
        Xn = np.asarray(X, np.float64)
        sqn = (Xn * Xn).sum(1)
        if kind == KernelFunctionType.RBF:
            K = np.exp(-float(gamma) * (sqn[:, None] + sqn[None, :] - 2 * Xn @ Xn.T))
        elif kind == KernelFunctionType.POLYNOMIAL:
            K = (float(gamma) * (Xn @ Xn.T) + float(coef0)) ** 3
        elif kind == KernelFunctionType.SIGMOID:
            K = np.tanh(float(gamma) * (Xn @ Xn.T) + float(coef0))
        elif kind == KernelFunctionType.LAPLACIAN:
            # blockwise: the broadcasted (m, m, d) distance tensor is
            # O(m^2 d) host memory — 128 GiB already at 8192 x 256
            K = np.concatenate([
                np.exp(-float(gamma) * np.abs(
                    Xn[i:i + 256, None, :] - Xn[None, :, :]).sum(-1))
                for i in range(0, m, 256)
            ])
        else:  # chi-squared (data made non-negative below for this kind)
            blocks = []
            for i in range(0, m, 256):
                den = Xn[i:i + 256, None, :] + Xn[None, :, :]
                num = (Xn[i:i + 256, None, :] - Xn[None, :, :]) ** 2
                blocks.append(np.exp(-float(gamma) * np.where(
                    den != 0, num / np.where(den != 0, den, 1), 0).sum(-1)))
            K = np.concatenate(blocks)
        ref = K @ np.asarray(v0, np.float64)
        refn = np.linalg.norm(ref)

    for name, fn in variants.items():
        if ref is not None:
            got = np.asarray(jax.device_get(fn(X, sq, v0)), np.float64)
            rel = f"rel_err={np.linalg.norm(got - ref) / refn:.2e}"
        else:
            rel = "rel_err=skipped (m too large for the dense golden)"
        t = bench(fn, X, sq, v0, flops, iters)
        print(f"{name:12s}  {t:7.2f} TFLOP/s   {rel}", flush=True)


if __name__ == "__main__":
    main()
