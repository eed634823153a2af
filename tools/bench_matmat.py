"""Microbenchmark: multiclass block kernel-matmat ``K @ V`` across impls.

One-vs-all block CG contracts each Gram block with C right-hand sides
(solver/cg.py::cg_ls_svm_multi_core); this measures the two implementations:
- xla:    shared-Gram blockwise scan (ops/matvec.py::kernel_matvec_xla)
- pallas: dual-contraction symmetric walk with class-major MXU contractions
          (ops/pallas_matvec.py::kernel_matmat_pallas_big)

TFLOP/s counted in full-matrix Gram FLOPs (2 m^2 d) — the per-iteration
O(n^2 d) cost shared by all C classes; contraction FLOPs (O(m^2 C)) ride
along.  Usage: python tools/bench_matmat.py [m] [d] [C] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from plssvm_tpu.ops.matvec import kernel_matvec_xla
from plssvm_tpu.ops.pallas_matvec import kernel_matmat_pallas_big
from plssvm_tpu.parameter import KernelFunctionType


def bench(fn, X, sq, V0, flops, iters, reps=2):
    @jax.jit
    def run(X, sq, V):
        def body(_, vv):
            out = fn(X, sq, vv)
            return out / jnp.linalg.norm(out)
        return jax.lax.fori_loop(0, iters, body, V)

    # time through device_get (tools/_bench_util): block_until_ready can
    # return early on the tunneled runtime and fabricate TFLOP/s numbers
    from _bench_util import timed_best

    best = timed_best(lambda: run(X, sq, V0), lambda out: out[0, 0],
                      reps=reps)
    return flops * iters / best / 1e12


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    kind = KernelFunctionType.RBF
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    V0 = jnp.asarray(rng.normal(size=(m, C)).astype(np.float32))
    sq = jnp.sum(X * X, axis=-1)
    gamma = jnp.float32(1.0 / d)
    coef0 = jnp.float32(0.0)

    flops = 2 * m * m * d + 8 * m * m

    variants = {
        "xla_rb1024": lambda X, sq, V: kernel_matvec_xla(
            X, sq, V, kind=kind, gamma=gamma, coef0=coef0, degree=3,
            row_block=1024),
        "pallas_dual": lambda X, sq, V: kernel_matmat_pallas_big(
            X, sq, V, kind=kind, gamma=gamma, coef0=coef0, degree=3),
    }
    only = sys.argv[5].split(",") if len(sys.argv) > 5 else None
    if only:
        variants = {k: v for k, v in variants.items() if k in only}

    ref = refn = None
    if m <= 16384:
        Xn = np.asarray(X, np.float64)
        sqn = (Xn * Xn).sum(1)
        K = np.exp(-float(gamma) * (sqn[:, None] + sqn[None, :] - 2 * Xn @ Xn.T))
        ref = K @ np.asarray(V0, np.float64)
        refn = np.linalg.norm(ref)

    for name, fn in variants.items():
        if ref is not None:
            got = np.asarray(jax.device_get(fn(X, sq, V0)), np.float64)
            rel = f"rel_err={np.linalg.norm(got - ref) / refn:.2e}"
        else:
            rel = "rel_err=skipped (m too large for the dense golden)"
        t = bench(fn, X, sq, V0, flops, iters)
        print(f"{name:12s}  {t:7.2f} TFLOP/s (Gram)   {rel}", flush=True)


if __name__ == "__main__":
    main()
