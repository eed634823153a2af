"""Microbenchmark: cg_explicit vs cg_implicit per-iteration matvec cost.

Usage: python tools/bench_solver.py [m] [d] [iters] [kernel] [precision]

Times (a) the one-shot explicit kernel-matrix build, (b) the explicit
``K @ v`` iteration, and (c) the implicit kernel matvec (Pallas dual kernel
for Gram kernels on TPU, the symmetric XLA walk for distance kernels) —
the quantities behind CSVM's solver='automatic' crossover rule
(csvm.py::_use_explicit_solver).  Runs on the default device.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from plssvm_tpu.kernel_functions import is_gram_kernel
from plssvm_tpu.ops.matvec import distance_kernel_matvec_sym, kernel_matvec_xla
from plssvm_tpu.parameter import KernelFunctionType
from plssvm_tpu.solver.explicit import build_kernel_matrix


def bench_loop(fn, args, iters, reps=2):
    @jax.jit
    def run(*args):
        def body(_, vv):
            out = fn(*args[:-1], vv)
            return out / jnp.linalg.norm(out)
        return jax.lax.fori_loop(0, iters, body, args[-1])

    # time through device_get of one element: on the tunneled axon runtime
    # block_until_ready can return before the computation finishes (measured:
    # a 400 ms loop "completing" in 0.1 ms); fetching a result value cannot
    jax.device_get(run(*args)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run(*args)[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    kind = KernelFunctionType.from_string(
        sys.argv[4] if len(sys.argv) > 4 else "rbf"
    )
    precision = sys.argv[5] if len(sys.argv) > 5 else "f32"

    rng = np.random.default_rng(0)
    Xh = rng.normal(size=(m, d)).astype(np.float32)
    if kind == KernelFunctionType.CHI_SQUARED:
        Xh = np.abs(Xh)
    X = jnp.asarray(Xh)
    sq = jnp.sum(X * X, axis=-1)
    v0 = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
    gamma = jnp.float32(1.0 / d)
    coef0 = jnp.float32(0.0)
    flops = 2.0 * m * m * d

    # one-shot build (timed separately — it amortizes over all iterations)
    t0 = time.perf_counter()
    K = build_kernel_matrix(
        X, gamma, coef0, kind=kind, degree=3, precision=precision
    )
    K.block_until_ready()
    build_s = time.perf_counter() - t0
    kb = m * m * K.dtype.itemsize
    print(f"K build ({K.dtype}, {kb / 1e9:.1f} GB): {build_s:.2f} s", flush=True)

    t_exp = bench_loop(
        lambda K_, v: jax.lax.dot_general(
            K_, v.astype(K_.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        (K, v0), iters,
    )
    print(
        f"explicit K@v : {t_exp * 1e3:7.2f} ms/iter "
        f"({kb / t_exp / 1e9:6.0f} GB/s, {flops / t_exp / 1e12:6.1f} "
        f"implicit-equivalent TFLOP/s)", flush=True,
    )

    if is_gram_kernel(kind):
        from plssvm_tpu.ops.pallas_matvec import kernel_matvec_pallas_big

        if jax.devices()[0].platform in ("tpu", "axon"):
            t_imp = bench_loop(
                lambda X_, sq_, v: kernel_matvec_pallas_big(
                    X_, sq_, v, kind=kind, gamma=gamma, coef0=coef0, degree=3,
                    precision=precision if precision != "bf16" else "f32",
                ),
                (X, sq, v0), iters,
            )
            name = "implicit dual"
        else:
            t_imp = bench_loop(
                lambda X_, sq_, v: kernel_matvec_xla(
                    X_, sq_, v, kind=kind, gamma=gamma, coef0=coef0, degree=3,
                    row_block=2048,
                ),
                (X, sq, v0), iters,
            )
            name = "implicit xla"
    else:
        t_imp = bench_loop(
            lambda X_, sq_, v: distance_kernel_matvec_sym(
                X_, v, gamma, kind=kind, row_block=256
            ),
            (X, sq, v0), max(iters // 8, 2),
        )
        name = "implicit sym"
    print(
        f"{name:13s}: {t_imp * 1e3:7.2f} ms/iter "
        f"({flops / t_imp / 1e12:6.1f} TFLOP/s)", flush=True,
    )
    print(
        f"speedup {t_imp / t_exp:.2f}x/iter; build amortizes over "
        f"{build_s / max(t_imp - t_exp, 1e-9):.1f} iterations", flush=True,
    )


if __name__ == "__main__":
    main()
