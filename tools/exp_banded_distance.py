#!/usr/bin/env python3
"""EXPERIMENT: roll-banded laplacian matvec for narrow feature counts.

The fused distance walk (ops/pallas_distance.py) puts features on lanes,
so every (row-group, col-tile) partial ends in a cross-lane reduction —
~7 shift-adds per 128-lane register.  At d = 512 that cost amortizes over
4 payload registers (3.5x over XLA); at d = 128 it dominates (1.08x).

This prototype flips the layout: operands arrive TRANSPOSED (d, m) so
ROWS sit on lanes and features on sublanes.  dist(i, (i+r) mod t) for all
i of a 128-lane tile is ONE lane-wise band:

    band_r = sum_sublanes |XT_I - roll(XT_J, -r)|        # (1, 128)

and the matvec contractions stay lane-wise too:

    out_r[i] += exp(-g band_r[i]) * v_J[(i+r) % t]       # rolled v
    out_c[(i+r) % t] += exp(-g band_r[i]) * v_I[i]       # roll back

No cross-lane reduction anywhere — the only reduction is over sublanes
(features), which folds in log2(8) + vreg-combine adds.

Usage: python tools/exp_banded_distance.py [--m 32768] [--d 128]
       [--interpret] (CPU correctness check)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # band tile: one lane register of rows


def _banded_kernel(
    gamma_ref,                 # SMEM (1, 1)
    xtI_ref,                   # VMEM (d, T) transposed row tile
    xtJ_ref,                   # VMEM (d, T) transposed col tile
    vJ_ref, vI_ref,            # VMEM (1, T)
    outr_ref,                  # VMEM (1, T) block i
    outc_ref,                  # VMEM (ntj, T) resident col accumulator
    *, symmetric,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)

    @pl.when(j == 0)
    def _():
        outr_ref[:] = jnp.zeros_like(outr_ref)

    def compute():
        gamma = gamma_ref[0, 0]
        xtI = xtI_ref[:]
        xtJ = xtJ_ref[:]
        vJ = vJ_ref[:]
        vI = vI_ref[:]

        def body(r, carry):
            # incremental STATIC rolls: the band index advances by one
            # lane per iteration, so every rotate is a fixed shift of 1
            acc_r, acc_cr, rolledX, rv = carry
            band = jnp.sum(jnp.abs(xtI - rolledX), axis=0, keepdims=True)
            k = jnp.exp(-gamma * band)              # (1, T)
            acc_r = acc_r + k * rv
            # accumulate the column part in the ROLLED frame (lane i holds
            # the pair (i, i+r)); roll the accumulator back by one each
            # step so after T steps everything lands at its j lane
            acc_cr = pltpu.roll(acc_cr + k * vI, _T - 1, 1)
            rolledX = pltpu.roll(rolledX, _T - 1, 1)
            rv = pltpu.roll(rv, _T - 1, 1)
            return acc_r, acc_cr, rolledX, rv

        zero = jnp.zeros((1, _T), dtype=outr_ref.dtype)
        acc_r, acc_c, _, _ = jax.lax.fori_loop(
            0, _T, body, (zero, zero, xtJ, vJ)
        )
        outr_ref[:] = outr_ref[:] + acc_r
        if symmetric:
            acc_c = jnp.where(j > i, acc_c, jnp.zeros_like(acc_c))
        outc_ref[pl.ds(j, 1), :] = outc_ref[pl.ds(j, 1), :] + acc_c

    if symmetric:
        @pl.when(j >= i)
        def _():
            compute()
    else:
        compute()


@functools.partial(jax.jit, static_argnames=("symmetric", "interpret"))
def banded_matvec(XT, v, gamma, *, symmetric=True, interpret=False):
    """(K @ v as row+col parts) for laplacian via the banded walk.

    XT: (d, m) transposed operand, m % 128 == 0, d % 8 == 0.
    Returns (out_r, out_c); full K @ v = out_r + out_c when symmetric.
    """
    d, m = XT.shape
    nt = m // _T
    grid = (nt, nt)
    out_r, out_c = pl.pallas_call(
        functools.partial(_banded_kernel, symmetric=symmetric),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d, _T), lambda i, j: (0, i)),
            pl.BlockSpec((d, _T), lambda i, j: (0, j)),
            pl.BlockSpec((1, _T), lambda i, j: (0, j)),
            pl.BlockSpec((1, _T), lambda i, j: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, _T), lambda i, j: (0, i)),
            pl.BlockSpec((nt, _T), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, m), XT.dtype),
            jax.ShapeDtypeStruct((nt, _T), XT.dtype),
        ],
        interpret=interpret,
    )(
        jnp.asarray(gamma, XT.dtype).reshape(1, 1),
        XT, XT, v.reshape(1, m), v.reshape(1, m),
    )
    return out_r.reshape(m), out_c.reshape(m)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32768)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    m, d = args.m, args.d
    rng = np.random.default_rng(0)

    if args.interpret:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        m = min(m, 512)
        X = np.abs(rng.normal(size=(m, d))).astype(np.float32)
        v = rng.normal(size=(m,)).astype(np.float32)
        gamma = np.float32(1.0 / d)
        out_r, out_c = banded_matvec(
            jnp.asarray(X.T), jnp.asarray(v), gamma, interpret=True
        )
        got = np.asarray(out_r) + np.asarray(out_c)
        D = np.abs(X[:, None, :] - X[None, :, :]).sum(-1)
        want = np.exp(-float(gamma) * D) @ v
        err = np.max(np.abs(got - want)) / np.max(np.abs(want))
        print(f"interpret check m={m} d={d}: rel err {err:.3e}")
        return 0 if err < 1e-4 else 1

    X = np.abs(rng.normal(size=(m, d))).astype(np.float32)
    v0 = rng.normal(size=(m,)).astype(np.float32)
    gamma = np.float32(1.0 / d)
    XT = jnp.asarray(np.ascontiguousarray(X.T))

    @jax.jit
    def run(XT, v):
        def body(_, vv):
            r, c = banded_matvec(XT, vv, gamma)
            out = r + c
            return out / jnp.linalg.norm(out)
        return jax.lax.fori_loop(0, args.iters, body, v)

    t0 = time.perf_counter()
    out = run(XT, jnp.asarray(v0))
    _ = jax.device_get(out[0])
    print(f"compile+first {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = run(XT, jnp.asarray(v0))
    _ = jax.device_get(out[0])
    dt = (time.perf_counter() - t0) / args.iters
    tops = 3.0 * m * m * d / 2 / dt / 1e12  # symmetric walk op model
    print(f"banded: {dt:.4f} s/matvec, {tops:.2f} TOP/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
