#!/usr/bin/env python3
"""Run the BASELINE.json config ladder and report one JSON line per config.

Configs (BASELINE.md / BASELINE.json):
  1. tiny LIBSVM linear train+predict (CPU-runnable correctness rung)
  2. RBF on 10k x 200: train + predict accuracy
  3. polynomial + plssvm-scale pipeline on 50k x 500
  4. RBF on 200k x 1k (single chip; the multi-chip variant needs a pod)

Each rung prints: {"config": ..., "train_s": ..., "iters": ..., "it_per_s":
..., "accuracy": ...}.  Sizes can be scaled down with --scale for smoke runs.

Usage: python tools/baseline_ladder.py [--scale 1.0] [--configs 1,2,3,4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import plssvm_tpu as p
from plssvm_tpu.utils.tracker import global_tracker


def clusters(n, d, k=32, sigma=0.4, seed=0, dtype=np.float32):
    """Multi-cluster data: the kernel matrix gets a decaying spectrum, so CG
    needs a meaningful number of iterations (plain blobs give identity +
    rank-1 and converge in 1-2 steps)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d))
    assignment = rng.integers(0, k, size=n)
    # generate noise directly in the target dtype: an f64 intermediate is an
    # extra 8 GiB of memory traffic at the 1M x 1k rung
    X = centers[assignment].astype(dtype)
    X += sigma * rng.standard_normal((n, d), dtype=dtype)
    y = np.where(assignment % 2 == 0, 1.0, -1.0)
    return X, y


def run_config(name, svm, data, epsilon, max_iter=None):
    # warm the compile cache with a 1-iteration fit on identical shapes
    svm.fit(data, epsilon=epsilon, max_iter=1)
    global_tracker.clear()
    t0 = time.perf_counter()
    model = svm.fit(data, epsilon=epsilon, max_iter=max_iter)
    train_s = time.perf_counter() - t0
    acc = svm.score(model)
    iters = model.n_iter or 0
    print(json.dumps({
        "config": name,
        "train_s": round(train_s, 3),
        "iters": iters,
        "it_per_s": round(iters / train_s, 2) if train_s else None,
        "accuracy": round(float(acc), 4),
    }), flush=True)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=float, default=1.0,
                        help="scale factor on dataset sizes (0.1 = smoke run)")
    parser.add_argument("--configs", default="1,2,3,4")
    args = parser.parse_args()
    wanted = {int(c) for c in args.configs.split(",")}
    s = args.scale
    p.set_verbosity("quiet")

    if 1 in wanted:
        import os
        tiny = "/root/reference/tests/data/libsvm/5x4.libsvm"
        if os.path.isfile(tiny):
            data = p.DataSet(tiny, dtype=np.float64)
            svm = p.CSVM(target="cpu", dtype=np.float64)
            model = svm.fit(data, epsilon=1e-3)
            print(json.dumps({
                "config": "tiny-linear", "rho": model.rho,
                "accuracy": svm.score(model),
            }), flush=True)

    if 2 in wanted:
        n, d = int(10240 * s), 200
        X, y = clusters(n, d, seed=1)
        run_config(
            f"rbf-{n}x{d}",
            p.CSVM(kernel_type="rbf", cost=100.0, gamma=0.5 / d),
            p.DataSet(X, y),
            epsilon=1e-6, max_iter=500,
        )

    if 3 in wanted:
        n, d = int(51200 * s), 500
        X, y = clusters(n, d, seed=2)
        # scale pipeline: like plssvm-scale -l -1 -u 1 before training
        data = p.DataSet(X, y, scaling=(-1.0, 1.0))
        run_config(
            f"poly-scaled-{n}x{d}",
            p.CSVM(kernel_type="polynomial", degree=3, coef0=1.0, cost=100.0),
            data, epsilon=1e-6, max_iter=300,
        )

    if 4 in wanted:
        n, d = int(204800 * s), 1024
        X, y = clusters(n, d, k=64, seed=3)
        run_config(
            f"rbf-{n}x{d}",
            p.CSVM(kernel_type="rbf", cost=100.0, gamma=0.5 / d),
            p.DataSet(X, y),
            epsilon=1e-6, max_iter=100,
        )

    if 5 in wanted:
        # the 1M x 1k north-star config on ONE chip (the full config is
        # multi-host; this measures the per-chip CG iteration rate at scale).
        # The solve is segmented via CG-state checkpointing: a single
        # multi-minute device call trips the tunneled runtime's watchdog and
        # kills the worker, so each device call covers a few iterations.
        import os
        import tempfile

        n, d = int(1048576 * s), 1024
        X, y = clusters(n, d, k=64, seed=4)
        data = p.DataSet(X, y)
        svm = p.CSVM(kernel_type="rbf", cost=100.0, gamma=0.5 / d)
        ckpt = os.path.join(tempfile.mkdtemp(), "cfg5.ckpt")
        # warm-up: compile + transfer, AND compile the resume executable the
        # segmented solve uses from the 2nd segment on (5 iters @ interval 4
        # runs one resume segment)
        svm.fit(
            data, epsilon=1e-6, max_iter=5,
            checkpoint_path=ckpt, checkpoint_interval=4,
        )
        t0 = time.perf_counter()
        model = svm.fit(
            data, epsilon=1e-6, max_iter=8,
            checkpoint_path=ckpt, checkpoint_interval=4,
        )
        train_s = time.perf_counter() - t0
        iters = model.n_iter or 0
        print(json.dumps({
            "config": f"rbf-{n}x{d}-singlechip",
            "train_s": round(train_s, 1),
            "iters": iters,
            "s_per_iter": round(train_s / max(iters, 1), 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
