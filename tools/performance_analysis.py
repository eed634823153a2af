#!/usr/bin/env python3
"""Performance sweep: fit over (n, d) with a timeout, YAML tracking output.

Equivalent of the reference's utility_scripts/performance_analysis.py:26-50 —
generate a synthetic data set, repeat `CSVM.fit` with a 600 s timeout, append
the performance-tracker YAML document per run.  IO timings are captured by
round-tripping an intermediate LIBSVM file, as the reference does.

Usage:
  python tools/performance_analysis.py --num_data_points 10000 \
      --num_features 200 --num_repeats 3 [--kernel rbf] \
      [--performance_tracking tracking.yaml]
"""

from __future__ import annotations

import argparse
import signal
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import plssvm_tpu as p
from plssvm_tpu.utils.tracker import add_tracking_entry, global_tracker


class CGTimeout(Exception):
    """Raised when a single fit exceeds the timeout (reference: 600 s)."""


def fit_with_timeout(svm, data, eps, seconds):
    def handler(signum, frame):
        raise CGTimeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        return svm.fit(data, epsilon=eps)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def make_classification(n, d, seed):
    """Two overlapping Gaussian blobs — keeps CG non-trivial."""
    rng = np.random.default_rng(seed)
    half = n // 2
    X = np.concatenate([
        rng.normal(-0.3, 1.0, size=(half, d)),
        rng.normal(+0.3, 1.0, size=(n - half, d)),
    ]).astype(np.float64)
    y = np.concatenate([-np.ones(half), np.ones(n - half)]).astype(np.int64)
    perm = rng.permutation(n)
    return X[perm], y[perm]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_data_points", required=True, type=int)
    parser.add_argument("--num_features", required=True, type=int)
    parser.add_argument("--num_repeats", required=True, type=int)
    parser.add_argument("--kernel", default="rbf",
                        choices=["linear", "polynomial", "rbf"])
    parser.add_argument("--epsilon", default=1e-3, type=float)
    parser.add_argument("--timeout", default=600, type=int,
                        help="per-fit timeout in seconds")
    parser.add_argument("--performance_tracking", default="tracking.yaml")
    parser.add_argument("--intermediate_train_file", default="train_data.libsvm")
    args = parser.parse_args()

    n, d = args.num_data_points, args.num_features
    print(f"Generating data set {n}x{d}")
    X, y = make_classification(n, d, seed=0)

    # round-trip an intermediate file so IO timings are tracked too
    p.DataSet(X, y).save(args.intermediate_train_file)

    for repeat in range(args.num_repeats):
        add_tracking_entry("parameter", "task", "train")
        add_tracking_entry("parameter", "kernel", args.kernel)
        add_tracking_entry("parameter", "repeat", repeat)
        data = p.DataSet(args.intermediate_train_file)
        svm = p.CSVM(kernel_type=args.kernel)
        start = time.perf_counter()
        try:
            fit_with_timeout(svm, data, args.epsilon, args.timeout)
        except CGTimeout:
            print(f"repeat {repeat}: fit timed out after {args.timeout}s",
                  file=sys.stderr)
            add_tracking_entry("cg", "timeout", True)
        add_tracking_entry(
            "", "total_time", (time.perf_counter() - start) * 1000.0
        )
        global_tracker.save(args.performance_tracking)
        print(f"repeat {repeat}: done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
