"""Synthetic data set generator.

reference: utility_scripts/generate_data.py:17-60 — creates classification
data sets (blobs / gaussian quantiles / ...) and writes libsvm/arff/csv.
Uses sklearn when available, otherwise a built-in NumPy blobs generator so
the tool works in minimal environments.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..data_set import DataSet


def make_blobs_numpy(n: int, d: int, seed: int = 0):
    """Two Gaussian blobs, the sklearn-free fallback generator."""
    rng = np.random.default_rng(seed)
    half = n // 2
    X = np.concatenate([
        rng.normal(-2.0, 1.0, size=(half, d)),
        rng.normal(+2.0, 1.0, size=(n - half, d)),
    ])
    y = np.concatenate([-np.ones(half, dtype=np.int64), np.ones(n - half, dtype=np.int64)])
    perm = rng.permutation(n)
    return X[perm], y[perm]


def generate(
    n: int, d: int, *, problem: str = "blobs", seed: int = 0
):
    """Generate (X, y) with labels in {-1, +1}."""
    try:
        from sklearn import datasets  # type: ignore

        if problem == "blobs":
            X, y = datasets.make_blobs(
                n_samples=n, n_features=d, centers=2, random_state=seed
            )
        elif problem == "planes":
            X, y = datasets.make_classification(
                n_samples=n, n_features=d, n_redundant=0, n_classes=2,
                random_state=seed,
            )
        elif problem == "gaussian":
            X, y = datasets.make_gaussian_quantiles(
                n_samples=n, n_features=d, n_classes=2, random_state=seed
            )
        else:
            raise ValueError(f"unknown problem type '{problem}'")
        y = np.where(y == 0, -1, 1)
        return X, y
    except ImportError:
        return make_blobs_numpy(n, d, seed)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="plssvm-generate-data",
        description="generate synthetic classification data sets",
    )
    parser.add_argument("--output", "-o", required=True, help="the output file")
    parser.add_argument("--format", "-f", default="libsvm",
                        choices=["libsvm", "arff"], help="output format")
    parser.add_argument("--problem", default="blobs",
                        choices=["blobs", "planes", "gaussian"])
    parser.add_argument("--samples", "-n", type=int, required=True)
    parser.add_argument("--features", "-d", type=int, required=True)
    parser.add_argument("--seed", type=int, default=0)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    X, y = generate(args.samples, args.features, problem=args.problem, seed=args.seed)
    ds = DataSet(X, y)
    ds.save(args.output, file_format=args.format)
    return 0


if __name__ == "__main__":
    sys.exit(main())
