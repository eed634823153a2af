"""CG-state checkpointing: save / restore a training run mid-solve.

A capability the reference lacks entirely — its only persisted artifact is
the finished LIBSVM model file, so an interrupted training run restarts from
scratch (SURVEY.md §5, model.hpp:169-222).  Here the full CG state
(x, r, d, delta, delta0, iteration) is dumped to a ``.npz`` alongside a
fingerprint of the problem; `CSVM.fit(checkpoint_path=...)` saves it every
``checkpoint_interval`` iterations and resumes automatically when the file
matches the problem.

The exact-residual recomputation every 50 iterations (gpu_csvm.hpp:595-609)
makes resumption numerically benign: any drift introduced by the round trip
is corrected at the next exact-residual step.
"""

from __future__ import annotations

import hashlib
import os
from typing import NamedTuple, Optional

import numpy as np


class CGCheckpoint(NamedTuple):
    """Host-side snapshot of the CG solver state."""

    x: np.ndarray
    r: np.ndarray
    d: np.ndarray
    delta: float
    delta0: float
    iteration: int
    fingerprint: str


def problem_fingerprint(X: np.ndarray, y: np.ndarray, params_repr: str,
                        epsilon: float) -> str:
    """Cheap fingerprint tying a checkpoint to its training problem."""
    h = hashlib.sha256()
    h.update(str(X.shape).encode())
    h.update(str(np.asarray(X).dtype).encode())
    # hash a deterministic sample of the data, not all of it (cheap for huge X)
    flat = np.ascontiguousarray(X).reshape(-1)
    stride = max(1, flat.size // 4096)
    h.update(np.ascontiguousarray(flat[::stride]).tobytes())
    h.update(np.ascontiguousarray(y).tobytes())
    h.update(params_repr.encode())
    h.update(repr(float(epsilon)).encode())
    return h.hexdigest()


def save_checkpoint(path: str, ckpt: CGCheckpoint) -> None:
    tmp = f"{path}.tmp{os.getpid()}"
    np.savez(
        tmp if tmp.endswith(".npz") else tmp + ".npz",
        x=ckpt.x, r=ckpt.r, d=ckpt.d,
        delta=np.float64(ckpt.delta), delta0=np.float64(ckpt.delta0),
        iteration=np.int64(ckpt.iteration),
        fingerprint=np.bytes_(ckpt.fingerprint.encode()),
    )
    written = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(written, path)


def load_checkpoint(path: str, fingerprint: str) -> Optional[CGCheckpoint]:
    """Load a checkpoint if it exists and matches the problem; else None."""
    if not os.path.isfile(path):
        return None
    try:
        with np.load(path) as data:
            stored = bytes(data["fingerprint"]).decode()
            if stored != fingerprint:
                return None
            return CGCheckpoint(
                x=data["x"], r=data["r"], d=data["d"],
                delta=float(data["delta"]), delta0=float(data["delta0"]),
                iteration=int(data["iteration"]),
                fingerprint=stored,
            )
    except (OSError, KeyError, ValueError):
        return None
