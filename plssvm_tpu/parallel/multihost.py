"""Multi-host training support: process group init + per-host sharded ingest.

TPU pods span multiple hosts; each host sees only its local chips.  This
module provides the two pieces the single-host code in
`plssvm_tpu.parallel.sharded` needs to scale across hosts:

- `initialize_distributed()` — `jax.distributed.initialize` wrapper (reads
  the standard env configuration on TPU pods; explicit args for manual
  setups).  The reference has no equivalent: it is a single-process library
  whose multi-GPU reduction stages through host memory
  (include/plssvm/backends/gpu_csvm.hpp:449-475, SURVEY.md §2.4 P3).
- `shard_arrays_multihost()` — build global row-sharded `jax.Array`s from
  per-host local row blocks via `jax.make_array_from_process_local_data`,
  so each host parses only its slice of the training file (the reference
  parses the whole file on one host, OpenMP-threaded —
  detail/io/libsvm_parsing.hpp:117).

The CG solver itself is host-count-agnostic: `build_sharded_solver` works
unchanged over a global mesh because every cross-chip interaction is a
`psum`/`ppermute` over the mesh axis, riding ICI within a slice and DCN
across slices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharded import ROW_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX process group for multi-host execution.

    On TPU pods with standard env configuration (e.g. GKE/TPU-VM metadata),
    call with no arguments.  No-op when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:  # already initialized
        if "already" not in str(exc).lower():
            raise


def global_row_mesh() -> Mesh:
    """A 1-D mesh over ALL devices in the job (local + remote hosts)."""
    return Mesh(np.asarray(jax.devices()), (ROW_AXIS,))


def host_row_range(total_rows: int) -> Tuple[int, int]:
    """[begin, end) of the padded row axis owned by this host's chips.

    Rows are block-distributed in process order, matching the layout
    `jax.make_array_from_process_local_data` expects for a 1-D row sharding.
    ``total_rows`` must be divisible by the global device count.
    """
    nproc = jax.process_count()
    pid = jax.process_index()
    if total_rows % nproc != 0:
        raise ValueError(
            f"padded row count {total_rows} must divide evenly across "
            f"{nproc} hosts"
        )
    per = total_rows // nproc
    return pid * per, (pid + 1) * per


def shard_arrays_multihost(
    mesh: Mesh,
    X_local: np.ndarray,     # this host's row block of the padded data
    x_last: np.ndarray,      # (d,) replicated
    y_local: np.ndarray,     # this host's row block of the labels
    y_last,
    mask_local: np.ndarray,  # this host's row block of the row mask
    dtype,
) -> Tuple:
    """Assemble global row-sharded arrays from per-host local blocks."""
    row2 = NamedSharding(mesh, P(ROW_AXIS, None))
    row1 = NamedSharding(mesh, P(ROW_AXIS))
    rep = NamedSharding(mesh, P())

    X_local = np.asarray(X_local, dtype)
    y_local = np.asarray(y_local, dtype)
    mask_local = np.asarray(mask_local, dtype)
    total_rows = X_local.shape[0] * jax.process_count()

    X_g = jax.make_array_from_process_local_data(
        row2, X_local, global_shape=(total_rows, X_local.shape[1])
    )
    y_g = jax.make_array_from_process_local_data(
        row1, y_local, global_shape=(total_rows,)
    )
    mask_g = jax.make_array_from_process_local_data(
        row1, mask_local, global_shape=(total_rows,)
    )
    x_last_g = jax.device_put(jnp.asarray(x_last, dtype), rep)
    y_last_g = jax.device_put(jnp.asarray(y_last, dtype), rep)
    return X_g, x_last_g, y_g, y_last_g, mask_g


def parse_libsvm_rows_for_host(
    filename: str, total_rows_hint: Optional[int] = None, dtype=np.float64
):
    """Parse only this host's row slice of a LIBSVM file.

    Every host reads the file (it is typically on shared storage) but keeps
    only its block of rows, bounding per-host memory at O(n d / #hosts).
    Returns ``(X_local, labels_local, total_rows, num_features)``; feature
    counts are reconciled globally by the caller (features are defined by
    the max index over the WHOLE file, so a global max over hosts is needed
    when slicing before parsing — here the parse is full-file and the slice
    happens after, trading parse time for simplicity; swap in offset-based
    mmap slicing when files exceed host memory).
    """
    from ..io.libsvm import parse_libsvm_file

    X, labels = parse_libsvm_file(filename, dtype=dtype)
    n = X.shape[0]
    begin, end = host_row_range(total_rows_hint or n)
    begin, end = min(begin, n), min(end, n)
    X_local = X[begin:end]
    labels_local = labels[begin:end] if labels is not None else None
    return X_local, labels_local, n, X.shape[1]
