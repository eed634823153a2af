"""Multi-chip parallelism: row-sharded CG over a TPU device mesh.

Replaces the reference's feature-split + host-staged all-reduce multi-GPU
scheme (include/plssvm/backends/gpu_csvm.hpp:284-346,449-475) with
`shard_map` + ICI collectives; see `plssvm_tpu.parallel.sharded`.
"""

from .sharded import (
    ROW_AXIS,
    build_sharded_solver,
    linear_sharded_matvec,
    make_row_mesh,
    ring_kernel_matvec,
    shard_arrays,
)
from .multihost import (
    global_row_mesh,
    host_row_range,
    initialize_distributed,
    shard_arrays_multihost,
)

__all__ = [
    "ROW_AXIS",
    "build_sharded_solver",
    "linear_sharded_matvec",
    "make_row_mesh",
    "ring_kernel_matvec",
    "shard_arrays",
    "global_row_mesh",
    "host_row_range",
    "initialize_distributed",
    "shard_arrays_multihost",
]
