"""Multi-host helpers, exercised in the single-process/8-virtual-device env.

Real multi-host runs need a pod; these tests pin the single-host semantics
(process_count() == 1) and the global-array assembly path that multi-host
execution shares.
"""

import jax
import numpy as np
import pytest

from plssvm_tpu.parallel.multihost import (
    global_row_mesh,
    host_row_range,
    shard_arrays_multihost,
)
from plssvm_tpu.parallel.sharded import ROW_AXIS, build_sharded_solver
from plssvm_tpu.parameter import KernelFunctionType

from conftest import make_blobs


def test_host_row_range_single_process():
    assert jax.process_count() == 1
    assert host_row_range(512) == (0, 512)
    # any row count divides across one host
    assert host_row_range(513) == (0, 513)


def test_global_mesh_covers_all_devices():
    mesh = global_row_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == (ROW_AXIS,)


def test_shard_arrays_multihost_solve():
    """Global arrays built via make_array_from_process_local_data solve
    identically to the plain device_put path."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(devs[:8]), (ROW_AXIS,))
    dtype = np.float64
    X, y = make_blobs(257, 6, seed=5, dtype=dtype)
    dept = 256
    Xp = X[:dept]
    yp = y[:dept].astype(dtype)
    mask = np.ones((dept,), dtype=dtype)

    args = shard_arrays_multihost(
        mesh, Xp, X[-1], yp, dtype(y[-1]), mask, dtype
    )
    solver = build_sharded_solver(mesh, kind=KernelFunctionType.RBF, degree=3)
    import jax.numpy as jnp

    res = solver(
        *args, jnp.asarray(1.0 / 6, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(1e-8, dtype),
        jnp.asarray(500, jnp.int32),
    )
    from plssvm_tpu.parallel.sharded import shard_arrays

    res2 = build_sharded_solver(mesh, kind=KernelFunctionType.RBF, degree=3)(
        *shard_arrays(mesh, Xp, X[-1], yp, dtype(y[-1]), mask, dtype),
        jnp.asarray(1.0 / 6, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), jnp.asarray(1e-8, dtype),
        jnp.asarray(500, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(res.x)), np.asarray(jax.device_get(res2.x)),
        rtol=1e-12, atol=1e-14,
    )
