"""Test configuration.

Multi-chip logic is tested on CPU with 8 virtual devices
(``--xla_force_host_platform_device_count=8``) — the fake-backend capability
the reference lacks (its multi-GPU tests need real GPUs, SURVEY.md §4).

NOTE: on machines with the experimental tunneled-TPU plugin,
``JAX_PLATFORMS=cpu`` is unreliable; we instead pin the default device to a
CPU device explicitly.
"""

import os

# append (not setdefault): a pre-set XLA_FLAGS from the environment must not
# silently drop the virtual-device flag — that skipped every >=4-device test
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import plssvm_tpu  # noqa: E402

plssvm_tpu.set_verbosity("quiet")

HERE = os.path.dirname(os.path.abspath(__file__))
DATA_DIR = os.path.join(HERE, "data")
REFERENCE_DATA = "/root/reference/tests/data"


@pytest.fixture
def data_dir():
    return DATA_DIR


@pytest.fixture
def reference_data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference test data not available")
    return REFERENCE_DATA


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(params=[np.float32, np.float64], ids=["f32", "f64"])
def real_dtype(request):
    """The {float, double} real-type matrix (reference: types_to_test.hpp)."""
    return request.param


@pytest.fixture(params=["linear", "polynomial", "rbf"])
def kernel_name(request):
    return request.param


#: the label-type axis of the typed matrix (reference: types_to_test.hpp
#: 46-49 instantiates every suite over real_type x label_type; the runtime
#: label types here are int / float / str / bool — data_set.py:39-64)
LABEL_CASES = {
    "int": (np.int64, (-7, 42)),
    "float": (np.float64, (-1.5, 2.5)),
    "str": (object, ("cat", "dog")),
    "bool": (bool, (False, True)),
}


@pytest.fixture(params=list(LABEL_CASES), ids=list(LABEL_CASES))
def label_case(request):
    """(name, numpy dtype, (neg, pos) label values) for each label type."""
    dtype, (neg, pos) = LABEL_CASES[request.param]
    return request.param, dtype, neg, pos


def typed_blobs(n, d, label_pair, seed=0, dtype=np.float64):
    """make_blobs with the +/- classes renamed to an arbitrary label pair."""
    X, y = make_blobs(n, d, seed=seed, dtype=dtype)
    neg, pos = label_pair
    label_dtype = object if isinstance(pos, str) else None
    labels = np.asarray([pos if v > 0 else neg for v in y], dtype=label_dtype)
    return X, labels


def make_blobs(n, d, seed=0, dtype=np.float64):
    """Two separable Gaussian blobs — deterministic synthetic data."""
    rng = np.random.default_rng(seed)
    half = n // 2
    X = np.concatenate([
        rng.normal(-1.0, 1.0, size=(half, d)),
        rng.normal(+1.0, 1.0, size=(n - half, d)),
    ]).astype(dtype)
    y = np.concatenate([-np.ones(half), np.ones(n - half)]).astype(np.int64)
    perm = rng.permutation(n)
    return X[perm], y[perm]
