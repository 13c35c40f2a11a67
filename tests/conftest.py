"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(``xla_force_host_platform_device_count``) since the test machine has at
most one real TPU chip. The machine's sitecustomize force-registers a
remote-TPU PJRT plugin and stomps ``JAX_PLATFORMS``, so plain env vars are
not enough — we must override through ``jax.config`` before the first op.
"""

import os
import tempfile

# fresh prepare/dataset cache per test session: the hybrid prepare's disk
# cache is keyed by (graph, config) fingerprints that deliberately do NOT
# include code versions — a stale cache from an older builder would mask
# builder changes (and tests must not pollute the user's real cache)
os.environ["PYGIM_TPU_DATA"] = tempfile.mkdtemp(prefix="pygim_test_cache_")
# same for the tuner's result/constants cache (resolved at import time):
# tests must neither read stale tuner picks nor pollute the user's cache
os.environ["PYGIM_TPU_TUNE_CACHE"] = tempfile.mkdtemp(
    prefix="pygim_test_tune_"
)

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def random_coo(rng, nrows, ncols, nnz, dtype="float32", distinct=True):
    """Random COO graph; ``distinct`` dedups (row,col) pairs."""
    from pygim_tpu.core.graph import CooGraph

    rows = rng.integers(0, nrows, size=nnz)
    cols = rng.integers(0, ncols, size=nnz)
    if distinct:
        flat = np.unique(rows.astype(np.int64) * ncols + cols)
        rows, cols = flat // ncols, flat % ncols
    if dtype.startswith("int"):
        vals = rng.integers(-4, 5, size=rows.shape[0])
    else:
        vals = rng.standard_normal(rows.shape[0])
    return CooGraph.from_edges(
        rows, cols, vals, nrows=nrows, ncols=ncols, dtype=dtype
    )


@pytest.fixture
def small_coo(rng):
    return random_coo(rng, nrows=100, ncols=80, nnz=600)
