"""Native C++ planner vs the NumPy fallback (skipped without toolchain)."""

import numpy as np
import pytest

from pygim_tpu.core import native
from pygim_tpu.core.graph import CooGraph
from pygim_tpu.core.partition import build_ell_blocks, make_row_block_plan
from tests.conftest import random_coo

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native planner not built"
)


def test_native_coo_to_csr_matches_numpy(rng):
    coo = random_coo(rng, nrows=500, ncols=400, nnz=5000)
    res = native.coo_to_csr_native(coo.rows, coo.cols, coo.vals, coo.nrows)
    assert res is not None
    rowptr, colind, vals = res
    # compare against the pure-NumPy path via dense reconstruction
    from pygim_tpu.core.graph import CsrGraph

    got = CsrGraph(rowptr=rowptr, colind=colind, vals=vals, ncols=coo.ncols)
    np.testing.assert_allclose(got.to_dense(), coo.to_dense())


def test_native_ell_matches_python(rng, monkeypatch):
    coo = random_coo(rng, nrows=300, ncols=300, nnz=3000)
    csr = coo.to_csr()
    plan = make_row_block_plan(csr, 6)
    ell_native = build_ell_blocks(csr, plan)
    monkeypatch.setenv("PYGIM_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    ell_py = build_ell_blocks(csr, plan)
    np.testing.assert_array_equal(ell_native.colind, ell_py.colind)
    np.testing.assert_array_equal(ell_native.vals, ell_py.vals)
    np.testing.assert_array_equal(ell_native.rowloc, ell_py.rowloc)


def test_native_speed_on_large_graph(rng):
    """Sanity: native conversion handles a 2M-edge graph quickly."""
    import time

    coo = random_coo(rng, nrows=100_000, ncols=100_000, nnz=2_000_000)
    t0 = time.time()
    res = native.coo_to_csr_native(coo.rows, coo.cols, coo.vals, coo.nrows)
    assert res is not None
    assert time.time() - t0 < 5.0
    rowptr, colind, vals = res
    assert rowptr[-1] == coo.nnz
