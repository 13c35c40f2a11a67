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


def _unpack_int4(core):
    lo4 = (core & 0xF).astype(np.int8)
    lo4[lo4 > 7] -= 16
    hi4 = (core >> 4).astype(np.int8)
    hi4[hi4 > 7] -= 16
    k = core.shape[0]
    got = np.empty((k, k), np.int8)
    got[:, 0::2] = lo4
    got[:, 1::2] = hi4
    return got


@pytest.mark.parametrize("core_dtype", ["int8", "int4", "bfloat16"])
def test_core_build_banded_matches_dense_reference(rng, core_dtype):
    """Banded final-dtype core build ≡ full f32 fill + convert (incl.
    the exact-integer demotion bookkeeping for int8/int4 cores)."""
    n, e, k = 500, 8000, 128
    rows = rng.integers(0, n, e).astype(np.int32)
    cols = rng.integers(0, n, e).astype(np.int32)
    vals = rng.integers(1, 4, e).astype(np.float32)
    deg = np.bincount(rows, minlength=n) + np.bincount(cols, minlength=n)
    order = np.argsort(-deg).astype(np.int32)
    rank = np.empty(n, np.int32)
    rank[order] = np.arange(n, dtype=np.int32)
    # force demotions: out-of-range and non-integer cells between hubs
    hub = order[:8]
    rows[:30] = rng.choice(hub, 30).astype(np.int32)
    cols[:30] = rng.choice(hub, 30).astype(np.int32)
    vals[:10] = 300.0
    vals[10:20] = 2.5

    out = native.core_build_banded(
        rows, cols, vals, rank, k, core_dtype, band_bytes=1 << 12
    )
    if out is None:
        pytest.skip("native planner unavailable")
    core, tail_mask, bad = out

    in_core = (rank[rows] < k) & (rank[cols] < k)
    np.testing.assert_array_equal(tail_mask, ~in_core)
    ref = np.zeros((k, k), np.float64)
    np.add.at(ref, (rank[rows[in_core]], rank[cols[in_core]]), vals[in_core])
    if core_dtype == "bfloat16":
        import ml_dtypes

        expect = ref.astype(np.float32).astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(
            core.astype(np.float32), expect.astype(np.float32)
        )
        assert bad.size == 0
        return
    hi = 127 if core_dtype == "int8" else 7
    badmask = (ref > hi) | (ref < -hi - 1) | (ref != np.rint(ref))
    assert badmask.sum() > 0  # the forced demotions actually landed
    expect = np.where(badmask, 0, ref).astype(np.int8)
    got = core if core_dtype == "int8" else _unpack_int4(core)
    np.testing.assert_array_equal(got, expect)
    assert set(bad.tolist()) == set(np.flatnonzero(badmask).tolist())


@pytest.mark.parametrize("core_dtype", ["int8", "int4", "bfloat16"])
def test_hybrid_prepare_banded_equals_fallback(rng, monkeypatch, tmp_path,
                                               core_dtype):
    """End-to-end: the banded native hybrid prepare and the pure-NumPy
    fallback produce identical device tables (core bytes, ELL tail,
    demotion set)."""
    import jax.numpy as jnp

    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

    coo = random_coo(rng, nrows=400, ncols=400, nnz=6000)
    # integer-valued with forced demotions for the integer tiers
    vals = rng.integers(1, 4, coo.nnz).astype(np.float32)
    vals[:10] = 300.0
    vals[10:20] = 9.0  # in int8 range, outside int4's [-8, 7]
    import dataclasses

    coo = dataclasses.replace(coo, vals=vals)
    cfg = SpmmConfig(backend="hybrid", hybrid_k=64, hybrid_dtype=core_dtype)

    monkeypatch.setenv("PYGIM_TPU_DATA", str(tmp_path / "n"))
    assert native.native_available()
    prep_n = prepare_spmm(coo, cfg)

    monkeypatch.setenv("PYGIM_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setenv("PYGIM_TPU_DATA", str(tmp_path / "f"))
    prep_f = prepare_spmm(coo, cfg)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)

    for key in prep_n._dev:
        a, b = np.asarray(prep_n._dev[key]), np.asarray(prep_f._dev[key])
        if a.dtype == jnp.bfloat16:
            a, b = a.astype(np.float32), b.astype(np.float32)
        np.testing.assert_array_equal(a, b, err_msg=key)
