"""Randomized cross-backend equivalence net.

Every backend × dtype × knob combination must agree with the jnp oracle
(the spmm_host_* A/B discipline, SURVEY.md §4.1, applied as a seeded
sweep instead of hand-picked cases). Shapes stay small so the whole
sweep costs seconds; seeds are fixed — failures reproduce exactly.
"""

import numpy as np
import pytest

from pygim_tpu.core.graph import CooGraph
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

CASES = [
    # (seed, nrows, ncols, nnz, vals_dtype, x_dtype, config_kwargs)
    (0, 97, 83, 900, "float32", "float32", dict(backend="blocked", n_blocks=3)),
    (1, 64, 64, 700, "float32", "float32", dict(backend="ell")),
    (2, 128, 128, 1500, "int32", "int32", dict(backend="coo")),
    (3, 150, 150, 2000, "float32", "float32",
     dict(backend="hybrid", hybrid_k=32)),
    (4, 150, 150, 2000, "float32", "float32",
     dict(backend="hybrid", hybrid_k=48, hybrid_dtype="bfloat16")),
    (5, 160, 160, 2500, "int8", "int8",
     dict(backend="hybrid", hybrid_k=32, hybrid_dtype="int8")),
    (6, 160, 160, 2500, "int16", "int16",
     dict(backend="hybrid", hybrid_k=32, hybrid_dtype="int4")),
    (7, 200, 200, 3000, "float32", "float32",
     dict(backend="hybrid", hybrid_k=16, bcsr_bytes=1 << 20,
          bcsr_tile=8, bcsr_min_edges=2)),
    (8, 120, 120, 1200, "float32", "float32",
     dict(backend="ell", balance="row")),
    (9, 90, 110, 800, "int64", "int64", dict(backend="blocked", n_blocks=2)),
    # duplicate-merge axis: identical math with merging disabled, and a
    # duplicate-heavy case (nnz >> nrows²/4 forces heavy multi-edges)
    (10, 64, 64, 900, "float32", "float32",
     dict(backend="ell", merge_duplicates=False)),
    (11, 40, 40, 3000, "float32", "float32",
     dict(backend="hybrid", hybrid_k=16)),
    (12, 40, 40, 3000, "int32", "int32", dict(backend="blocked")),
]


@pytest.mark.parametrize("case", CASES, ids=[f"c{c[0]}" for c in CASES])
def test_backend_matches_oracle(case):
    import jax.numpy as jnp

    seed, nrows, ncols, nnz, vdt, xdt, kw = case
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, nrows, nnz).astype(np.int32)
    cols = rng.integers(0, ncols, nnz).astype(np.int32)
    if np.issubdtype(np.dtype(vdt), np.integer):
        vals = rng.integers(-3, 4, nnz).astype(vdt)
    else:
        vals = rng.standard_normal(nnz).astype(vdt)
    if kw.get("backend") == "hybrid" and nrows != ncols:
        pytest.skip("hybrid needs square")
    if kw.get("hybrid_dtype") in ("int8", "int4"):
        # exact-integer core: keep cells in range
        vals = np.ones(nnz, dtype=vdt)
    coo = CooGraph.from_edges(rows, cols, vals, nrows=nrows, ncols=ncols)

    h = 24
    if np.issubdtype(np.dtype(xdt), np.integer):
        x = rng.integers(-4, 5, (ncols, h)).astype(xdt)
    else:
        x = rng.standard_normal((ncols, h)).astype(xdt)

    prep = prepare_spmm(coo, SpmmConfig(hidden_hint=h, **kw))
    out = np.asarray(prep.mul(jnp.asarray(x)))
    ref = coo.to_dense().astype(np.float64) @ x.astype(np.float64)

    loose = kw.get("hybrid_dtype") == "bfloat16" or (
        kw.get("hybrid_dtype") in ("int8", "int4")
        and not np.issubdtype(np.dtype(xdt), np.integer)
    )
    if np.issubdtype(np.dtype(xdt), np.integer) and not loose:
        np.testing.assert_array_equal(out.astype(np.int64), ref)
    else:
        rtol = 3e-2 if loose else 1e-4
        np.testing.assert_allclose(out, ref, rtol=rtol, atol=10 * rtol)


ZIPF_CASES = [
    # (seed, n, about_nnz, vals_dtype, x_dtype, config_kwargs) — power-law
    # degrees so the multi-degree split actually splits (round 4); every
    # (ell_tables, backend, dtype) combination must agree with the oracle
    (20, 300, 4000, "float32", "float32", dict(backend="ell", ell_tables=1)),
    (21, 300, 4000, "float32", "float32", dict(backend="ell", ell_tables=2)),
    (22, 300, 4000, "float32", "float32", dict(backend="ell", ell_tables=3)),
    (23, 300, 5000, "float32", "float32",
     dict(backend="hybrid", hybrid_k=32, ell_tables=3)),
    (24, 300, 5000, "int32", "int32", dict(backend="ell", ell_tables=3)),
    (25, 300, 5000, "int8", "int8",
     dict(backend="hybrid", hybrid_k=32, hybrid_dtype="int8",
          ell_tables=3)),
    (26, 260, 4000, "float32", "float32",
     dict(backend="hybrid", hybrid_k=16, bcsr_bytes=1 << 20, bcsr_tile=8,
          bcsr_min_edges=2, ell_tables=3)),
    (27, 300, 4000, "float32", "float32",
     dict(backend="ell", ell_degree=8, ell_tables=3)),  # pin beats split
]


@pytest.mark.parametrize("case", ZIPF_CASES, ids=[f"z{c[0]}" for c in ZIPF_CASES])
def test_zipf_multi_table_matches_oracle(case):
    import jax.numpy as jnp

    seed, n, about_nnz, vdt, xdt, kw = case
    rng = np.random.default_rng(seed)
    deg = np.minimum(rng.zipf(1.4, n), n // 2)
    deg = (deg * (about_nnz / deg.sum())).astype(np.int64) + 1
    rows = np.repeat(np.arange(n), deg).astype(np.int32)
    cols = rng.integers(0, n, rows.size).astype(np.int32)
    if kw.get("hybrid_dtype") in ("int8", "int4"):
        vals = np.ones(rows.size, dtype=vdt)
    elif np.issubdtype(np.dtype(vdt), np.integer):
        vals = rng.integers(-3, 4, rows.size).astype(vdt)
    else:
        vals = rng.standard_normal(rows.size).astype(vdt)
    coo = CooGraph.from_edges(rows, cols, vals, nrows=n, ncols=n)

    h = 24
    if np.issubdtype(np.dtype(xdt), np.integer):
        x = rng.integers(-4, 5, (n, h)).astype(xdt)
    else:
        x = rng.standard_normal((n, h)).astype(xdt)

    prep = prepare_spmm(coo, SpmmConfig(hidden_hint=h, **kw))
    if kw.get("ell_degree"):
        assert len(prep.ell_meta) == 1  # pinned degree collapses tables
    out = np.asarray(prep.mul(jnp.asarray(x)))
    ref = coo.to_dense().astype(np.float64) @ x.astype(np.float64)

    loose = kw.get("hybrid_dtype") == "bfloat16" or (
        kw.get("hybrid_dtype") in ("int8", "int4")
        and not np.issubdtype(np.dtype(xdt), np.integer)
    )
    if np.issubdtype(np.dtype(xdt), np.integer) and not loose:
        np.testing.assert_array_equal(out.astype(np.int64), ref)
    else:
        rtol = 3e-2 if loose else 1e-4
        np.testing.assert_allclose(out, ref, rtol=rtol, atol=10 * rtol)
