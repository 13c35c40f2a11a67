"""Prepare-time duplicate-edge merging (core/graph.py
merge_duplicate_edges) — the semantic no-op every gather tier credits:
R-MAT-style generators emit multi-edges (reddit-sim: 114.6M stored /
78.8M unique pairs), and integer-core demotion shrinks from
per-duplicate-edge to per-cell."""

import numpy as np
import pytest

from pygim_tpu.core.graph import CooGraph, merge_duplicate_edges
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm


def _dup_graph(n=1024, m=40000, seed=0, vals=None):
    rng = np.random.default_rng(seed)
    rows = (rng.pareto(1.3, m) * 20).astype(np.int64) % n
    cols = (rng.pareto(1.3, m) * 20).astype(np.int64) % n
    v = np.ones(m, np.float32) if vals is None else vals
    return CooGraph.from_edges(rows, cols, v, nrows=n, ncols=n)


def test_merge_sums_duplicates_and_flags():
    g = CooGraph.from_edges(
        [0, 0, 1, 0], [1, 1, 2, 1], np.ones(4, np.float32),
        nrows=3, ncols=3,
    )
    m, merged = merge_duplicate_edges(g)
    assert merged
    assert m.nnz == 2
    pairs = {(int(r), int(c)): float(v)
             for r, c, v in zip(m.rows, m.cols, m.vals)}
    assert pairs == {(0, 1): 3.0, (1, 2): 1.0}


def test_merge_simple_graph_is_identity():
    g = CooGraph.from_edges([0, 1], [1, 2], np.ones(2, np.float32),
                            nrows=3, ncols=3)
    m, merged = merge_duplicate_edges(g)
    assert not merged and m.nnz == 2


def test_merge_int_overflow_promotes_to_int32():
    # 200 duplicate int8 edges of value 1: merged 200 overflows int8,
    # fits int32
    g = CooGraph(
        rows=np.zeros(200, np.int32), cols=np.ones(200, np.int32),
        vals=np.ones(200, np.int8), nrows=2, ncols=2,
    )
    m, merged = merge_duplicate_edges(g)
    assert merged and m.vals.dtype == np.int32 and int(m.vals[0]) == 200


def test_merged_prepare_matches_oracle_all_backends():
    import jax.numpy as jnp

    from pygim_tpu.ops.reference import spmm_coo_oracle

    g = _dup_graph()
    x = np.random.default_rng(1).standard_normal((g.ncols, 16)).astype(
        np.float32
    )
    ref = np.asarray(
        spmm_coo_oracle(g.rows, g.cols, g.vals, jnp.asarray(x), g.nrows)
    )
    for backend in ("blocked", "ell", "coo", "hybrid"):
        cfg = SpmmConfig(backend=backend, hybrid_k=128)
        out = np.asarray(prepare_spmm(g, cfg).mul(jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=backend)


def test_merge_shrinks_int4_demotion_tail():
    g = _dup_graph(n=2048, m=100000)
    tails = {}
    for flag in (False, True):
        prep = prepare_spmm(
            g, SpmmConfig(backend="hybrid", hybrid_k=256,
                          hybrid_dtype="int4", merge_duplicates=flag)
        )
        # sum over every multi-degree ELL table (vals2d, vals2d_1, ...)
        tails[flag] = sum(
            int((np.asarray(v) != 0).sum())
            for key, v in prep._dev.items()
            if key.startswith("vals2d")
        )
    # merged demotion is per-cell; unmerged is per-duplicate-edge
    assert tails[True] < 0.6 * tails[False], tails


def test_halo_merges_duplicates():
    import jax.numpy as jnp

    from pygim_tpu.ops.reference import spmm_coo_oracle
    from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo

    g = _dup_graph(n=512, m=20000)
    x = np.random.default_rng(2).standard_normal((512, 16)).astype(
        np.float32
    )
    halo = prepare_spmm_halo(g, make_node_mesh(4))
    out = np.asarray(halo.mul(jnp.asarray(x)))
    ref = np.asarray(
        spmm_coo_oracle(g.rows, g.cols, g.vals, jnp.asarray(x), g.nrows)
    )
    # pareto hub rows sum thousands of f32 terms in a different order
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-3)
