"""Property tests for graph containers and the partition planner."""

import numpy as np
import pytest

from pygim_tpu.core.graph import CooGraph, coo_to_csr, column_split_bounds
from pygim_tpu.core.partition import (
    build_coo_chunks,
    build_ell_blocks,
    make_row_block_plan,
    plan_row_blocks,
    split_features,
)
from tests.conftest import random_coo


def test_coo_csr_roundtrip(small_coo):
    csr = coo_to_csr(small_coo)
    assert csr.nnz == small_coo.nnz
    assert csr.nrows == small_coo.nrows
    np.testing.assert_allclose(csr.to_dense(), small_coo.to_dense())
    back = csr.to_coo()
    np.testing.assert_allclose(back.to_dense(), small_coo.to_dense())


def test_values_default_ones():
    g = CooGraph.from_edges([0, 1], [1, 0], nrows=2, ncols=2, dtype="int32")
    assert g.vals.dtype == np.int32
    np.testing.assert_array_equal(g.vals, [1, 1])


def test_col_split_partition_of_matrix(small_coo):
    parts = small_coo.col_split(3)
    assert sum(p.nnz for p in parts) == small_coo.nnz
    dense = np.concatenate([p.to_dense() for p in parts], axis=1)
    np.testing.assert_allclose(dense, small_coo.to_dense())


def test_col_split_csr_matches_coo(small_coo):
    csr = small_coo.to_csr()
    for pc, ps in zip(small_coo.col_split(4), csr.col_split(4)):
        np.testing.assert_allclose(ps.to_dense(), pc.to_dense())


def test_column_split_bounds_remainder_in_last():
    # same convention as reference h_size split (spmm.py:59-63)
    assert column_split_bounds(10, 3) == [(0, 3), (3, 6), (6, 10)]


@pytest.mark.parametrize("balance", ["row", "nnz"])
def test_row_block_bounds_cover_rows(small_coo, balance):
    csr = small_coo.to_csr()
    bounds = plan_row_blocks(csr.rowptr, 7, balance)
    assert bounds[0] == 0 and bounds[-1] == csr.nrows
    assert (np.diff(bounds) >= 0).all()


def test_nnz_balance_beats_row_balance_on_skew(rng):
    # a power-law-ish graph: one hub row with most of the nnz
    rows = np.concatenate([np.zeros(500, dtype=int), rng.integers(1, 64, 200)])
    cols = rng.integers(0, 64, rows.shape[0])
    g = CooGraph.from_edges(rows, cols, nrows=64, ncols=64)
    csr = g.to_csr()

    def max_block_nnz(balance):
        bounds = plan_row_blocks(csr.rowptr, 4, balance)
        return (csr.rowptr[bounds[1:]] - csr.rowptr[bounds[:-1]]).max()

    nnz_imbalance = max_block_nnz("nnz")
    row_imbalance = max_block_nnz("row")
    # nnz balancing cannot split the hub row, but must not be worse
    assert nnz_imbalance <= row_imbalance


def test_ell_blocks_reconstruct(small_coo):
    csr = small_coo.to_csr()
    plan = make_row_block_plan(csr, 5, balance="nnz")
    ell = build_ell_blocks(csr, plan)
    assert ell.colind.shape == (5, plan.nnz_pad)
    # reconstruct the dense matrix from the padded tables
    dense = np.zeros((csr.nrows, csr.ncols))
    for b in range(plan.n_blocks):
        r0 = int(ell.row_start[b])
        rows_in_block = int(plan.bounds[b + 1] - plan.bounds[b])
        for k in range(plan.nnz_pad):
            v = ell.vals[b, k]
            if v == 0:
                continue
            rl = int(ell.rowloc[b, k])
            assert rl < rows_in_block  # real nnz never in the pad row
            dense[r0 + rl, ell.colind[b, k]] += v
    ref = csr.to_dense()
    mask = ref != 0  # zero-valued explicit nnz are unrecoverable; fine
    np.testing.assert_allclose(dense[mask], ref[mask])


def test_coo_chunks_cover_all_nnz(small_coo):
    ch = build_coo_chunks(small_coo, 4)
    assert ch.rows.shape == (4, ch.chunk_nnz)
    dense = np.zeros((small_coo.nrows, small_coo.ncols))
    np.add.at(dense, (ch.rows.ravel(), ch.cols.ravel()), ch.vals.ravel())
    ref = small_coo.to_dense()
    mask = ref != 0
    np.testing.assert_allclose(dense[mask], ref[mask])


def test_split_features():
    assert split_features(256, 4) == [(0, 64), (64, 128), (128, 192), (192, 256)]


def test_big_graph_planner_fast(rng):
    g = random_coo(rng, nrows=50_000, ncols=50_000, nnz=500_000)
    csr = g.to_csr()
    plan = make_row_block_plan(csr, 64, balance="nnz")
    per_block = csr.rowptr[plan.bounds[1:]] - csr.rowptr[plan.bounds[:-1]]
    mean = csr.nnz / 64
    assert per_block.max() < 1.5 * mean  # well balanced


def test_add_self_loops(rng):
    from pygim_tpu.core.transforms import add_self_loops

    g = CooGraph.from_edges([0, 1, 2], [1, 1, 0], nrows=3, ncols=3)
    g2 = add_self_loops(g)
    dense = g2.to_dense()
    assert dense[0, 0] == 1 and dense[2, 2] == 1
    assert dense[1, 1] == 1  # (1,1) already present stays single
    assert g2.nnz == 5


def test_gcn_norm_row_col_symmetric(rng):
    from pygim_tpu.core.transforms import gcn_norm, to_undirected
    from tests.conftest import random_coo

    base = random_coo(rng, nrows=50, ncols=50, nnz=300)
    base = CooGraph.from_edges(base.rows, base.cols, nrows=50, ncols=50)
    g = to_undirected(base)  # binary symmetric adjacency
    gn = gcn_norm(g)
    dense = gn.to_dense()
    # symmetric input stays symmetric under D^-1/2 A D^-1/2
    np.testing.assert_allclose(dense, dense.T, atol=1e-6)
    # spectral radius <= 1 for the normalized adjacency with self-loops
    w = np.linalg.eigvalsh(dense)
    assert w.max() <= 1.0 + 1e-5


def test_mean_aggregate_norm(rng):
    from pygim_tpu.core.transforms import mean_aggregate_norm
    from tests.conftest import random_coo

    g = random_coo(rng, nrows=40, ncols=40, nnz=200)
    g = CooGraph.from_edges(g.rows, g.cols, nrows=40, ncols=40)
    gm = mean_aggregate_norm(g)
    sums = gm.to_dense().sum(axis=1)
    nz = np.bincount(g.rows, minlength=40) > 0
    np.testing.assert_allclose(sums[nz], 1.0, atol=1e-6)


def test_to_undirected_sums_duplicates():
    from pygim_tpu.core.transforms import to_undirected

    g = CooGraph.from_edges([0, 1], [1, 0], [2.0, 3.0], nrows=2, ncols=2)
    u = to_undirected(g)
    dense = u.to_dense()
    assert dense[0, 1] == 5.0 and dense[1, 0] == 5.0
