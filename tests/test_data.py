"""Dataset synthesis, caching, mtx loading, cluster partitioning."""

import numpy as np
import pytest

from pygim_tpu.data import (
    DATASET_SPECS,
    cluster_partition,
    load_dataset,
    load_mtx,
    rmat_edges,
)


def test_rmat_shapes_and_skew():
    rows, cols = rmat_edges(1024, 50_000, seed=1)
    assert rows.shape == cols.shape == (50_000,)
    assert rows.max() < 1024 and cols.max() < 1024
    deg = np.bincount(rows, minlength=1024)
    # power-law-ish: max degree far above mean
    assert deg.max() > 5 * deg.mean()


def test_load_tiny_and_cache(tmp_path):
    ds = load_dataset("tiny", root=str(tmp_path))
    n, e, f, c = DATASET_SPECS["tiny"]
    assert ds.num_nodes == n and ds.num_edges == e
    assert ds.x.shape == (n, f) and ds.num_classes == c
    assert (tmp_path / "tiny-sim.npz").exists()
    ds2 = load_dataset("tiny", root=str(tmp_path))
    np.testing.assert_array_equal(ds.graph.rows, ds2.graph.rows)
    np.testing.assert_array_equal(ds.x, ds2.x)


def test_parametric_rmat():
    ds = load_dataset("rmat-500-2000")
    assert ds.num_nodes == 500 and ds.num_edges == 2000


def test_unknown_dataset_raises():
    with pytest.raises(KeyError):
        load_dataset("nope")


def test_cluster_partition(tmp_path):
    ds = load_dataset("tiny", root=str(tmp_path))
    part = cluster_partition(ds, part_size=300, part_idx=1)
    assert part.num_nodes == 300
    assert part.x.shape[0] == 300
    # all edges within range
    assert part.graph.rows.max() < 300 and part.graph.cols.max() < 300


def test_load_mtx(tmp_path):
    p = tmp_path / "m.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 3\n1 2 1.5\n2 3 2.5\n3 1 3.5\n"
    )
    g = load_mtx(str(p))
    assert g.nrows == 3 and g.nnz == 3
    dense = g.to_dense()
    assert dense[0, 1] == 1.5 and dense[2, 0] == 3.5
