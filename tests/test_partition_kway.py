"""Multilevel k-way partitioner (core/cluster.py partition_kway,
native/partition_ml.cpp) — the METIS-quality capability the reference
gets from ClusterData (reference inference.py:64-73)."""

import numpy as np
import pytest

from pygim_tpu.core.cluster import (
    edge_cut_fraction,
    partition_kway,
    partition_order,
)
from pygim_tpu.core.graph import CooGraph
from pygim_tpu.core.native import native_available
from pygim_tpu.data import load_dataset


def _planted(n=4096, blocks=16, deg=8, seed=0, p_intra=0.9):
    """Block-community graph under a hidden permutation: ground truth
    clusters exist but node ids carry no locality."""
    rng = np.random.default_rng(seed)
    bs = n // blocks
    rows = rng.integers(0, n, size=n * deg)
    intra = rng.random(n * deg) < p_intra
    base = (rows // bs) * bs
    cols = np.where(
        intra, base + rng.integers(0, bs, size=n * deg),
        rng.integers(0, n, size=n * deg),
    )
    perm = rng.permutation(n)
    g = CooGraph.from_edges(
        perm[rows], perm[cols], np.ones(n * deg, np.float32),
        nrows=n, ncols=n,
    )
    return g


def test_kway_balance_and_cut_beats_contiguous():
    g = _planted()
    nparts = 8
    part = partition_kway(g, nparts, tol=0.03)
    assert part.shape == (g.nrows,)
    assert part.min() >= 0 and part.max() < nparts
    sizes = np.bincount(part, minlength=nparts)
    target = g.nrows / nparts
    assert sizes.min() >= 0.9 * target, sizes
    assert sizes.max() <= 1.1 * target, sizes
    contig = (np.arange(g.nrows) * nparts // g.nrows).astype(np.int32)
    cut = edge_cut_fraction(g, part)
    cut0 = edge_cut_fraction(g, contig)
    # permuted ids: contiguous cut ~ (nparts-1)/nparts ≈ 0.875; the
    # planted structure admits ~0.1 + intra-part community grouping
    assert cut < 0.6 * cut0, (cut, cut0)


@pytest.mark.skipif(not native_available(), reason="needs native planner")
def test_kway_native_recovers_planted_communities():
    g = _planted(n=8192, blocks=8, deg=12)
    part = partition_kway(g, 8, tol=0.03)
    # with 90% intra-community edges the ideal 8-way cut is ~0.1·(7/8);
    # the multilevel scheme should land well under 0.35
    assert edge_cut_fraction(g, part) < 0.35


def test_kway_deterministic_and_single_part():
    g = _planted(n=1024, blocks=4, deg=6)
    p1 = partition_kway(g, 4, seed=3)
    p2 = partition_kway(g, 4, seed=3)
    assert np.array_equal(p1, p2)
    assert np.array_equal(partition_kway(g, 1), np.zeros(g.nrows, np.int32))


def test_partition_order_is_permutation_with_low_halo_cut():
    g = _planted(n=2048, blocks=8, deg=8)
    nd = 4
    order = partition_order(g, nd)
    assert np.array_equal(np.sort(order), np.arange(g.nrows))
    # contiguous equal ranges of the REORDERED graph = the partition
    from pygim_tpu.core.cluster import relabel

    rg = relabel(g, order)
    contig = (np.arange(g.nrows) * nd // g.nrows).astype(np.int32)
    base = (np.arange(g.nrows) * nd // g.nrows).astype(np.int32)
    assert edge_cut_fraction(rg, contig) < 0.7 * edge_cut_fraction(g, base)


def test_halo_metis_order_matches_oracle():
    """order='metis' through the halo layout: numerics must be exact."""
    import jax.numpy as jnp

    from pygim_tpu.ops.reference import spmm_coo_oracle
    from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo

    g = _planted(n=512, blocks=8, deg=6)
    x = np.random.default_rng(1).standard_normal((512, 16)).astype(np.float32)
    halo = prepare_spmm_halo(g, make_node_mesh(4), order="metis")
    out = np.asarray(halo.mul(jnp.asarray(x)))
    ref = np.asarray(
        spmm_coo_oracle(g.rows, g.cols, g.vals, jnp.asarray(x), g.nrows)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_metis_order_shrinks_halo_exchange():
    """The partitioner's point on the halo layout: a community-aware
    order must cut the exchanged-row volume on clustered graphs."""
    from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo

    g = _planted(n=4096, blocks=16, deg=8)
    mesh = make_node_mesh(4)
    base = prepare_spmm_halo(g, mesh, exchange="ring")
    ordered = prepare_spmm_halo(g, mesh, exchange="ring", order="metis")
    assert ordered.request_rows < 0.7 * base.request_rows, (
        ordered.request_rows, base.request_rows,
    )


def test_halo_auto_order_picks_by_measured_cut():
    """order='auto' keeps metis only when it beats the contiguous cut:
    community graphs → metis; id-local graphs (R-MAT) → none."""
    from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo

    mesh = make_node_mesh(4)
    comm = prepare_spmm_halo(
        _planted(n=2048, blocks=16, deg=8), mesh, exchange="ring",
        order="auto",
    )
    assert comm.order_choice == "metis"
    rmat = load_dataset("rmat-2048-16384").graph
    idlocal = prepare_spmm_halo(rmat, mesh, exchange="ring", order="auto")
    assert idlocal.order_choice in ("none", "metis")  # measured choice
    if idlocal.order_choice == "none":
        assert idlocal.order is None


def test_tuner_prices_metis_order_on_community_graphs():
    """The distribution tuner's order axis: on a planted-community graph
    the metis-order halo plan must price (and win) against contiguous,
    and prepare_tuned must instantiate it."""
    import jax.numpy as jnp

    from pygim_tpu.tune import autotune
    from pygim_tpu.tune.autotuner import prepare_tuned
    from pygim_tpu.tune.space import For

    g = _planted(n=2048, blocks=16, deg=8)
    # ell-only space isolates the exchange×order choice (the hybrid
    # core + all_gather shortcut legitimately wins at toy scale)
    res = autotune(
        g, hidden=32, n_devices=8, layouts=("halo",),
        space=For("backend", ["ell"]), use_cache=False,
    )
    assert res.plan.layout == "halo"
    assert res.plan.order == "metis", res.plan.describe()
    prep = prepare_tuned(g, res)
    out = prep.mul(jnp.ones((g.nrows, 32), jnp.float32))
    assert out.shape == (g.nrows, 32)


def test_cluster_partition_metis_method():
    ds = load_dataset("rmat-4096-32768")
    from pygim_tpu.data.datasets import cluster_partition

    sub = cluster_partition(ds, part_size=1024, part_idx=0, method="metis")
    assert 0 < sub.num_nodes <= 1024 * 1.1
    assert sub.x.shape[0] == sub.num_nodes
    assert sub.graph.nrows == sub.num_nodes
