"""Cheap locality clustering for partition quality.

The reference leaned on METIS via PyG's ``ClusterData`` for its big-graph
paths (inference.py:64-73). This module supplies the same capability at
planning cost a host can afford on 100M+ edge graphs, without a METIS
dependency:

* ``rcm`` — reverse Cuthill-McKee bandwidth reduction (scipy's C
  implementation). A bandwidth-reduced order makes *contiguous* node
  ranges good clusters: most edges land near the diagonal, so the 1-D
  halo partition's cut (and the all_to_all buffer K) shrinks.
* ``lp``  — a few rounds of majority label propagation, then a stable
  sort by label: community-shaped clusters for graphs where bandwidth
  reduction is a poor proxy (e.g. strong communities with no good
  ordering).
* ``none`` — identity (the round-1 behavior: contiguous ids — exact for
  the synthetic R-MAT generators whose locality is id-correlated).

Everything returns an ``order`` array (new position → original node id);
:func:`relabel` applies it to a graph.
"""

from __future__ import annotations

import numpy as np

from pygim_tpu.core.graph import CooGraph, CsrGraph


def locality_order(graph, method: str = "rcm") -> np.ndarray:
    """Compute a locality-improving node order (position → original id)."""
    csr = graph if isinstance(graph, CsrGraph) else graph.to_csr()
    n = csr.nrows
    if method == "none":
        return np.arange(n, dtype=np.int64)
    if method == "rcm":
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        m = sp.csr_matrix(
            (np.ones(csr.nnz, dtype=np.int8), csr.colind, csr.rowptr),
            shape=(n, csr.ncols),
        )
        return np.asarray(
            reverse_cuthill_mckee(m, symmetric_mode=False), dtype=np.int64
        )
    if method == "lp":
        return _label_prop_order(csr)
    raise ValueError(f"unknown locality method {method!r}")


def _label_prop_order(csr: CsrGraph, rounds: int = 3) -> np.ndarray:
    """Majority label propagation (community-shaped clusters), then a
    stable sort by final label — nodes of one community become one
    contiguous range."""
    n = csr.nrows
    labels = np.arange(n, dtype=np.int64)
    rows_of = np.repeat(
        np.arange(n, dtype=np.int64), np.diff(csr.rowptr)
    )
    cols = csr.colind.astype(np.int64)
    for _ in range(rounds):
        # mode of neighbor labels per node: count (node, label) pairs,
        # take the label with the max count (ties → smaller label)
        pair = rows_of * n + labels[cols]
        uniq, counts = np.unique(pair, return_counts=True)
        u_node = uniq // n
        u_label = uniq % n
        # order by (node, count desc, label asc): stable argsort tricks
        sel = np.lexsort((u_label, -counts, u_node))
        u_node_s = u_node[sel]
        first = np.ones(sel.shape[0], dtype=bool)
        first[1:] = u_node_s[1:] != u_node_s[:-1]
        best_label = np.full(n, -1, dtype=np.int64)
        best_label[u_node_s[first]] = u_label[sel][first]
        keep = best_label < 0  # isolated nodes keep their label
        new = np.where(keep, labels, best_label)
        if np.array_equal(new, labels):
            break
        labels = new
    return np.argsort(labels, kind="stable").astype(np.int64)


def partition_kway(
    graph, nparts: int, tol: float = 0.03, seed: int = 0
) -> np.ndarray:
    """Multilevel k-way partition membership (int32, one part id per
    node) — the METIS-quality capability the reference gets from
    ``ClusterData`` (reference inference.py:64-73).

    The native path (native/partition_ml.cpp) runs the full multilevel
    scheme: heavy-edge-matching coarsening, greedy graph growing,
    boundary refinement under a ``tol`` balance constraint. Without the
    native library it falls back to label-propagation communities packed
    into ``nparts`` balanced bins — much weaker cuts, same interface.
    """
    csr = graph if isinstance(graph, CsrGraph) else graph.to_csr()
    if nparts <= 1:
        return np.zeros(csr.nrows, dtype=np.int32)
    from pygim_tpu.core.native import partition_kway_native

    res = partition_kway_native(
        csr.rowptr, csr.colind, nparts, tol=tol, seed=seed
    )
    if res is not None:
        return res[0]
    # fallback: LP communities → balanced first-fit-decreasing bins
    order = _label_prop_order(csr)
    n = csr.nrows
    target = -(-n // nparts)
    part = np.empty(n, dtype=np.int32)
    part[order] = np.arange(n, dtype=np.int64) // target
    return part


def partition_order(
    graph, nparts: int, tol: float = 0.02, seed: int = 0
) -> np.ndarray:
    """Node order (position → original id) that sorts nodes by their
    k-way part: contiguous equal ranges of the reordered graph then
    coincide with the partition (up to ``tol`` imbalance spill), so the
    1-D halo layout's device ranges become low-cut clusters."""
    part = partition_kway(graph, nparts, tol=tol, seed=seed)
    return np.argsort(part, kind="stable").astype(np.int64)


def edge_cut_fraction(graph, part: np.ndarray) -> float:
    """Fraction of (directed, non-self-loop) edges whose endpoints land
    in different parts — the cut-quality metric for comparing orderings."""
    coo = graph if isinstance(graph, CooGraph) else graph.to_coo()
    off = coo.rows != coo.cols
    m = int(off.sum())
    if m == 0:
        return 0.0
    return float((part[coo.rows[off]] != part[coo.cols[off]]).sum() / m)


def relabel(graph, order: np.ndarray) -> CooGraph:
    """Apply an order to a square graph: new node ``i`` = old
    ``order[i]`` (both endpoints remapped; values unchanged)."""
    coo = graph if isinstance(graph, CooGraph) else graph.to_coo()
    if coo.nrows != coo.ncols:
        raise ValueError("relabel requires a square adjacency")
    inv = np.empty(coo.nrows, dtype=np.int64)
    inv[order] = np.arange(coo.nrows)
    return CooGraph(
        rows=inv[coo.rows].astype(coo.rows.dtype),
        cols=inv[coo.cols].astype(coo.cols.dtype),
        vals=coo.vals,
        nrows=coo.nrows,
        ncols=coo.ncols,
    )
