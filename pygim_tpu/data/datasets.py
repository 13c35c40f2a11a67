"""Datasets: PyG/OGB-compatible loading with synthetic fallbacks.

The reference loads Planetoid/Reddit/AmazonProducts/ogbn-* through PyG/OGB
(inference.py:44-91) and SuiteSparse .mtx matrices through its mtx reader
(utils.hpp:16-71). Here:

* If ``torch_geometric``/``ogb`` are importable and data is on disk, the
  real datasets are used (gated import — never required).
* Otherwise each known dataset name resolves to a **spec-matched synthetic
  stand-in**: an R-MAT graph with the same node count, edge count, feature
  width and class count, cached on disk as .npz so repeated benchmark runs
  pay generation cost once.
* ``load_mtx`` reads MatrixMarket via scipy.

Graph sizes follow the published dataset statistics; features are random
(the reference's spmm benchmark also uses random features,
spmm_test.py:70, and its accuracy numbers are of untrained models,
SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional

import numpy as np

from pygim_tpu.core.graph import CooGraph

# name -> (num_nodes, num_edges(directed), feat_dim, num_classes)
DATASET_SPECS = {
    "pubmed": (19_717, 88_651, 500, 3),
    "cora": (2_708, 10_556, 1_433, 7),
    "citeseer": (3_327, 9_104, 3_703, 6),
    "reddit": (232_965, 114_615_892, 602, 41),
    "ogbn-arxiv": (169_343, 1_166_243, 128, 40),
    "ogbn-proteins": (132_534, 79_122_504, 8, 112),
    "ogbn-products": (2_449_029, 123_718_280, 100, 47),
    "amazonproducts": (1_569_960, 264_339_468, 200, 107),
    # small synthetic configs for tests/CI
    "tiny": (1_000, 10_000, 32, 4),
    "small": (20_000, 400_000, 64, 8),
}

_DEFAULT_CACHE = os.environ.get(
    "PYGIM_TPU_DATA", os.path.join(os.path.expanduser("~"), ".cache", "pygim_tpu")
)


@dataclasses.dataclass
class GraphDataset:
    name: str
    graph: CooGraph          # adjacency (row = destination, col = source)
    x: np.ndarray            # node features (N, F)
    y: np.ndarray            # labels (N,)
    train_mask: np.ndarray
    test_mask: np.ndarray
    num_classes: int
    synthetic: bool
    metric: str = "acc"      # acc | rocauc | f1 (reference: OGB Evaluator /
                             # sklearn F1, inference.py:27-41)
    val_mask: "np.ndarray | None" = None  # held-out split (early stopping);
                             # real loaders populate it, stand-ins may not

    @property
    def num_nodes(self) -> int:
        return self.graph.nrows

    @property
    def num_edges(self) -> int:
        return self.graph.nnz


def rmat_edges(
    n: int, e: int, *, a=0.57, b=0.19, c=0.19, seed=0, unique=False
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized R-MAT edge generation (power-law degree skew like real
    web/social graphs). Returns (rows, cols); by default duplicates are
    kept (a multigraph matching the requested TOTAL edge count — at
    reddit scale ~1.45 draws per unique edge). ``unique=True`` instead
    rejection-samples until ``e`` DISTINCT edges exist, modelling real
    datasets whose published edge counts are unique pairs (real Reddit's
    114.6M edges have no duplicates) — see docs/PERF.md "stand-in
    fidelity". First-occurrence order is kept so the power-law skew of
    the accepted stream matches a plain R-MAT draw."""
    rng = np.random.default_rng(seed)
    scale = max(1, int(np.ceil(np.log2(max(n, 2)))))

    def _draw(m: int) -> tuple[np.ndarray, np.ndarray]:
        rows = np.zeros(m, dtype=np.int64)
        cols = np.zeros(m, dtype=np.int64)
        for _ in range(scale):
            r = rng.random(m)
            rows = rows * 2 + (r >= a + b).astype(np.int64)
            cols = cols * 2 + (
                ((r >= a) & (r < a + b)) | (r >= a + b + c)
            ).astype(np.int64)
        return (rows % n).astype(np.int32), (cols % n).astype(np.int32)

    if not unique:
        return _draw(e)
    if e > n * n:
        raise ValueError(f"cannot place {e} unique edges in an {n}x{n} graph")
    seen = np.empty(0, dtype=np.int64)  # sorted accepted keys
    out_r: list = []
    out_c: list = []
    have = 0
    stalled = 0
    # Cap per-batch host RAM: each drawn edge costs ~40 B of int64/float64
    # temporaries (rows, cols, rng draws, keys, argsort workspace), so 64M
    # edges/batch ≈ 2.5 GB transient — loop more batches instead of
    # materializing ~1.7*e at amazonproducts scale (~15-20 GB).
    batch_cap = 64 * 2**20
    while have < e:
        m = min(int((e - have) * 1.7) + 1024, batch_cap)
        br, bc = _draw(m)  # NOT r/c — those would shadow _draw's params
        k = br.astype(np.int64) * n + bc
        # first occurrence within the batch, in generation order
        _, first = np.unique(k, return_index=True)
        first.sort()
        kf = k[first]
        if seen.size:  # drop keys already accepted in earlier batches
            pos = np.searchsorted(seen, kf)
            dup = (pos < seen.size) & (seen[np.minimum(pos, seen.size - 1)] == kf)
            first = first[~dup]
        take = first[: e - have]
        out_r.append(br[take])
        out_c.append(bc[take])
        # linear merge of two sorted key arrays (np.insert at searchsorted
        # positions) — a full np.sort of `seen` per batch would make the
        # long tail O(batches * E log E) at 100M+ edges.
        new_sorted = np.sort(k[take])
        seen = np.insert(seen, np.searchsorted(seen, new_sorted), new_sorted)
        have += take.size
        # R-MAT mass concentrates in few cells: near-saturating requests
        # (e → n*n reachable mass) can accept ~nothing per batch without
        # ever being strictly impossible — fail loudly instead of looping
        # forever.
        # Only zero-progress batches count as stalled: a batch that
        # accepts ANY new edges is converging (slowly near saturation,
        # but finitely), and aborting it would reject feasible requests
        # (the round-4 review caught the old <m//1024 threshold doing
        # exactly that).
        stalled = stalled + 1 if take.size == 0 else 0
        if stalled >= 8:
            raise RuntimeError(
                f"rmat_edges(unique=True) stalled at {have}/{e} unique "
                f"edges after {stalled} zero-progress batches — the "
                f"request saturates this R-MAT skew's reachable cells "
                f"(a={a}, b={b}, c={c}); lower e or the skew"
            )
    return np.concatenate(out_r), np.concatenate(out_c)


def _synthesize(name: str, spec, seed=0, unique=False) -> GraphDataset:
    n, e, f, ccount = spec
    rows, cols = rmat_edges(n, e, seed=seed, unique=unique)
    rng = np.random.default_rng(seed + 1)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, ccount, n).astype(np.int32)
    train = np.zeros(n, dtype=bool)
    train[rng.choice(n, max(1, n // 10), replace=False)] = True
    test = ~train
    graph = CooGraph.from_edges(rows, cols, nrows=n, ncols=n, dtype="float32")
    metric = "rocauc" if name == "ogbn-proteins" else "acc"
    return GraphDataset(
        name=name, graph=graph, x=x, y=y, train_mask=train,
        test_mask=test, num_classes=ccount, synthetic=True, metric=metric,
    )


def _synthesize_block(name: str, n: int, e: int, b: int, seed=0):
    """Block-community synthetic graph: ``n`` nodes in ``n/b`` communities
    of ``b`` consecutive internal ids, 90% of edges intra-community, the
    rest global — then node ids SCRAMBLED by a fixed permutation so the
    structure is latent (a locality order such as RCM must recover it,
    exactly the shipped clustering/BCSR pipeline's job)."""
    rng = np.random.default_rng(seed)
    b = max(1, min(b, n))
    e_in = int(e * 0.9)
    comm = rng.integers(0, max(1, n // b), e_in) * b
    rows = np.concatenate([
        comm + rng.integers(0, b, e_in),
        rng.integers(0, n, e - e_in),
    ])
    cols = np.concatenate([
        comm + rng.integers(0, b, e_in),
        rng.integers(0, n, e - e_in),
    ])
    perm = rng.permutation(n).astype(np.int64)
    rows, cols = perm[rows], perm[cols]
    graph = CooGraph.from_edges(rows, cols, nrows=n, ncols=n, dtype="float32")
    f, ccount = 64, 16
    rng2 = np.random.default_rng(seed + 1)
    x = rng2.standard_normal((n, f)).astype(np.float32)
    y = rng2.integers(0, ccount, n).astype(np.int32)
    train = np.zeros(n, dtype=bool)
    train[rng2.choice(n, max(1, n // 10), replace=False)] = True
    return GraphDataset(
        name=name, graph=graph, x=x, y=y, train_mask=train,
        test_mask=~train, num_classes=ccount, synthetic=True,
    )


def _synthesize_planted(name: str, n: int, e: int, c: int, seed=0):
    """Planted-partition synthetic with LEARNABLE structure: labels are
    communities, 90% of edges are intra-class (homophily), features are a
    noisy class signature. A 2-layer GCN trains to high accuracy — the
    dataset behind the trained-accuracy parity experiments (the random-
    label R-MAT stand-ins are unlearnable by construction, so accuracy
    there is an integration signal only)."""
    rng = np.random.default_rng(seed)
    c = max(2, c)
    y = rng.integers(0, c, n).astype(np.int32)
    e_in = int(e * 0.9)
    # intra-class edges: pick a class per edge (weighted by class size),
    # then two members of it — vectorized via per-class member tables
    members = [np.where(y == k)[0] for k in range(c)]
    sizes = np.array([len(m) for m in members])
    ok = sizes > 0
    probs = np.where(ok, sizes, 0) / sizes[ok].sum()
    cls = rng.choice(c, e_in, p=probs)
    r_in = np.empty(e_in, dtype=np.int64)
    c_in = np.empty(e_in, dtype=np.int64)
    for k in range(c):
        m = cls == k
        if m.any() and len(members[k]):
            r_in[m] = rng.choice(members[k], m.sum())
            c_in[m] = rng.choice(members[k], m.sum())
    rows = np.concatenate([r_in, rng.integers(0, n, e - e_in)])
    cols = np.concatenate([c_in, rng.integers(0, n, e - e_in)])
    f = 32
    sig = rng.standard_normal((c, f)).astype(np.float32)
    x = sig[y] + 1.5 * rng.standard_normal((n, f)).astype(np.float32)
    train = np.zeros(n, dtype=bool)
    train[rng.choice(n, max(1, n // 10), replace=False)] = True
    graph = CooGraph.from_edges(rows, cols, nrows=n, ncols=n, dtype="float32")
    return GraphDataset(
        name=name, graph=graph, x=x, y=y, train_mask=train,
        test_mask=~train, num_classes=c, synthetic=True,
    )


def _cache_path(name: str, root: str) -> Path:
    return Path(root) / f"{name}.npz"


def _save_cache(ds: GraphDataset, path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(
        tmp, rows=ds.graph.rows, cols=ds.graph.cols, x=ds.x, y=ds.y,
        train_mask=ds.train_mask, test_mask=ds.test_mask,
        num_classes=ds.num_classes, synthetic=ds.synthetic,
        nrows=ds.graph.nrows,
    )
    os.replace(tmp, path)


def _load_cache(name: str, path: Path) -> GraphDataset:
    z = np.load(path)
    n = int(z["nrows"])
    graph = CooGraph.from_edges(
        z["rows"], z["cols"], nrows=n, ncols=n, dtype="float32"
    )
    return GraphDataset(
        name=name, graph=graph, x=z["x"], y=z["y"],
        train_mask=z["train_mask"], test_mask=z["test_mask"],
        num_classes=int(z["num_classes"]), synthetic=bool(z["synthetic"]),
    )


def _try_real_dataset(name: str, root: str) -> Optional[GraphDataset]:
    """Real PyG/OGB loading, mirroring inference.py:44-91 — gated import."""
    try:
        import torch  # noqa: F401
        import torch_geometric  # noqa: F401
    except ImportError:
        return None
    try:
        from torch_geometric.datasets import Planetoid, Reddit

        if name in ("cora", "citeseer", "pubmed"):
            ds = Planetoid(root=root, name=name.capitalize())
        elif name == "reddit":
            ds = Reddit(root=os.path.join(root, "Reddit"))
        elif name.startswith("ogbn-"):
            from ogb.nodeproppred import PygNodePropPredDataset

            ds = PygNodePropPredDataset(name=name, root=root)
        else:
            return None
        data = ds[0]
        ei = data.edge_index.numpy()
        n = data.num_nodes
        graph = CooGraph.from_edges(
            ei[1], ei[0], nrows=n, ncols=n, dtype="float32"
        )  # adj_t convention: row=dst
        y = data.y.numpy().reshape(-1).astype(np.int32)
        train = (
            data.train_mask.numpy()
            if hasattr(data, "train_mask")
            else np.ones(n, dtype=bool)
        )
        test = (
            data.test_mask.numpy()
            if hasattr(data, "test_mask")
            else np.ones(n, dtype=bool)
        )
        return GraphDataset(
            name=name, graph=graph, x=data.x.numpy().astype(np.float32),
            y=y, train_mask=train, test_mask=test,
            num_classes=int(y.max()) + 1, synthetic=False,
        )
    except Exception:
        return None


def load_dataset(
    name: str, root: str = _DEFAULT_CACHE, *, seed: int = 0,
    use_cache: bool = True,
) -> GraphDataset:
    """Load ``name`` — real if possible, synthetic stand-in otherwise.

    Also accepts parametric names ``rmat-<n>-<e>`` for ad-hoc scaling runs.
    """
    name = name.lower()
    # '-uniq' suffix: simple-graph variant of any synthetic stand-in —
    # rejection-sampled until the published edge count is met with NO
    # duplicate edges (real datasets publish unique-pair counts; the
    # default R-MAT stand-ins are ~1.45x multigraphs at reddit scale,
    # which prepare-time merging then shrinks — the -uniq variant keeps
    # the stored-edge workload honest; ROADMAP "generator fidelity").
    unique = name.endswith("-uniq")
    if unique:
        base = name[: -len("-uniq")]
        if base.startswith("rmat-"):
            _, ns, es = base.split("-")
            return _synthesize(name, (int(ns), int(es), 64, 16), seed,
                               unique=True)
        if base not in DATASET_SPECS:
            raise KeyError(f"unknown dataset {name!r} "
                           f"(base {base!r} has no synthetic spec)")
        path = _cache_path(name + "-sim", root)
        if use_cache and path.exists():
            return _load_cache(name, path)
        ds = _synthesize(name, DATASET_SPECS[base], seed, unique=True)
        if use_cache:
            _save_cache(ds, path)
        return ds
    if name.startswith("rmat-"):
        _, ns, es = name.split("-")
        spec = (int(ns), int(es), 64, 16)
        return _synthesize(name, spec, seed)
    if name.startswith("brmat-"):
        # block-community variant 'brmat-<n>-<e>-<b>': communities of
        # ``b`` nodes under a hidden permutation, 90% of edges intra-
        # community — the structured counterpart of the rmat names.
        # Halo/clustering/BCSR experiments need a graph whose mid-band
        # is genuinely tile-dense once a locality order recovers the
        # communities (R-MAT tails are Erdős–Rényi at block granularity,
        # docs/PERF.md block-ELL study).
        _, ns, es, bs = name.split("-")
        return _synthesize_block(name, int(ns), int(es), int(bs), seed)
    if name.startswith("planted-"):
        # learnable synthetic 'planted-<n>-<e>-<classes>': homophilous
        # planted partition + class-signature features (training parity
        # experiments)
        _, ns, es, cs = name.split("-")
        return _synthesize_planted(name, int(ns), int(es), int(cs), seed)
    if name.endswith(".mtx"):
        # SuiteSparse matrices as datasets (reference spmm_test.py:82
        # '--dataset pkustk08.mtx'): graph from the file, synthetic
        # features/labels sized to it
        g = load_mtx(os.path.join(root, name))
        if g.nrows != g.ncols:  # pad square for adjacency semantics
            n = max(g.nrows, g.ncols)
            g = CooGraph(
                rows=g.rows, cols=g.cols, vals=g.vals, nrows=n, ncols=n
            )
        rng = np.random.default_rng(seed)
        n = g.nrows
        return GraphDataset(
            name=name, graph=g,
            x=rng.standard_normal((n, 64)).astype(np.float32),
            y=rng.integers(0, 4, n).astype(np.int32),
            train_mask=np.zeros(n, dtype=bool),
            test_mask=np.ones(n, dtype=bool),
            num_classes=4, synthetic=True,
        )
    if name not in DATASET_SPECS:
        raise KeyError(
            f"unknown dataset {name!r}; known: {sorted(DATASET_SPECS)}"
        )
    from pygim_tpu.data.real import try_load_real

    # PyG-free direct parsers first (work from raw files alone), then the
    # torch_geometric/ogb path if those packages happen to be importable
    real = try_load_real(name, root) or _try_real_dataset(name, root)
    if real is not None:
        return real
    path = _cache_path(name + "-sim", root)
    if use_cache and path.exists():
        return _load_cache(name, path)
    ds = _synthesize(name, DATASET_SPECS[name], seed)
    if use_cache:
        _save_cache(ds, path)
    return ds


def load_mtx(path: str, dtype: str = "float32") -> CooGraph:
    """MatrixMarket reader (SuiteSparse sets, configs.py:7-14) via scipy."""
    import scipy.io

    return CooGraph.from_scipy(scipy.io.mmread(path), dtype=dtype)


def cluster_partition(
    ds: GraphDataset, part_size: int, part_idx: int = 1,
    method: str = "none",
) -> GraphDataset:
    """Cluster partitioning — the reference's METIS-based ``ClusterData``
    with ~500k-node parts where only partition index 1 is used
    (inference.py:64-73). ``method``:

    * ``"none"`` — contiguous node ranges (exact for the synthetic R-MAT
      generators whose locality is id-correlated).
    * ``"rcm"`` / ``"lp"`` — cluster by a locality order first
      (core/cluster.py), so each part is a genuine community/low-cut
      cluster on graphs whose node ids carry no locality.
    * ``"metis"`` — the real thing: multilevel k-way partition
      (core/cluster.py ``partition_kway``, native/partition_ml.cpp),
      matching the reference's METIS ClusterData quality.
    """
    n = ds.num_nodes
    nparts = max(1, -(-n // part_size))
    part_idx = min(part_idx, nparts - 1)
    lo = part_idx * part_size
    hi = min(n, lo + part_size)
    g = ds.graph
    if method == "metis" and nparts > 1:
        from pygim_tpu.core.cluster import partition_kway

        part = partition_kway(g, nparts)
        nodes = np.flatnonzero(part == part_idx)
        pos = np.full(n, -1, dtype=np.int64)
        pos[nodes] = np.arange(nodes.size)
        mask = (pos[g.rows] >= 0) & (pos[g.cols] >= 0)
        sub = CooGraph.from_edges(
            pos[g.rows[mask]], pos[g.cols[mask]], g.vals[mask],
            nrows=nodes.size, ncols=nodes.size,
        )
        return GraphDataset(
            name=f"{ds.name}-part{part_idx}", graph=sub, x=ds.x[nodes],
            y=ds.y[nodes], train_mask=ds.train_mask[nodes],
            test_mask=ds.test_mask[nodes], num_classes=ds.num_classes,
            synthetic=ds.synthetic,
        )
    if method != "none":
        from pygim_tpu.core.cluster import locality_order

        order = locality_order(g, method=method)
        nodes = np.sort(order[lo:hi])  # this part's original node ids
        pos = np.full(n, -1, dtype=np.int64)
        pos[nodes] = np.arange(hi - lo)
        mask = (pos[g.rows] >= 0) & (pos[g.cols] >= 0)
        sub = CooGraph.from_edges(
            pos[g.rows[mask]], pos[g.cols[mask]], g.vals[mask],
            nrows=hi - lo, ncols=hi - lo,
        )
        sl = nodes
    else:
        mask = (g.rows >= lo) & (g.rows < hi) & (g.cols >= lo) & (g.cols < hi)
        sub = CooGraph.from_edges(
            g.rows[mask] - lo, g.cols[mask] - lo, g.vals[mask],
            nrows=hi - lo, ncols=hi - lo,
        )
        sl = slice(lo, hi)
    return GraphDataset(
        name=f"{ds.name}-part{part_idx}", graph=sub, x=ds.x[sl], y=ds.y[sl],
        train_mask=ds.train_mask[sl], test_mask=ds.test_mask[sl],
        num_classes=ds.num_classes, synthetic=ds.synthetic,
    )
