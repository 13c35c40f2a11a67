"""Direct (PyG-free) loaders for the reference's real datasets.

The reference loads Planetoid/Reddit/ogbn-* through torch_geometric + ogb
(/root/reference/inference.py:44-91). Neither package is installed here and
the sandbox has no network egress, so these parsers read the packages' RAW
on-disk formats directly with numpy/pickle/scipy — no torch_geometric or
ogb import anywhere. Drop the raw files under the data root (layouts below)
and ``load_dataset`` picks them up automatically; otherwise it falls back
to the spec-matched synthetic stand-ins (datasets.py) and every benchmark
record is explicitly marked ``synthetic``.

Supported raw layouts (exactly what the upstream downloads produce):

* Planetoid (cora/citeseer/pubmed) — ``<root>/<Name>/raw/ind.<name>.{x,tx,
  allx,y,ty,ally,graph,test.index}``: pickled scipy CSR feature blocks,
  one-hot label blocks, a neighbor-dict adjacency, and the permuted test
  index file (including the citeseer isolated-test-node gap handling).
* Reddit (PyG) — ``<root>/Reddit/raw/reddit_data.npz`` (feature/label/
  node_types) + ``reddit_graph.npz`` (scipy sparse adjacency).
* OGB node-prop (ogbn-arxiv/ogbn-products/...) — ``<root>/<name with
  underscores>/raw/{edge.csv.gz,node-feat.csv.gz,node-label.csv.gz,
  num-node-list.csv.gz}`` + ``split/<scheme>/{train,test}.csv.gz``.

``python -m pygim_tpu.data.fetch <name>`` attempts the official downloads
and records the exact URLs + errors (docs/DATASETS.md carries this
sandbox's attempt log).
"""

from __future__ import annotations

import gzip
import os
import pickle
from pathlib import Path
from typing import Optional

import numpy as np

from pygim_tpu.core.graph import CooGraph

PLANETOID_NAMES = ("cora", "citeseer", "pubmed")


def _pickle_load(path: Path):
    with open(path, "rb") as f:
        # upstream files were pickled under py2; latin1 decodes their bytes
        return pickle.load(f, encoding="latin1")


def planetoid_dir(root: str, name: str) -> Path:
    return Path(root) / name.capitalize() / "raw"


def load_planetoid(root: str, name: str):
    """Parse the Planetoid ``ind.<name>.*`` raw files (the format behind
    torch_geometric.datasets.Planetoid — reference inference.py:50-55).

    Returns ``(graph, x, y, train_mask, val_mask, test_mask)`` with the
    standard split semantics: train = the first ``len(y)`` nodes, val = the
    next 500, test = the (permuted) ``test.index`` entries. Citeseer's raw
    test block skips isolated nodes; the gap rows are re-inserted as
    zero-feature/zero-label nodes exactly as the upstream loader does.
    """
    name = name.lower()
    d = planetoid_dir(root, name)
    xs, ys, tx, ty, allx, ally = (
        _pickle_load(d / f"ind.{name}.{ext}")
        for ext in ("x", "y", "tx", "ty", "allx", "ally")
    )
    graph_dict = _pickle_load(d / f"ind.{name}.graph")
    test_idx = np.loadtxt(d / f"ind.{name}.test.index", dtype=np.int64)
    test_sorted = np.sort(test_idx)

    import scipy.sparse as sp

    lo, hi = int(test_sorted[0]), int(test_sorted[-1])
    if hi - lo + 1 > len(test_idx):
        # citeseer: isolated test nodes are missing from tx/ty — re-insert
        # them as zero rows so node ids stay dense
        full = hi - lo + 1
        tx_full = sp.lil_matrix((full, xs.shape[1]), dtype=np.float32)
        tx_full[test_sorted - lo, :] = tx
        tx = tx_full.tocsr()
        ty_full = np.zeros((full, ty.shape[1]), dtype=ty.dtype)
        ty_full[test_sorted - lo, :] = ty
        ty = ty_full

    features = sp.vstack((allx, tx)).tolil()
    # the raw test rows are stored in permuted order; put each at its
    # real node id
    features[test_idx, :] = features[test_sorted, :]
    x = np.asarray(features.todense(), dtype=np.float32)
    labels = np.vstack((ally, ty))
    labels[test_idx, :] = labels[test_sorted, :]
    y = labels.argmax(axis=1).astype(np.int32)

    n = x.shape[0]
    src, dst = [], []
    for u, nbrs in graph_dict.items():
        for v in nbrs:
            src.append(u)
            dst.append(v)
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    keep = (src < n) & (dst < n) & (src != dst)
    src, dst = src[keep], dst[keep]
    # symmetrize + dedup (the dict lists both directions for most edges
    # but not all); adj_t convention: row = destination
    und = np.unique(
        np.stack([np.concatenate([dst, src]), np.concatenate([src, dst])]),
        axis=1,
    )
    graph = CooGraph.from_edges(und[0], und[1], nrows=n, ncols=n)

    train = np.zeros(n, dtype=bool)
    train[: len(ys)] = True
    val = np.zeros(n, dtype=bool)
    val[len(ys): len(ys) + 500] = True
    test = np.zeros(n, dtype=bool)
    test[test_sorted] = True
    return graph, x, y, train, val, test


def reddit_dir(root: str) -> Path:
    return Path(root) / "Reddit" / "raw"


def load_reddit(root: str):
    """Parse PyG's Reddit raw files: ``reddit_data.npz`` (feature, label,
    node_types ∈ {1=train, 2=val, 3=test}) + ``reddit_graph.npz`` (scipy
    sparse adjacency). Reference: inference.py:56-58."""
    import scipy.sparse as sp

    d = reddit_dir(root)
    data = np.load(d / "reddit_data.npz")
    adj = sp.load_npz(d / "reddit_graph.npz")
    x = data["feature"].astype(np.float32)
    y = data["label"].astype(np.int32)
    types = data["node_types"]
    graph = CooGraph.from_scipy(adj.T)  # adj_t: row = destination
    return graph, x, y, types == 1, types == 2, types == 3


def ogb_dir(root: str, name: str) -> Path:
    return Path(root) / name.replace("-", "_") / "raw"


def _read_csv_gz(path: Path, dtype, chunk_bytes: int = 1 << 26) -> np.ndarray:
    """Numeric csv.gz reader that stays practical at OGB scale.

    ``np.loadtxt`` parses line-by-line in Python — ogbn-products'
    edge.csv.gz is ~124M lines, hours of parse time (VERDICT r4). Use
    pandas' C reader when available; otherwise stream ~64 MB decompressed
    blocks and parse each with one C-level ``np.fromstring`` pass
    (newlines folded into the separator). Values round-trip exactly
    through float64 for every integer id below 2^53."""
    try:
        import pandas as pd

        try:
            df = pd.read_csv(path, header=None, dtype=dtype)
        except pd.errors.EmptyDataError:
            return np.empty((0, 1), dtype=dtype)
        return np.ascontiguousarray(df.to_numpy())
    except ImportError:
        pass
    parts: list[np.ndarray] = []
    ncols, rem = None, b""
    with gzip.open(path, "rb") as f:
        while True:
            block = f.read(chunk_bytes)
            if not block:
                break
            block = rem + block
            cut = block.rfind(b"\n")
            if cut < 0:
                rem = block
                continue
            rem, text = block[cut + 1 :], block[:cut]
            if ncols is None:
                first = text.split(b"\n", 1)[0]
                ncols = first.count(b",") + 1
            parts.append(
                np.fromstring(  # text mode (sep!=''): supported C path
                    text.replace(b"\n", b","), dtype=np.float64, sep=","
                )
            )
    if rem.strip():
        if ncols is None:
            ncols = rem.count(b",") + 1
        parts.append(
            np.fromstring(
                rem.replace(b"\n", b","), dtype=np.float64, sep=","
            )
        )
    flat = (
        np.concatenate(parts) if parts else np.empty((0,), np.float64)
    )
    return flat.reshape(-1, ncols or 1).astype(dtype)


def load_ogb_nodeprop(root: str, name: str):
    """Parse an OGB node-property-prediction dataset from its raw csv.gz
    layout (what ``ogb.nodeproppred.PygNodePropPredDataset`` extracts —
    reference inference.py:59-63, 74-79). Split indices are read from
    ``split/<scheme>/{train,valid,test}.csv.gz`` (scheme = time /
    sales_ranking / species — whichever directory exists)."""
    raw = ogb_dir(root, name)
    n = int(_read_csv_gz(raw / "num-node-list.csv.gz", np.int64)[0, 0])
    edges = _read_csv_gz(raw / "edge.csv.gz", np.int64)
    x = _read_csv_gz(raw / "node-feat.csv.gz", np.float32)
    y = _read_csv_gz(raw / "node-label.csv.gz", np.float32)
    y = y.reshape(n, -1)[:, 0].astype(np.int32)
    assert x.shape[0] == n, f"node-feat rows {x.shape[0]} != {n} nodes"
    # adj_t convention (row = destination); OGB edge.csv is (src, dst)
    graph = CooGraph.from_edges(edges[:, 1], edges[:, 0], nrows=n, ncols=n)

    split_root = raw.parent / "split"
    masks = {}
    for part in ("train", "valid", "test"):
        masks[part] = np.zeros(n, dtype=bool)
        for scheme in sorted(split_root.glob("*")) if split_root.exists() else []:
            p = scheme / f"{part}.csv.gz"
            if p.exists():
                idx = _read_csv_gz(p, np.int64).reshape(-1)
                masks[part][idx] = True
                break
    if not masks["test"].any():  # no split files → everything is test
        masks["test"][:] = True
    return graph, x, y, masks["train"], masks["valid"], masks["test"]


def try_load_real(name: str, root: str):
    """Load ``name`` from raw files if they exist; None otherwise.

    This is the PyG-free path — it never imports torch_geometric/ogb and
    raises only if files exist but are malformed (a malformed real dataset
    should fail loudly, not silently fall back to synthetic)."""
    name = name.lower()
    if name in PLANETOID_NAMES:
        d = planetoid_dir(root, name)
        if not (d / f"ind.{name}.graph").exists():
            return None
        graph, x, y, train, val, test = load_planetoid(root, name)
    elif name == "reddit":
        d = reddit_dir(root)
        if not (d / "reddit_data.npz").exists():
            return None
        graph, x, y, train, val, test = load_reddit(root)
    elif name.startswith("ogbn-"):
        d = ogb_dir(root, name)
        if not (d / "edge.csv.gz").exists():
            return None
        graph, x, y, train, val, test = load_ogb_nodeprop(root, name)
    else:
        return None

    from pygim_tpu.data.datasets import GraphDataset

    metric = "rocauc" if name == "ogbn-proteins" else "acc"
    return GraphDataset(
        name=name, graph=graph, x=x, y=y, train_mask=train, test_mask=test,
        num_classes=int(y.max()) + 1, synthetic=False, metric=metric,
        val_mask=val,
    )


# Official download URLs (as used by torch_geometric / ogb). Recorded here
# so `python -m pygim_tpu.data.fetch` can attempt them and report the
# exact failure in an egress-less sandbox (docs/DATASETS.md).
DOWNLOAD_URLS = {
    "pubmed": [
        "https://github.com/kimiyoung/planetoid/raw/master/data/ind.pubmed."
        + ext
        for ext in ("x", "tx", "allx", "y", "ty", "ally", "graph",
                    "test.index")
    ],
    "cora": [
        "https://github.com/kimiyoung/planetoid/raw/master/data/ind.cora."
        + ext
        for ext in ("x", "tx", "allx", "y", "ty", "ally", "graph",
                    "test.index")
    ],
    "citeseer": [
        "https://github.com/kimiyoung/planetoid/raw/master/data/"
        "ind.citeseer." + ext
        for ext in ("x", "tx", "allx", "y", "ty", "ally", "graph",
                    "test.index")
    ],
    "reddit": ["https://data.dgl.ai/dataset/reddit.zip"],
    "ogbn-arxiv": ["http://snap.stanford.edu/ogb/data/nodeproppred/arxiv.zip"],
    "ogbn-products": [
        "http://snap.stanford.edu/ogb/data/nodeproppred/products.zip"
    ],
    "ogbn-proteins": [
        "http://snap.stanford.edu/ogb/data/nodeproppred/proteins.zip"
    ],
    "ogbn-papers100m": [
        "http://snap.stanford.edu/ogb/data/nodeproppred/papers100M-bin.zip"
    ],
}


def fetch(name: str, root: str, timeout: float = 30.0) -> list[str]:
    """Attempt the official downloads for ``name`` into ``root``. Returns
    a log of attempts; raises nothing (an egress-less sandbox records the
    errors instead)."""
    import urllib.request

    name = name.lower()
    log = []
    urls = DOWNLOAD_URLS.get(name)
    if not urls:
        return [f"{name}: no download URL registered"]
    for url in urls:
        dest = Path(root) / "downloads" / name / os.path.basename(url)
        dest.parent.mkdir(parents=True, exist_ok=True)
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r:  # noqa: S310
                dest.write_bytes(r.read())
            log.append(f"OK   {url} -> {dest}")
        except Exception as e:  # noqa: BLE001
            log.append(f"FAIL {url}: {type(e).__name__}: {e}")
    return log
