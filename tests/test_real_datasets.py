"""PyG-free real-dataset parsers (pygim_tpu/data/real.py) against tiny
files written in the exact upstream raw formats — the loaders the
reference gets from torch_geometric/ogb (inference.py:44-91), re-built on
numpy/pickle/scipy alone."""

import gzip
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from pygim_tpu.data import load_dataset
from pygim_tpu.data.real import (
    load_ogb_nodeprop,
    load_planetoid,
    load_reddit,
    try_load_real,
)


def _write_planetoid(root, name, *, gap=False):
    """Tiny graph in the Planetoid raw format. 8 nodes: 3 train (x/y),
    allx covers 5 (train+val), 3 test in tx/ty listed by a PERMUTED
    test.index. With ``gap=True`` one test id is skipped (citeseer's
    isolated-node quirk): tx holds only 2 rows for ids {5, 7}."""
    d = root / name.capitalize() / "raw"
    d.mkdir(parents=True)
    f = 4
    rng = np.random.default_rng(0)
    allx = sp.csr_matrix(rng.random((5, f)).astype(np.float32))
    x = allx[:3]
    ally = np.eye(3, dtype=np.int32)[rng.integers(0, 3, 5)]
    y = ally[:3]
    if gap:
        test_ids = np.array([7, 5])  # permuted; id 6 missing from tx/ty
        tx = sp.csr_matrix(rng.random((2, f)).astype(np.float32))
        ty = np.eye(3, dtype=np.int32)[rng.integers(0, 3, 2)]
    else:
        test_ids = np.array([7, 5, 6])  # permuted order
        tx = sp.csr_matrix(rng.random((3, f)).astype(np.float32))
        ty = np.eye(3, dtype=np.int32)[rng.integers(0, 3, 3)]
    graph = {0: [1, 2], 1: [0], 2: [0, 7], 5: [6], 6: [5], 7: [2]}
    for ext, obj in [("x", x), ("tx", tx), ("allx", allx), ("y", y),
                     ("ty", ty), ("ally", ally), ("graph", graph)]:
        with open(d / f"ind.{name}.{ext}", "wb") as fh:
            pickle.dump(obj, fh, protocol=2)
    np.savetxt(d / f"ind.{name}.test.index", test_ids, fmt="%d")
    return tx, ty, test_ids


def test_planetoid_roundtrip(tmp_path):
    tx, ty, test_ids = _write_planetoid(tmp_path, "pubmed")
    graph, x, y, train, val, test = load_planetoid(str(tmp_path), "pubmed")
    assert x.shape == (8, 4)
    # permuted test rows land at their real node ids
    txd = np.asarray(tx.todense())
    for k, nid in enumerate(test_ids):
        np.testing.assert_allclose(x[nid], txd[k])
        assert y[nid] == ty[k].argmax()
    assert train.sum() == 3 and train[:3].all()
    assert set(np.where(test)[0]) == set(test_ids.tolist())
    # adjacency is symmetrized + deduped, row=dst: edge 2->7 from graph[7]
    assert graph.nrows == 8
    pairs = set(zip(graph.rows.tolist(), graph.cols.tolist()))
    assert (7, 2) in pairs and (2, 7) in pairs
    assert (0, 1) in pairs and (1, 0) in pairs
    assert len(pairs) == graph.nnz  # deduped


def test_planetoid_citeseer_gap(tmp_path):
    """The citeseer isolated-test-node gap: missing ids become zero rows."""
    tx, ty, test_ids = _write_planetoid(tmp_path, "citeseer", gap=True)
    graph, x, y, train, val, test = load_planetoid(str(tmp_path), "citeseer")
    assert x.shape == (8, 4)
    txd = np.asarray(tx.todense())
    np.testing.assert_allclose(x[7], txd[0])
    np.testing.assert_allclose(x[5], txd[1])
    np.testing.assert_allclose(x[6], 0.0)  # the gap node
    assert not test[6] and test[5] and test[7]


def test_reddit_raw(tmp_path):
    d = tmp_path / "Reddit" / "raw"
    d.mkdir(parents=True)
    n, f = 10, 6
    rng = np.random.default_rng(1)
    feat = rng.random((n, f)).astype(np.float32)
    label = rng.integers(0, 4, n)
    types = np.array([1, 1, 1, 1, 2, 2, 3, 3, 3, 3])
    np.savez(d / "reddit_data.npz", feature=feat, label=label,
             node_types=types)
    adj = sp.random(n, n, density=0.3, random_state=2, format="coo")
    sp.save_npz(d / "reddit_graph.npz", adj.tocsr())
    graph, x, y, train, val, test = load_reddit(str(tmp_path))
    np.testing.assert_allclose(x, feat)
    assert train.sum() == 4 and test.sum() == 4
    # adjacency transposed into adj_t (row = destination)
    pairs = set(zip(graph.rows.tolist(), graph.cols.tolist()))
    assert pairs == set(zip(adj.col.tolist(), adj.row.tolist()))


def _write_ogb(root, name="ogbn-arxiv", scheme="time"):
    raw = root / name.replace("-", "_") / "raw"
    raw.mkdir(parents=True)
    n, f = 9, 5
    rng = np.random.default_rng(3)
    edges = np.array([[0, 1], [1, 2], [2, 0], [3, 4], [8, 7]])
    feat = rng.random((n, f)).astype(np.float32)
    label = rng.integers(0, 3, n)

    def gz(path, arr, fmt):
        with gzip.open(path, "wt") as fh:
            np.savetxt(fh, arr, fmt=fmt, delimiter=",")

    gz(raw / "edge.csv.gz", edges, "%d")
    gz(raw / "node-feat.csv.gz", feat, "%.6f")
    gz(raw / "node-label.csv.gz", label.reshape(-1, 1), "%d")
    gz(raw / "num-node-list.csv.gz", np.array([[n]]), "%d")
    split = root / name.replace("-", "_") / "split" / scheme
    split.mkdir(parents=True)
    gz(split / "train.csv.gz", np.array([[0], [1], [2]]), "%d")
    gz(split / "valid.csv.gz", np.array([[3]]), "%d")
    gz(split / "test.csv.gz", np.array([[4], [8]]), "%d")
    return edges, feat, label


def test_ogb_nodeprop_raw(tmp_path):
    edges, feat, label = _write_ogb(tmp_path)
    graph, x, y, train, val, test = load_ogb_nodeprop(
        str(tmp_path), "ogbn-arxiv"
    )
    np.testing.assert_allclose(x, feat, atol=1e-6)
    np.testing.assert_array_equal(y, label)
    # (src, dst) → adj_t rows are destinations
    pairs = set(zip(graph.rows.tolist(), graph.cols.tolist()))
    assert pairs == set(zip(edges[:, 1].tolist(), edges[:, 0].tolist()))
    assert train.sum() == 3 and val.sum() == 1
    assert set(np.where(test)[0]) == {4, 8}


def test_load_dataset_prefers_real_files(tmp_path):
    """load_dataset picks up raw files with NO torch_geometric import and
    marks the result real (synthetic=False)."""
    _write_planetoid(tmp_path, "pubmed")
    ds = load_dataset("pubmed", root=str(tmp_path))
    assert not ds.synthetic
    assert ds.num_nodes == 8 and ds.x.shape[1] == 4
    # and the ledger marks provenance (runners report data_source)
    from pygim_tpu.bench.runners import run_inference_benchmark

    res = run_inference_benchmark(ds, hidden=8, repeat=1)
    assert res["data_source"] == "real"


def test_load_dataset_synthetic_marked(tmp_path):
    ds = load_dataset("tiny", root=str(tmp_path))
    assert ds.synthetic
    from pygim_tpu.bench.runners import run_spmm_benchmark

    res = run_spmm_benchmark(ds, hidden=8, repeat=1)
    assert res["data_source"] == "synthetic"


def test_try_load_real_absent_is_none(tmp_path):
    assert try_load_real("pubmed", str(tmp_path)) is None
    assert try_load_real("ogbn-arxiv", str(tmp_path)) is None
    assert try_load_real("reddit", str(tmp_path)) is None


def test_malformed_real_raises(tmp_path):
    """Malformed files fail loudly rather than silently going synthetic."""
    d = tmp_path / "Pubmed" / "raw"
    d.mkdir(parents=True)
    (d / "ind.pubmed.graph").write_bytes(b"not a pickle")
    with pytest.raises(Exception):
        load_dataset("pubmed", root=str(tmp_path))
