"""Space DSL, cost model, autotuner (model mode — no device time)."""

import pytest

from pygim_tpu.ops.spmm import SpmmConfig
from pygim_tpu.tune import For, Table, Unit, autotune, plan_statistics
from pygim_tpu.tune.cost_model import TpuCostModel, predict_spmm_time
from tests.conftest import random_coo


def test_space_for_product():
    s = For("a", [1, 2]) * For("b", ["x", "y", "z"])
    pts = list(s)
    assert len(pts) == len(s) == 6
    assert {"a": 2, "b": "z"} in pts


def test_space_duplicate_field_rejected():
    with pytest.raises(ValueError):
        For("a", [1]) * For("a", [2])


def test_space_concat_field_check():
    s = For("a", [1]) + For("a", [2, 3])
    assert len(s) == 3
    with pytest.raises(ValueError):
        For("a", [1]) + For("b", [2])


def test_space_unit_identity():
    s = Unit() * For("a", [1, 2])
    assert list(s) == [{"a": 1}, {"a": 2}]


def test_table():
    t = Table.from_dicts([{"a": 1, "b": 2}, {"a": 3, "b": 4}])
    assert len(t) == 2 and t.fields == ("a", "b")
    with pytest.raises(ValueError):
        Table([{"a": 1}, {"b": 2}])


def test_plan_statistics_counters(rng):
    coo = random_coo(rng, nrows=3000, ncols=3000, nnz=30000)
    csr = coo.to_csr()
    stats = plan_statistics(csr, hidden=64, config=SpmmConfig(n_blocks=8))
    assert stats["n_blocks"] == 8
    assert stats["gather_bytes"] >= csr.nnz * 64 * 4
    assert stats["pad_fraction"] >= 0
    assert stats["max_nnz_per_block"] >= stats["mean_nnz_per_block"]
    # sp>1 adds psum volume
    stats2 = plan_statistics(csr, hidden=64, config=SpmmConfig(n_blocks=8), sp=4)
    assert stats2["psum_bytes"] > 0 and stats["psum_bytes"] == 0


def test_cost_model_monotonic(rng):
    coo = random_coo(rng, nrows=2000, ncols=2000, nnz=20000)
    csr = coo.to_csr()
    m = TpuCostModel.default()
    t_small = predict_spmm_time(
        plan_statistics(csr, 32, SpmmConfig(n_blocks=4)), m
    )
    t_big = predict_spmm_time(
        plan_statistics(csr, 256, SpmmConfig(n_blocks=4)), m
    )
    assert t_big > t_small  # wider dense operand costs more


def test_autotune_model_mode(rng, tmp_path, monkeypatch):
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    coo = random_coo(rng, nrows=5000, ncols=5000, nnz=50000)
    res = autotune(coo, hidden=64, use_cache=False)
    assert isinstance(res.config, SpmmConfig)
    assert res.predicted_s > 0
    assert res.measured_s is None
    # best candidate is the argmin of predictions
    preds = [t for _, t, _ in res.candidates]
    assert res.predicted_s == min(preds)


def test_autotune_cache_roundtrip(rng, tmp_path, monkeypatch):
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    # reload module-level cache dir
    import importlib

    import pygim_tpu.tune.autotuner as at

    importlib.reload(at)
    coo = random_coo(rng, nrows=4000, ncols=4000, nnz=30000)
    r1 = at.autotune(coo, hidden=32)
    r2 = at.autotune(coo, hidden=32)
    assert r1.config == r2.config


def test_hybrid_in_autotune_space(rng, tmp_path, monkeypatch):
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    from pygim_tpu.ops.spmm import SpmmConfig
    from pygim_tpu.tune import plan_statistics

    # hub-heavy graph: hybrid's core should absorb most edges
    import numpy as np

    from pygim_tpu.core.graph import CooGraph

    n = 2048
    r = np.concatenate([rng.integers(0, 64, 40000), rng.integers(0, n, 4000)])
    c = np.concatenate([rng.integers(0, 64, 40000), rng.integers(0, n, 4000)])
    csr = CooGraph.from_edges(r, c, nrows=n, ncols=n).to_csr()
    stats_h = plan_statistics(
        csr, 64, SpmmConfig(backend="hybrid", hybrid_k=256)
    )
    stats_e = plan_statistics(csr, 64, SpmmConfig(backend="ell"))
    assert stats_h["core_bytes"] == 256 * 256 * 4
    # hybrid tail gathers far fewer padded edges than full ell
    assert stats_h["gather_bytes"] < 0.5 * stats_e["gather_bytes"]
