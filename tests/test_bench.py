"""Harness: [DATA] protocol, ledger semantics, sweep runner, CSV export."""

import dataclasses

import numpy as np
import pytest

from pygim_tpu.bench import Experiment, results_to_csv, run_experiments
from pygim_tpu.bench.runners import run_inference_benchmark, run_spmm_benchmark
from pygim_tpu.data import load_dataset
from pygim_tpu.utils.metrics import DataReporter, mean_data, parse_data_lines


def test_data_protocol_roundtrip(capsys):
    rep = DataReporter()
    rep.report("pim_time_spmm(ms)", 12.5)
    rep.report("pim_time_spmm(ms)", 13.5)
    rep.report("verify", "OK")
    out = capsys.readouterr().out
    parsed = parse_data_lines(out.splitlines())
    assert parsed["pim_time_spmm(ms)"] == [12.5, 13.5]
    assert mean_data(parsed)["pim_time_spmm(ms)"] == 13.0


def test_spmm_benchmark_tiny(tmp_path):
    ds = load_dataset("tiny", root=str(tmp_path))
    rep = DataReporter(echo=False)
    means = run_spmm_benchmark(ds, hidden=32, repeat=2, reporter=rep)
    assert means["pim_time_spmm(ms)"] > 0
    assert rep.records["verify"] == ["OK"]
    assert "ref_time(ms)" in means


def test_inference_benchmark_tiny(tmp_path):
    ds = load_dataset("tiny", root=str(tmp_path))
    means = run_inference_benchmark(
        ds, hidden=32, repeat=1, reporter=DataReporter(echo=False)
    )
    assert means["infer_time(ms)"] > 0
    assert 0.0 <= means["test_acc"] <= 1.0


def test_experiment_ledger_and_sweep(tmp_path):
    results = tmp_path / "results"
    exps = [
        Experiment(dataset="tiny", hidden=16, repeat=1),
        Experiment(dataset="tiny", kind="inference", hidden=16, repeat=1,
                   dtype="int32"),
    ]
    out = run_experiments(exps, results, data_root=str(tmp_path / "data"))
    assert len(out) == 2
    for e in exps:
        assert e.status_at(results) == "done"
    # rerun skips but still returns recorded means
    out2 = run_experiments(exps, results, data_root=str(tmp_path / "data"))
    assert set(out2) == set(out)
    csv_path = results_to_csv(results)
    text = csv_path.read_text()
    assert "pim_time_spmm(ms)" in text or "infer_time(ms)" in text
    assert "dataset" in text


def test_experiment_failure_ledger(tmp_path):
    results = tmp_path / "results"
    bad = Experiment(dataset="definitely-not-a-dataset", repeat=1)
    out = run_experiments([bad], results)
    assert out == {}
    assert bad.status_at(results) == "failed"
    # failed is skipped unless retry requested
    out = run_experiments([bad], results)
    assert out == {}


def test_experiment_cluster_part(tmp_path):
    """part_size > 0 runs on ONE cluster partition — the reference's
    AmazonProducts path (ClusterData ~500k-node parts, only
    partition[1] used, reference inference.py:64-73)."""
    results = tmp_path / "results"
    exp = Experiment(
        dataset="tiny", kind="inference", hidden=16, repeat=1,
        part_size=400, part_idx=1,
    )
    means = run_experiments(
        [exp], results, data_root=str(tmp_path / "data")
    )[exp.frozen_name()]
    assert 0 < means["part_nodes"] <= 400
    assert means["part_edges"] > 0
    assert "infer_time(ms)" in means
    # the partition axes are frozen-name-identifying
    assert "part_size-400" in exp.frozen_name()


def test_dry_run(tmp_path):
    exps = [Experiment(dataset="tiny", repeat=1)]
    out = run_experiments(exps, tmp_path / "r", dry_run=True)
    assert out == {}
    assert exps[0].status_at(tmp_path / "r") == "todo"


def test_frozen_name_stable():
    e = Experiment(dataset="tiny")
    assert e.frozen_name() == Experiment(dataset="tiny").frozen_name()
    assert e.frozen_name() != Experiment(dataset="small").frozen_name()


def test_status_at_probes_legacy_stems(tmp_path):
    """Pre-round-2 ledger entries carry FULL key-value names (no default
    omission, and fewer fields — knobs were added over rounds). status_at
    must recognize them so queued sweeps don't re-run completed
    experiments at minutes-to-hours per TPU job."""
    results = tmp_path / "results"
    results.mkdir()
    # a real round-1-vintage stem (copied shape from results/): sorted
    # full key-value pairs of the fields that existed at the time
    legacy = (
        "backend-ell_balance-nnz_block_nnz_budget-131072_dataset-pubmed_"
        "ds_parts-1_dtype-int32_hidden-256_kind-inference_model-gcn_"
        "num_layers-2_repeat-2_sp_format-csr_sp_parts-1_tune-False"
    )
    (results / f"{legacy}.out").write_text("[DATA]infer_time(ms): 1.0\n")
    e = Experiment(
        dataset="pubmed", kind="inference", backend="ell", dtype="int32",
        block_nnz_budget=131072, repeat=2,
    )
    assert e.frozen_name() != legacy  # defaults are omitted nowadays
    assert e.status_at(results) == "done"
    # a near-miss (different non-default value) must stay todo
    other = dataclasses.replace(e, dtype="int8")
    assert other.status_at(results) == "todo"
    # a field the legacy stem predates must sit at its default to match
    newer = dataclasses.replace(e, bcsr_bytes=1 << 20)
    assert newer.status_at(results) == "todo"
    # .failed legacy entries surface as failed
    (results / f"{legacy}.out").rename(results / f"{legacy}.failed")
    assert e.status_at(results) == "failed"


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from pygim_tpu.nn.checkpoint import restore_checkpoint, save_checkpoint
    from pygim_tpu.nn.models import make_gnn

    model = make_gnn(jax.random.key(0), "gcn", 8, 16, 4)
    save_checkpoint(tmp_path / "ck", model.params, step=7)
    template = make_gnn(jax.random.key(1), "gcn", 8, 16, 4).params
    restored, step = restore_checkpoint(tmp_path / "ck", template)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["ln1"]["w"]), np.asarray(model.params["ln1"]["w"])
    )


def test_checkpoint_shape_mismatch(tmp_path):
    import jax

    from pygim_tpu.nn.checkpoint import restore_checkpoint, save_checkpoint
    from pygim_tpu.nn.models import make_gnn

    model = make_gnn(jax.random.key(0), "gcn", 8, 16, 4)
    save_checkpoint(tmp_path / "ck", model.params)
    other = make_gnn(jax.random.key(0), "gcn", 8, 32, 4).params
    with pytest.raises(ValueError):
        restore_checkpoint(tmp_path / "ck", other)


def test_validate_model_per_layer(tmp_path):
    import jax
    import jax.numpy as jnp

    from pygim_tpu.bench.validate import validate_backend, validate_model
    from pygim_tpu.data import load_dataset
    from pygim_tpu.nn.models import make_gnn
    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

    ds = load_dataset("tiny", root=str(tmp_path))
    model = make_gnn(jax.random.key(0), "gcn", ds.x.shape[1], 16, 4)
    x = jnp.asarray(ds.x[:, :], dtype=jnp.float32)
    fast = prepare_spmm(ds.graph, SpmmConfig(backend="ell"))
    oracle = prepare_spmm(ds.graph, SpmmConfig(backend="oracle"))
    assert validate_model(model, x, fast.mul, oracle.mul)
    assert validate_backend(ds.graph, 32, SpmmConfig(backend="blocked"))


def test_validate_catches_broken_aggregate(tmp_path):
    import jax
    import jax.numpy as jnp

    from pygim_tpu.bench.validate import validate_model
    from pygim_tpu.data import load_dataset
    from pygim_tpu.nn.models import make_gnn
    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

    ds = load_dataset("tiny", root=str(tmp_path))
    model = make_gnn(jax.random.key(0), "gcn", ds.x.shape[1], 16, 4)
    x = jnp.asarray(ds.x, dtype=jnp.float32)
    oracle = prepare_spmm(ds.graph, SpmmConfig(backend="oracle"))
    broken = lambda v: oracle.mul(v) * 1.01  # 1% systematic error
    assert not validate_model(model, x, broken, oracle.mul)


def test_compat_api(tmp_path):
    from pygim_tpu import compat
    from pygim_tpu.data import load_dataset

    ds = load_dataset("tiny", root=str(tmp_path))
    import jax.numpy as jnp

    x = jnp.ones((ds.graph.ncols, 16), dtype=jnp.float32)
    for prep in [
        compat.prepare_pim_spmm(ds.graph, sp_parts=2, ds_parts=2),
        compat.prepare_pim_spmm_grande(ds.graph, sp_parts=2),
        compat.prepare_pim_spmv(ds.graph, hidden_size=16),
    ]:
        out = np.asarray(prep.mul(x))
        assert out.shape == (ds.graph.nrows, 16)


def test_scaling_benchmark_virtual_mesh(tmp_path):
    from pygim_tpu.bench.scaling import run_scaling_benchmark
    from pygim_tpu.data import load_dataset

    ds = load_dataset("tiny", root=str(tmp_path))
    means = run_scaling_benchmark(
        ds, device_counts=[1, 4], hidden=16, repeat=1,
        reporter=DataReporter(echo=False),
    )
    assert "edges_per_s_n1" in means
    assert "scaling_efficiency_n4" in means


def test_scaling_experiment_kind(tmp_path):
    """kind='scaling' runs the halo scaling benchmark into the ledger
    with edges_per_s_n{N} + scaling_efficiency keys (BASELINE config 5
    rehearsal plumbing)."""
    from pygim_tpu.bench.experiment import Experiment

    exp = Experiment(
        dataset="tiny", kind="scaling", backend="ell", hidden=8, repeat=1,
        exchange="all_to_all",
    )
    means = exp.run(tmp_path)
    assert "edges_per_s_n1" in means
    nmax = max(
        int(k.rsplit("_n", 1)[1]) for k in means if k.startswith("edges_per_s_n")
    )
    assert nmax > 1  # virtual mesh provides 8 devices
    assert f"scaling_efficiency_n{nmax}" in means
    assert exp.status_at(tmp_path) == "done"


def test_validate_sampled_fused_quant(tmp_path):
    """validate_inference_sampled on an int8 model via JittedAggregate:
    the fused-quant hook records (float in, dequantized out, qname) and
    the host replica of the quantization keeps the check near-bit-exact
    (the memory-lean path used at ogbn-products scale)."""
    import jax
    import jax.numpy as jnp

    from pygim_tpu.bench.validate import (
        JittedAggregate, _RecordingAggregate, validate_inference_sampled,
    )
    from pygim_tpu.data import load_dataset
    from pygim_tpu.nn.models import make_gnn
    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

    ds = load_dataset("tiny", root=str(tmp_path))
    model = make_gnn(
        jax.random.key(0), "gcn", ds.x.shape[1], 16, 4, agg_dtype="int8"
    )
    x = jnp.asarray(ds.x, dtype=jnp.float32)
    prep = prepare_spmm(ds.graph, SpmmConfig(backend="ell"))
    agg = _RecordingAggregate(JittedAggregate(prep))
    assert validate_inference_sampled(
        ds.graph, model, x, JittedAggregate(prep), rows_to_check=64
    )
    # the hook path was actually taken (records carry the quant dtype)
    out = agg.quantized(x, "int8")
    assert out is not None and agg.records[-1][2] == "int8"
    # unfused fallback (blocked backend) still validates
    blocked = prepare_spmm(ds.graph, SpmmConfig(backend="blocked"))
    assert validate_inference_sampled(
        ds.graph, model, x, JittedAggregate(blocked), rows_to_check=64
    )
