"""Trained-accuracy parity — the strongest end-to-end correctness test
(VERDICT r2 item 3): train the same init twice, once through a TPU backend
and once through the jnp oracle, and demand the same learned function.
Reference analog: task accuracy as integration signal
(/root/reference/inference.py:27-41), upgraded from untrained to trained."""

import numpy as np
import pytest

from pygim_tpu.bench.runners import run_training_benchmark
from pygim_tpu.data import load_dataset
from pygim_tpu.ops.spmm import SpmmConfig


@pytest.fixture(scope="module")
def planted():
    return load_dataset("planted-2000-24000-4")


def test_planted_dataset_is_learnable_shape(planted):
    ds = planted
    assert ds.num_classes == 4 and ds.num_nodes == 2000
    # homophily: most edges connect same-class nodes
    same = (ds.y[ds.graph.rows] == ds.y[ds.graph.cols]).mean()
    assert same > 0.7


def test_training_parity_ell(planted):
    res = run_training_benchmark(
        planted, hidden=32, epochs=25, config=SpmmConfig(backend="ell"),
    )
    # the planted graph is genuinely learnable — far above the 25% chance
    assert res["test_acc"] > 0.55
    assert res["oracle_test_acc"] > 0.55
    assert res["acc_delta"] <= 0.01
    assert res["validate"] == "OK"


def test_training_parity_hybrid(planted):
    res = run_training_benchmark(
        planted, hidden=32, epochs=10,
        config=SpmmConfig(
            backend="hybrid", hybrid_core_bytes=1 << 16,
            hybrid_dtype="bfloat16",
        ),
        acc_tol=0.03,  # bf16 core: looser but still-matching convergence
    )
    assert res["acc_delta"] <= 0.03
    assert res["validate"] == "OK"


def test_training_parity_2d_mesh(planted):
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from pygim_tpu.parallel import make_mesh

    res = run_training_benchmark(
        planted, hidden=32, epochs=10, mesh=make_mesh(2, 2),
        config=SpmmConfig(backend="ell"),
    )
    assert res["acc_delta"] <= 0.01
    assert res["validate"] == "OK"


def test_training_parity_divergence_detected(planted):
    """A deliberately-broken aggregate must fail the parity assert — the
    experiment is a real check, not a rubber stamp."""
    from pygim_tpu.ops.spmm import prepare_spmm

    class Broken:
        def __init__(self, graph, config):
            self._p = prepare_spmm(graph, config or SpmmConfig())
            self.dev_arrays = self._p.dev_arrays
            self.config = self._p.config

        def raw_mul(self, v, dev):  # wrong by 2x — trains to a different fn
            return self._p.raw_mul(v, dev) * 2.0

        def mul(self, v):
            return self._p.mul(v) * 2.0

    with pytest.raises(AssertionError):
        run_training_benchmark(
            planted, hidden=32, epochs=10,
            prepare_fn=lambda g, c: Broken(g, c), acc_tol=0.0,
        )


def test_training_experiment_kind(tmp_path, planted, monkeypatch):
    """kind='training' ledger entry records the parity metrics."""
    from pygim_tpu.bench.experiment import Experiment

    # route the experiment's load_dataset at the planted name
    exp = Experiment(
        dataset="planted-2000-24000-4", kind="training", backend="ell",
        hidden=32, epochs=15,
    )
    res = exp.run(tmp_path)
    assert res["validate"] == "OK"
    assert "oracle_test_acc" in res and "acc_delta" in res
    out = (tmp_path / (exp.frozen_name() + ".out")).read_text()
    assert "[DATA]test_acc" in out and "[DATA]oracle_test_acc" in out


def test_training_parity_chunked_oracle(planted):
    """oracle_chunk streams the parity oracle (memory-bounded backward)
    — the flagship-scale parity mechanism (VERDICT r4 item 4). Same
    learned function as the one-shot oracle arm."""
    res = run_training_benchmark(
        planted, hidden=32, epochs=10,
        config=SpmmConfig(backend="ell"),
        oracle_chunk=1024,
    )
    assert res["acc_delta"] <= 0.01
    assert res["validate"] == "OK"


def test_training_experiment_oracle_chunk_field(tmp_path, planted):
    from pygim_tpu.bench.experiment import Experiment

    exp = Experiment(
        dataset="planted-2000-24000-4", kind="training", backend="ell",
        hidden=32, epochs=8, oracle_chunk=2048,
    )
    assert "oracle_chunk-2048" in exp.frozen_name()
    res = exp.run(tmp_path)
    assert res["validate"] == "OK"
    assert "acc_delta" in res
