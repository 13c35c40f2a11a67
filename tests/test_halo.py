"""Edge-partitioned halo-exchange SpMM on the virtual 8-device mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygim_tpu.ops.spmm import SpmmConfig
from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo
from tests.conftest import random_coo


def _dense_ref(coo, x):
    return coo.to_dense().astype(np.float64) @ x.astype(np.float64)


@pytest.mark.parametrize("exchange", ["all_gather", "all_to_all"])
@pytest.mark.parametrize("nd", [2, 4, 8])
def test_halo_matches_dense(rng, exchange, nd):
    coo = random_coo(rng, nrows=200, ncols=200, nnz=2000)
    x = rng.standard_normal((200, 32)).astype(np.float32)
    mesh = make_node_mesh(nd)
    prep = prepare_spmm_halo(
        coo, mesh, SpmmConfig(n_blocks=2), exchange=exchange
    )
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_allclose(out, _dense_ref(coo, x), rtol=1e-4, atol=1e-4)


def test_halo_nonsquare_rejected(rng):
    coo = random_coo(rng, nrows=50, ncols=40, nnz=100)
    with pytest.raises(ValueError):
        prepare_spmm_halo(coo, make_node_mesh(2))


def test_halo_uneven_rows(rng):
    # nrows not divisible by device count
    coo = random_coo(rng, nrows=197, ncols=197, nnz=1500)
    x = rng.standard_normal((197, 16)).astype(np.float32)
    prep = prepare_spmm_halo(coo, make_node_mesh(4), SpmmConfig(n_blocks=2))
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_allclose(out, _dense_ref(coo, x), rtol=1e-4, atol=1e-4)


def test_halo_block_diagonal_small_halo(rng):
    """Block-diagonal graph → empty request lists (halo_k stays small)."""
    nd, per = 4, 50
    rows, cols = [], []
    for d in range(nd):
        r = rng.integers(d * per, (d + 1) * per, 200)
        c = rng.integers(d * per, (d + 1) * per, 200)
        rows.append(r)
        cols.append(c)
    from pygim_tpu.core.graph import CooGraph

    coo = CooGraph.from_edges(
        np.concatenate(rows), np.concatenate(cols), nrows=200, ncols=200
    )
    prep = prepare_spmm_halo(coo, make_node_mesh(nd), SpmmConfig(n_blocks=2))
    assert prep.halo_k <= 8  # minimal padding — no cross edges
    x = rng.standard_normal((200, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_halo_prepare_once_run_many(rng):
    coo = random_coo(rng, nrows=120, ncols=120, nnz=900)
    prep = prepare_spmm_halo(coo, make_node_mesh(4), SpmmConfig(n_blocks=2))
    for _ in range(2):
        x = rng.standard_normal((120, 24)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )


@pytest.mark.parametrize("exchange", ["all_gather", "all_to_all"])
def test_halo_trailing_empty_shards(rng, exchange):
    """nrows so small some devices own zero rows (regression: prepare
    crashed on the empty-shard rowptr slice)."""
    coo = random_coo(rng, nrows=6, ncols=6, nnz=20)
    x = rng.standard_normal((6, 8)).astype(np.float32)
    prep = prepare_spmm_halo(
        coo, make_node_mesh(4), SpmmConfig(n_blocks=1), exchange=exchange
    )
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_allclose(out, _dense_ref(coo, x), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("order", [None, "rcm"])
def test_halo_ring_exchange_matches_dense(rng, order):
    """Ring exchange (per-shift ppermute with per-shift buffer sizes)
    matches the dense oracle, with and without locality ordering."""
    coo = random_coo(rng, nrows=96, ncols=96, nnz=700)
    x = rng.standard_normal((96, 8)).astype(np.float32)
    prep = prepare_spmm_halo(
        coo, make_node_mesh(4), SpmmConfig(n_blocks=1),
        exchange="ring", order=order,
    )
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_halo_ring_single_device(rng):
    """nd=1 node mesh: the ring has no peers — every edge is local and
    the exchange degenerates gracefully (regression: empty-block
    concatenate crashed at trace time)."""
    import jax.numpy as jnp

    coo = random_coo(rng, nrows=48, ncols=48, nnz=300)
    x = rng.standard_normal((48, 8)).astype(np.float32)
    prep = prepare_spmm_halo(
        coo, make_node_mesh(1), SpmmConfig(n_blocks=1), exchange="ring"
    )
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_halo_ring_buffer_smaller_on_clustered(rng):
    """On a block-diagonal-ish graph the ring's total recv buffer is no
    larger than the all_to_all's global-max-padded one."""
    n, nd = 256, 4
    rpd = n // nd
    rows = np.repeat(np.arange(n), 6)
    cols = (rows // rpd) * rpd + rng.integers(0, rpd, rows.size)
    # a few cross edges only to device+1
    rows = np.concatenate([rows, np.arange(0, n - rpd)])
    cols = np.concatenate([cols, np.arange(rpd, n)])
    from pygim_tpu.core.graph import CooGraph

    coo = CooGraph.from_edges(rows, cols, nrows=n, ncols=n)
    ring = prepare_spmm_halo(
        coo, make_node_mesh(nd), SpmmConfig(n_blocks=1), exchange="ring"
    )
    a2a = prepare_spmm_halo(
        coo, make_node_mesh(nd), SpmmConfig(n_blocks=1),
        exchange="all_to_all",
    )
    assert ring.halo_k <= nd * a2a.halo_k
    x = rng.standard_normal((n, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ring.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_halo_ring_raw_mul_with_order(rng):
    """ring exchange + RCM order + raw_mul threading compose: a 2-layer
    forward in ONE jit returns original-order results."""
    import jax

    coo = random_coo(rng, nrows=128, ncols=128, nnz=900)
    prep = prepare_spmm_halo(
        coo, make_node_mesh(4), SpmmConfig(n_blocks=1),
        exchange="ring", order="rcm",
    )
    dev = prep.dev_arrays
    assert "order" in dev and "inv_order" in dev

    @jax.jit
    def fwd(x, dev):
        return prep.raw_mul(jax.nn.relu(prep.raw_mul(x, dev)), dev)

    x = rng.standard_normal((128, 8)).astype(np.float32)
    ref = coo.to_dense().astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(fwd(jnp.asarray(x), dev)),
        ref @ np.maximum(ref @ x, 0), rtol=1e-3, atol=1e-3,
    )


def test_scaling_benchmark_ring(rng):
    """run_scaling_benchmark accepts the ring exchange (config-5 ring
    rehearsal path)."""
    from pygim_tpu.bench.scaling import run_scaling_benchmark
    from pygim_tpu.data.datasets import GraphDataset
    from pygim_tpu.utils.metrics import DataReporter

    coo = random_coo(rng, nrows=64, ncols=64, nnz=400)
    ds = GraphDataset(
        name="t", graph=coo, x=np.zeros((64, 4), np.float32),
        y=np.zeros(64, np.int64), train_mask=np.zeros(64, bool),
        test_mask=np.zeros(64, bool), num_classes=2, synthetic=True,
    )
    means = run_scaling_benchmark(
        ds, device_counts=[1, 4], hidden=8, exchange="ring", repeat=1,
        reporter=DataReporter(echo=False),
    )
    assert "edges_per_s_n4" in means
