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


def test_scaling_benchmark_full_model(rng):
    """scale_model path: the FULL GCN forward (quantized aggregation,
    tables threaded through one jit) timed per device count — the
    literal config-5 clause."""
    from pygim_tpu.bench.scaling import run_scaling_benchmark
    from pygim_tpu.data.datasets import GraphDataset
    from pygim_tpu.utils.metrics import DataReporter

    coo = random_coo(rng, nrows=64, ncols=64, nnz=400)
    ds = GraphDataset(
        name="t", graph=coo,
        x=rng.standard_normal((64, 4)).astype(np.float32),
        y=np.zeros(64, np.int64), train_mask=np.zeros(64, bool),
        test_mask=np.zeros(64, bool), num_classes=2, synthetic=True,
    )
    means = run_scaling_benchmark(
        ds, device_counts=[1, 4], hidden=8, exchange="ring", repeat=1,
        reporter=DataReporter(echo=False), model="gcn",
        agg_dtype="int32",
    )
    assert means["edges_per_s_n4"] > 0
    assert "scaling_efficiency_n4" in means


class TestHaloHybridCore:
    """Row-sharded dense hub-core on the halo layout: per-device slabs
    (own hub rows × all k hubs in gathered-buffer order) + one small
    hub-feature all_gather; core edges leave the tail and its halo
    requests at prepare."""

    def _hub_coo(self, rng, n=200, dtype=np.float64):
        from pygim_tpu.core.graph import CooGraph

        hub_r = rng.integers(0, 24, 4000)
        hub_c = rng.integers(0, 24, 4000)
        t_r = rng.integers(0, n, 1200)
        t_c = rng.integers(0, n, 1200)
        vals = (
            rng.standard_normal(5200)
            if dtype == np.float64
            else np.ones(5200, np.float32)
        )
        return CooGraph.from_edges(
            np.concatenate([hub_r, t_r]), np.concatenate([hub_c, t_c]),
            vals, nrows=n, ncols=n,
        )

    @pytest.mark.parametrize("exchange", ["all_gather", "all_to_all", "ring"])
    @pytest.mark.parametrize("nd", [2, 4])
    def test_matches_dense(self, rng, exchange, nd):
        coo = self._hub_coo(rng)
        x = rng.standard_normal((200, 24)).astype(np.float32)
        prep = prepare_spmm_halo(
            coo, make_node_mesh(nd),
            SpmmConfig(backend="hybrid", hybrid_k=24),
            exchange=exchange,
        )
        assert prep.hybrid_k_eff == 24
        np.testing.assert_allclose(
            np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_core_shrinks_halo_requests(self, rng):
        """Stripping hub-hub edges before the exchange plan shrinks the
        per-pair request buffers: hubs spread over devices + local-only
        tail means every remote request is a core edge."""
        from pygim_tpu.core.graph import CooGraph

        n, nd, rpd = 200, 4, 50
        hubs = np.array([d * rpd + i for d in range(nd) for i in range(6)])
        hr = np.repeat(hubs, hubs.size)       # dense hub-hub block
        hc = np.tile(hubs, hubs.size)
        hr = np.repeat(hr, 8)                 # degree-boost: hubs rank top-k
        hc = np.repeat(hc, 8)
        tr_ = rng.integers(0, n, 1500)        # tail: strictly local cols
        tc_ = (tr_ // rpd) * rpd + rng.integers(0, rpd, 1500)
        coo = CooGraph.from_edges(
            np.concatenate([hr, tr_]), np.concatenate([hc, tc_]),
            rng.standard_normal(hr.size + 1500), nrows=n, ncols=n,
        )
        ell = prepare_spmm_halo(
            coo, make_node_mesh(nd), SpmmConfig(backend="ell")
        )
        hyb = prepare_spmm_halo(
            coo, make_node_mesh(nd),
            SpmmConfig(backend="hybrid", hybrid_k=hubs.size),
        )
        assert hyb.halo_k < ell.halo_k
        # and both still compute the right product
        x = rng.standard_normal((n, 16)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(hyb.mul(jnp.asarray(x))), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    @pytest.mark.parametrize("core_dtype", ["bfloat16", "int8", "int4"])
    def test_reduced_precision_cores(self, rng, core_dtype):
        """bf16 / int8 / nibble-packed int4 slabs; integer cores demote
        non-representable cells to the exact ELL tail."""
        from pygim_tpu.core.graph import CooGraph

        coo = self._hub_coo(rng, dtype=np.float32)  # integer-valued (1s)
        # force an out-of-range cell: 40 parallel edges between two hubs
        import dataclasses

        extra_r = np.zeros(40, np.int32)
        extra_c = np.ones(40, np.int32)
        coo = CooGraph.from_edges(
            np.concatenate([coo.rows, extra_r]),
            np.concatenate([coo.cols, extra_c]),
            np.concatenate([coo.vals, np.ones(40, np.float32)]),
            nrows=coo.nrows, ncols=coo.ncols,
        )
        x = rng.standard_normal((coo.nrows, 16)).astype(np.float32)
        prep = prepare_spmm_halo(
            coo, make_node_mesh(4),
            SpmmConfig(
                backend="hybrid", hybrid_k=24, hybrid_dtype=core_dtype
            ),
        )
        np.testing.assert_allclose(
            np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
            # float payload rides bf16 on the MXU; dense hub cells (~7
            # merged edges) amplify the x-rounding under cancellation
            rtol=3e-2, atol=4e-1,
        )

    def test_with_locality_order(self, rng):
        coo = self._hub_coo(rng)
        x = rng.standard_normal((200, 16)).astype(np.float32)
        prep = prepare_spmm_halo(
            coo, make_node_mesh(4),
            SpmmConfig(backend="hybrid", hybrid_k=16),
            exchange="ring", order="lp",
        )
        np.testing.assert_allclose(
            np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def _community_coo(self, rng, n=512, blk=128, deg=12, shuffle=False):
        from pygim_tpu.core.graph import CooGraph

        rows = np.repeat(np.arange(n), deg)
        cols = (rows // blk) * blk + rng.integers(0, blk, rows.size)
        if shuffle:
            relabel = rng.permutation(n)
            rows, cols = relabel[rows], relabel[cols]
        return CooGraph.from_edges(
            rows, cols, rng.standard_normal(rows.size), nrows=n, ncols=n
        )

    @pytest.mark.parametrize("exchange", ["all_gather", "all_to_all", "ring"])
    def test_bcsr_matches_dense(self, rng, exchange):
        """BCSR tier on the halo layout (VERDICT r2 item 4): in-band tiles
        with band-local rank space — panel gathers only touch x_loc;
        captured edges leave the ELL tails."""
        coo = self._community_coo(rng)
        x = rng.standard_normal((coo.nrows, 24)).astype(np.float32)
        prep = prepare_spmm_halo(
            coo, make_node_mesh(4),
            SpmmConfig(
                backend="hybrid", hybrid_k=32, bcsr_bytes=8 << 20,
                bcsr_tile=8, bcsr_min_edges=2,
            ),
            exchange=exchange,
        )
        assert prep.has_bcsr and prep.bcsr_edges > 0
        np.testing.assert_allclose(
            np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_bcsr_with_locality_order(self, rng):
        """On a scrambled community graph, the locality clustering makes
        the communities in-band again — the tier captures there."""
        coo = self._community_coo(rng, shuffle=True)
        x = rng.standard_normal((coo.nrows, 16)).astype(np.float32)
        prep = prepare_spmm_halo(
            coo, make_node_mesh(4),
            SpmmConfig(
                backend="hybrid", hybrid_k=32, bcsr_bytes=8 << 20,
                bcsr_tile=8, bcsr_min_edges=2, bcsr_order="lp",
            ),
            exchange="ring", order="lp",
        )
        assert prep.has_bcsr and prep.bcsr_edges > 0
        np.testing.assert_allclose(
            np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_bcsr_shrinks_local_tail(self, rng):
        """Captured edges leave the local ELL tail; halo requests are
        untouched by construction (tiles are in-band)."""
        coo = self._community_coo(rng)
        cfg = dict(backend="hybrid", hybrid_k=0, bcsr_tile=8,
                   bcsr_min_edges=2)
        mesh = make_node_mesh(4)
        plain = prepare_spmm_halo(
            coo, mesh, SpmmConfig(bcsr_bytes=0, **cfg)
        )
        tiered = prepare_spmm_halo(
            coo, mesh, SpmmConfig(bcsr_bytes=8 << 20, **cfg)
        )
        assert tiered.has_bcsr
        # same halo buffer (requests unchanged), fewer local ELL edges
        # (tables pad to a fixed chunk — count real entries, not size)
        assert tiered.halo_k == plain.halo_k
        assert (
            np.count_nonzero(np.asarray(tiered.dev_arrays["local_vals2d"]))
            < np.count_nonzero(np.asarray(plain.dev_arrays["local_vals2d"]))
        )

    def test_bcsr_integer_payload_exact(self, rng):
        """int32 quantization payloads stay exact through the halo BCSR
        tier (wide ints route through the f32 compute dtype)."""
        coo = self._community_coo(rng)
        import dataclasses as _dc

        coo = _dc.replace(
            coo, vals=rng.integers(-3, 4, coo.nnz).astype(np.float32)
        )
        xq = rng.integers(-(2 ** 12), 2 ** 12, (coo.nrows, 16))
        prep = prepare_spmm_halo(
            coo, make_node_mesh(4),
            SpmmConfig(
                backend="hybrid", hybrid_k=0, bcsr_bytes=8 << 20,
                bcsr_tile=8, bcsr_min_edges=2,
            ),
        )
        assert prep.has_bcsr
        out = np.asarray(prep.mul(jnp.asarray(xq, dtype=jnp.int32)))
        ref = coo.to_dense().astype(np.int64) @ xq
        np.testing.assert_array_equal(out.astype(np.int64), ref)

    def test_bcsr_phase_times(self, rng):
        coo = self._community_coo(rng)
        x = rng.standard_normal((coo.nrows, 16)).astype(np.float32)
        prep = prepare_spmm_halo(
            coo, make_node_mesh(4),
            SpmmConfig(
                backend="hybrid", hybrid_k=32, bcsr_bytes=8 << 20,
                bcsr_tile=8, bcsr_min_edges=2,
            ),
        )
        assert prep.has_bcsr
        ph = prep.phase_times(jnp.asarray(x), iters=1)
        assert "bcsr_time(ms)" in ph and ph["bcsr_time(ms)"] >= 0

    def test_tuner_offers_halo_hybrid(self, rng, tmp_path, monkeypatch):
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        from pygim_tpu.tune import autotune

        coo = self._hub_coo(rng)
        res = autotune(
            coo, hidden=32, n_devices=4, layouts=("halo",),
            use_cache=False,
        )
        assert any(
            p.get("backend") == "hybrid" for p, _, _, _ in res.candidates
        )

    def test_tuner_prices_halo_bcsr(self, rng, tmp_path, monkeypatch):
        """Halo candidates with bcsr_bytes > 0 are PRICED, not skipped
        (VERDICT r2 item 4): the tier now builds on the halo layout."""
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        from pygim_tpu.tune import autotune
        from pygim_tpu.tune.space import For, Product

        coo = self._community_coo(rng)
        space = (
            For("backend", ["hybrid"])
            * For("hybrid_k", [32])
            * For("bcsr_bytes", [8 << 20])
            * For("bcsr_tile", [8])
            * For("bcsr_min_edges", [2])
        )
        res = autotune(
            coo, hidden=32, n_devices=4, layouts=("halo",),
            space=space, use_cache=False,
        )
        assert res.candidates, "halo+bcsr candidates were all skipped"
        assert any(
            p.get("bcsr_bytes", 0) > 0 and d.get("layout") == "halo"
            for p, d, _, _ in res.candidates
        )


def test_train_step_over_halo_hybrid(rng):
    """Gradients flow through the halo layout's hub-core slab matmul and
    the exchanges: one jitted training step over the node mesh with the
    hybrid backend makes a finite loss and updated params."""
    import jax
    import optax

    from pygim_tpu.core.graph import CooGraph
    from pygim_tpu.nn.models import make_gnn
    from pygim_tpu.nn.train import make_train_step_threaded

    n = 96
    hub_r = rng.integers(0, 12, 1500)
    hub_c = rng.integers(0, 12, 1500)
    t_r = rng.integers(0, n, 600)
    t_c = rng.integers(0, n, 600)
    coo = CooGraph.from_edges(
        np.concatenate([hub_r, t_r]), np.concatenate([hub_c, t_c]),
        rng.standard_normal(2100), nrows=n, ncols=n,
    )
    prep = prepare_spmm_halo(
        coo, make_node_mesh(4),
        SpmmConfig(backend="hybrid", hybrid_k=12), exchange="all_to_all",
    )
    model = make_gnn(jax.random.key(0), "gcn", 8, 16, 3)
    opt = optax.adam(1e-3)
    step, dev = make_train_step_threaded(model, prep, opt)
    step_j = jax.jit(step)
    x = jnp.asarray(rng.standard_normal((n, 8)), dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, n))
    mask = jnp.ones((n,), dtype=jnp.float32)
    params, opt_state, loss = step_j(
        model.params, opt.init(model.params), x, labels, mask,
        jax.random.key(1), dev,
    )
    assert np.isfinite(float(loss))
    leaf0 = jax.tree_util.tree_leaves(model.params)[0]
    leaf1 = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_halo_hybrid_phase_times(rng):
    """phase_times splits out the hub-core tier on hybrid halo preps."""
    from pygim_tpu.core.graph import CooGraph

    n = 96
    r = np.concatenate([rng.integers(0, 12, 1200), rng.integers(0, n, 400)])
    c = np.concatenate([rng.integers(0, 12, 1200), rng.integers(0, n, 400)])
    coo = CooGraph.from_edges(r, c, nrows=n, ncols=n)
    prep = prepare_spmm_halo(
        coo, make_node_mesh(4), SpmmConfig(backend="hybrid", hybrid_k=12),
        exchange="all_to_all",
    )
    x = jnp.asarray(rng.standard_normal((n, 8)), dtype=jnp.float32)
    ph = prep.phase_times(x, iters=2)
    assert {"mul_time(ms)", "local_time(ms)", "core_time(ms)",
            "exchange_time(ms)"} <= set(ph)
    assert ph["core_time(ms)"] >= 0


@pytest.mark.parametrize("xdt", ["int8", "int32"])
def test_halo_hybrid_integer_payload(rng, xdt):
    """Quantized aggregation payloads stay EXACT through the halo layout
    — the hub-core's s8/wide-int MXU paths and the ELL scans all operate
    on integers (the model-level quantize→aggregate→dequantize route)."""
    from pygim_tpu.core.graph import CooGraph

    n = 96
    r = np.concatenate([rng.integers(0, 12, 1000), rng.integers(0, n, 500)])
    c = np.concatenate([rng.integers(0, 12, 1000), rng.integers(0, n, 500)])
    coo = CooGraph.from_edges(
        r, c, np.ones(1500, np.float32), nrows=n, ncols=n
    )
    prep = prepare_spmm_halo(
        coo, make_node_mesh(4),
        SpmmConfig(backend="hybrid", hybrid_k=12, hybrid_dtype="int8"),
        exchange="all_to_all",
    )
    x = rng.integers(-4, 5, (n, 8)).astype(xdt)
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_array_equal(out.astype(np.int64), _dense_ref(coo, x))


def _zipf_square_coo(rng, n=600, about_nnz=9000):
    from pygim_tpu.core.graph import CooGraph

    deg = np.minimum(rng.zipf(1.4, n), 300)
    deg = (deg * (about_nnz / deg.sum())).astype(np.int64) + 1
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    return CooGraph.from_edges(rows, cols, nrows=n, ncols=n)


@pytest.mark.parametrize("exchange", ["all_gather", "all_to_all", "ring"])
def test_halo_multi_degree_tables(rng, exchange):
    """Multi-degree ELL tables on the halo layout (round 4): local and
    halo edge sets each get their own shared-shape table split."""
    coo = _zipf_square_coo(rng)
    x = rng.standard_normal((coo.ncols, 16)).astype(np.float32)
    prep = prepare_spmm_halo(
        coo, make_node_mesh(4),
        SpmmConfig(block_nnz_budget=512), exchange=exchange,
    )
    metas = (
        [prep.ell_meta] if exchange == "all_gather"
        else [prep._local_meta, prep._halo_meta]
    )
    assert any(len(m) >= 2 for m in metas), "zipf graph should split"
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )
