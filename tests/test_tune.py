"""Space DSL, cost model, autotuner (model mode — no device time)."""

import numpy as np
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


def test_ell_tail_priced_issue_bound(rng):
    """The ELL tail must be priced at the measured issue-rate floor
    (~8.7 ns/slot + V(H)/vrow), not the byte roofline alone — the byte
    model under-priced the tail 2-4x and steered three tuner argmins
    into smaller cores, all refuted on-chip (results/ tuner-argmin
    A/Bs)."""
    from pygim_tpu.core.partition import ell_issue_seconds

    coo = random_coo(rng, nrows=3000, ncols=3000, nnz=60000)
    csr = coo.to_csr()
    m = TpuCostModel.default()
    stats = plan_statistics(csr, hidden=64, config=SpmmConfig(backend="ell"))
    assert stats["ell_slots"] is not None and stats["ell_vrows"] > 0
    floor = ell_issue_seconds(
        stats["ell_slots"], stats["ell_vrows"], stats["ell_hidden"]
    )
    assert predict_spmm_time(stats, m) >= floor
    # narrow bf16-width rows are issue-bound: halving the byte volume
    # must NOT halve the predicted tail time
    t_f32 = predict_spmm_time(stats, m)
    stats_bf16 = plan_statistics(
        csr, hidden=64, config=SpmmConfig(backend="ell"), dtype_bytes=2
    )
    t_bf16 = predict_spmm_time(stats_bf16, m)
    assert t_bf16 > 0.6 * t_f32
    # blocked backend carries no issue counters (byte-roofline only)
    s_blk = plan_statistics(csr, hidden=64, config=SpmmConfig(n_blocks=8))
    assert s_blk["ell_slots"] is None


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
    preds = [t for _, _, t, _ in res.candidates]
    assert res.predicted_s == min(preds)


def test_autotune_int8_core_gating(rng, tmp_path, monkeypatch):
    """int8 hybrid-core candidates appear for integer-valued graphs only
    (the int8 core is exact-integer; float graphs can't ride it)."""
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    from pygim_tpu.tune.autotuner import HYBRID_SPACE

    def dtypes(res):
        return {p.get("hybrid_dtype") for p, _, _, _ in res.candidates}

    coo_i = random_coo(rng, nrows=3000, ncols=3000, nnz=30000, dtype="int8")
    res_i = autotune(coo_i, hidden=32, space=HYBRID_SPACE, use_cache=False)
    assert "int8" in dtypes(res_i)

    coo_f = random_coo(rng, nrows=3000, ncols=3000, nnz=30000)
    res_f = autotune(coo_f, hidden=32, space=HYBRID_SPACE, use_cache=False)
    assert "int8" not in dtypes(res_f)

    # unweighted float adjacency (vals all 1.0): cells are small integer
    # counts, so the int8 core applies — √2× hub rank per HBM byte
    import dataclasses

    coo_ones = dataclasses.replace(
        coo_f, vals=np.ones(coo_f.nnz, dtype=np.float32)
    )
    res_1 = autotune(coo_ones, hidden=32, space=HYBRID_SPACE, use_cache=False)
    assert "int8" in dtypes(res_1)

    # int4 follows the same gate
    assert "int4" in dtypes(res_i)
    assert "int4" not in dtypes(res_f)


def test_plan_statistics_int4_packs_denser(rng):
    """At a fixed HBM core budget the packed int4 plan reaches a √2
    larger hub rank than int8, so it predicts less issue-bound tail
    gather at (near-)equal core bytes — the reason the tuner offers it."""
    from pygim_tpu.ops.spmm import SpmmConfig
    from pygim_tpu.tune.autotuner import plan_statistics

    coo = random_coo(rng, nrows=4000, ncols=4000, nnz=120000, dtype="int8")
    # hub-heavy: concentrate edges on low ids (power-law-ish)
    csr = coo.to_csr()
    budget = 1 << 20
    s8 = plan_statistics(
        csr, 32,
        SpmmConfig(backend="hybrid", hybrid_core_bytes=budget,
                   hybrid_dtype="int8"),
    )
    s4 = plan_statistics(
        csr, 32,
        SpmmConfig(backend="hybrid", hybrid_core_bytes=budget,
                   hybrid_dtype="int4"),
    )
    assert s4["core_bytes"] <= 1.1 * s8["core_bytes"]
    assert s4["gather_bytes"] < s8["gather_bytes"]
    # and the cost model charges the measured MXU throttle per cell
    # (more cells at the same budget × the 1.25 unpack throttle; k
    # rounds down to a 256-multiple so the ratio lands below 2×1.25)
    assert s4["core_flops"] > 1.5 * s8["core_flops"]


def test_autotune_cache_distinguishes_spaces(rng, tmp_path, monkeypatch):
    """The disk-cache key covers the search space — a HYBRID_SPACE call
    must not return a cached DEFAULT_SPACE result (whose winner need not
    even be a member of the hybrid space)."""
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    import importlib

    import pygim_tpu.tune.autotuner as at

    importlib.reload(at)
    coo = random_coo(rng, nrows=4000, ncols=4000, nnz=30000)
    at.autotune(coo, hidden=32)  # default space, populates cache
    res_h = at.autotune(coo, hidden=32, space=at.HYBRID_SPACE)
    assert res_h.config.backend == "hybrid"
    importlib.reload(at)


def test_autotune_tuned_config_carries_hidden(rng, tmp_path, monkeypatch):
    """The winning SpmmConfig records the tuned width in hidden_hint so
    prepare-time degree choice matches what the cost model scored."""
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    coo = random_coo(rng, nrows=4000, ncols=4000, nnz=30000)
    res = autotune(coo, hidden=96, use_cache=False)
    assert res.config.hidden_hint == 96


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


class TestDistTuning:
    """Distribution-axis search (tune/dist.py) — the reference tuner's
    sp×ds argmin (utils/autotuner.py:259-343), extended with the halo
    exchange and scatter_output knobs."""

    def _block_diag(self, rng, n=4096, nd=4, deg=8):
        # edges stay inside each device's contiguous row range → tiny cut
        from pygim_tpu.core.graph import CooGraph

        rpd = n // nd
        rows = np.repeat(np.arange(n), deg)
        cols = (rows // rpd) * rpd + rng.integers(0, rpd, rows.size)
        return CooGraph.from_edges(rows, cols, nrows=n, ncols=n)

    def _dense_cut(self, rng, n=4096, deg=8):
        # uniformly random neighbors → nearly every remote row requested
        from pygim_tpu.core.graph import CooGraph

        rows = np.repeat(np.arange(n), deg)
        cols = rng.integers(0, n, rows.size)
        return CooGraph.from_edges(rows, cols, nrows=n, ncols=n)

    def test_enumerate_dist(self):
        from pygim_tpu.tune import enumerate_dist

        plans = enumerate_dist(8)
        shapes = {(p.layout, p.sp, p.ds) for p in plans}
        assert ("2d", 2, 4) in shapes and ("2d", 8, 1) in shapes
        assert ("halo", 8, 1) in shapes and ("single", 1, 1) in shapes
        assert any(p.scatter_output for p in plans)
        exch = {p.exchange for p in plans if p.layout == "halo"}
        assert exch == {"all_gather", "all_to_all", "ring"}

    def test_halo_statistics_cut(self, rng):
        from pygim_tpu.tune import halo_statistics

        hs_bd = halo_statistics(self._block_diag(rng).to_csr(), 4)
        hs_dc = halo_statistics(self._dense_cut(rng).to_csr(), 4)
        assert hs_bd["halo_k"] * 4 < hs_bd["ag_recv_rows"]
        assert hs_dc["a2a_recv_rows"] >= hs_dc["ag_recv_rows"]
        assert hs_bd["local_edge_fraction"] > 0.99

    # exchange-choice tests pin the backend to ell: with hybrid allowed
    # on halo, a dense hub-core can absorb these tiny graphs outright
    # and the winner's exchange no longer reflects the cut pricing
    _ELL_ONLY = For("backend", ["ell"]) * For("balance", ["nnz"])

    def test_picks_all_to_all_on_block_diagonal(self, rng, tmp_path, monkeypatch):
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        res = autotune(
            self._block_diag(rng), hidden=64, n_devices=4,
            layouts=("halo",), use_cache=False, space=self._ELL_ONLY,
        )
        assert res.plan.layout == "halo"
        assert res.plan.exchange == "all_to_all"

    def test_picks_all_gather_on_dense_cut(self, rng, tmp_path, monkeypatch):
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        res = autotune(
            self._dense_cut(rng), hidden=64, n_devices=4,
            layouts=("halo",), use_cache=False, space=self._ELL_ONLY,
        )
        assert res.plan.exchange == "all_gather"

    def test_picks_bigger_core_when_budget_allows(self, rng, tmp_path, monkeypatch):
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        from pygim_tpu.core.graph import CooGraph
        from pygim_tpu.tune import For

        # moderate hub block (0..512) + uniform tail: the 512-core saves
        # enough per-edge gather to win on time, but its core slab costs
        # more HBM than the tail tables it removes
        n = 4096
        r = np.concatenate(
            [rng.integers(0, 512, 60000), rng.integers(0, n, 100000)]
        )
        c = np.concatenate(
            [rng.integers(0, 512, 60000), rng.integers(0, n, 100000)]
        )
        coo = CooGraph.from_edges(r, c, nrows=n, ncols=n)
        space = (
            For("backend", ["hybrid"])
            * For("hybrid_k", [256, 512])
            * For("balance", ["nnz"])
        )
        res = autotune(
            coo, hidden=64, space=space, layouts=("single",),
            use_cache=False,
        )
        assert res.config.hybrid_k == 512
        # with a cap that only fits the small core, the tuner downsizes
        csr = coo.to_csr()
        db = {
            k: plan_statistics(
                csr, 64, SpmmConfig(backend="hybrid", hybrid_k=k)
            )["device_bytes"]
            for k in (256, 512)
        }
        assert db[512] > db[256]  # bigger core really costs memory here
        res_cap = autotune(
            coo, hidden=64, space=space, layouts=("single",),
            use_cache=False, hbm_budget_bytes=(db[256] + db[512]) // 2,
        )
        assert res_cap.config.hybrid_k == 256

    def test_prepare_tuned_roundtrip(self, rng, tmp_path, monkeypatch):
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        import jax.numpy as jnp

        from pygim_tpu.tune import prepare_tuned

        coo = self._block_diag(rng, n=512, nd=4)
        res = autotune(coo, hidden=16, n_devices=4, use_cache=False)
        prep = prepare_tuned(coo, res)
        x = rng.standard_normal((512, 16)).astype(np.float32)
        import scipy.sparse as sp

        dense = sp.coo_matrix(
            (coo.vals, (coo.rows, coo.cols)), shape=(512, 512)
        ).toarray()
        # the full default space may pick a reduced-precision core
        # (bf16/int8/int4) whose float payload rides bf16 on the MXU
        loose = res.config.hybrid_dtype in ("bfloat16", "int8", "int4")
        np.testing.assert_allclose(
            np.asarray(prep.mul(jnp.asarray(x))), dense @ x,
            rtol=3e-2 if loose else 1e-4, atol=1e-1 if loose else 1e-4,
        )

    def test_measure_mode_multichip(self, rng, tmp_path, monkeypatch):
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        import pygim_tpu.tune.cost_model as cm

        monkeypatch.setattr(
            cm, "measure_constants",
            lambda save=True, **kw: cm.TpuCostModel(**cm._DEFAULTS),
        )
        # keep the per-topology ICI calibration out of the user cache
        monkeypatch.setattr(cm, "_CACHE", tmp_path / "tpu_constants.json")
        coo = self._block_diag(rng, n=256, nd=4)
        res = autotune(
            coo, hidden=8, n_devices=4, use_cache=False, mode="measure",
            repeats=1,
        )
        assert res.measured_s is not None and res.measured_s > 0
        # constants provenance is surfaced: the cpu tag makes clear a
        # VIRTUAL mesh calibrated the exchange pricing (VERDICT r2 #7)
        assert res.constants.endswith("+ici:cpux4")

    def test_measure_mode_reports_broken_candidates(
        self, rng, tmp_path, monkeypatch
    ):
        """A candidate whose prepare/run raises must be RECORDED in
        TuneResult.skipped (and logged), never silently scored as
        infeasible — a genuine bug would otherwise vanish (VERDICT r2
        weak #4)."""
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        import pygim_tpu.tune.autotuner as at
        import pygim_tpu.tune.cost_model as cm

        monkeypatch.setattr(
            cm, "measure_constants",
            lambda save=True, **kw: cm.TpuCostModel(**cm._DEFAULTS),
        )
        monkeypatch.setattr(cm, "_CACHE", tmp_path / "tpu_constants.json")

        def broken(graph, result, devices=None):
            raise RuntimeError("deliberately broken candidate")

        monkeypatch.setattr(at, "prepare_tuned", broken)
        coo = self._block_diag(rng, n=256, nd=4)
        res = at.autotune(
            coo, hidden=8, n_devices=4, use_cache=False, mode="measure",
            repeats=1,
        )
        # every top-3 candidate raised: no measurement, model fallback —
        # and all three failures are visible with their exceptions
        assert res.measured_s is None
        assert len(res.skipped) == 3
        for _point, dist, err in res.skipped:
            assert isinstance(dist, dict) and "layout" in dist
            assert err == "RuntimeError: deliberately broken candidate"


class TestPhaseTimes:
    """Measured phase breakdown (the reference's per-multiply timer
    slots, spmm_mul_csr.c:563-580) + cost-model calibration from it."""

    def test_single_chip_phases(self, rng):
        import jax.numpy as jnp

        from pygim_tpu.ops.spmm import prepare_spmm
        from tests.conftest import random_coo as rc

        coo = rc(rng, nrows=512, ncols=512, nnz=8000)
        prep = prepare_spmm(
            coo, SpmmConfig(backend="hybrid", hybrid_k=64, hidden_hint=32)
        )
        x = jnp.asarray(
            rng.standard_normal((512, 32)), dtype=jnp.float32
        )
        ph = prep.phase_times(x, iters=2)
        for k in ("mul_time(ms)", "gather_time(ms)", "tail_time(ms)",
                  "core_time(ms)"):
            assert k in ph and ph[k] >= 0

    def test_2d_psum_phase(self, rng):
        import jax.numpy as jnp

        from pygim_tpu.parallel.mesh import make_mesh
        from pygim_tpu.parallel.spmm_2d import prepare_spmm_2d
        from tests.conftest import random_coo as rc

        coo = rc(rng, nrows=128, ncols=128, nnz=1000)
        prep = prepare_spmm_2d(coo, make_mesh(4, 2), SpmmConfig(backend="ell"))
        x = jnp.asarray(rng.standard_normal((128, 16)), dtype=jnp.float32)
        ph = prep.phase_times(x, iters=2)
        assert {"mul_time(ms)", "local_time(ms)", "psum_time(ms)"} <= set(ph)

    def test_halo_exchange_phase(self, rng):
        import jax.numpy as jnp

        from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo
        from tests.conftest import random_coo as rc

        coo = rc(rng, nrows=64, ncols=64, nnz=500)
        for exch in ("all_to_all", "all_gather"):
            prep = prepare_spmm_halo(
                coo, make_node_mesh(4), SpmmConfig(n_blocks=1), exchange=exch
            )
            x = jnp.asarray(rng.standard_normal((64, 8)), dtype=jnp.float32)
            ph = prep.phase_times(x, iters=2)
            assert {"exchange_time(ms)", "local_time(ms)"} <= set(ph)

    def test_calibrate_from_phases(self, rng):
        """After calibration on measured phases, the model predicts the
        measured SpMM time within 2× (VERDICT #6 done-criterion)."""
        import jax.numpy as jnp

        from pygim_tpu.ops.spmm import prepare_spmm
        from pygim_tpu.tune.cost_model import calibrate_from_phases
        from tests.conftest import random_coo as rc

        coo = rc(rng, nrows=2048, ncols=2048, nnz=60000)
        cfg = SpmmConfig(backend="ell", hidden_hint=64)
        prep = prepare_spmm(coo, cfg)
        x = jnp.asarray(rng.standard_normal((2048, 64)), dtype=jnp.float32)
        ph = prep.phase_times(x, iters=3)
        stats = plan_statistics(coo.to_csr(), 64, cfg)
        model = calibrate_from_phases(stats, ph)
        pred_ms = predict_spmm_time(stats, model) * 1e3
        # on CPU, per-dispatch overhead makes separate tiny programs
        # incomparable to mul; the fused tail phase is the stable anchor
        # the model decomposes (on TPU tail ≈ mul for the ell backend)
        meas_ms = ph["tail_time(ms)"]
        assert pred_ms < 2 * meas_ms and pred_ms > meas_ms / 2, (
            pred_ms, meas_ms,
        )


class TestIciConstants:
    """Measured per-topology collective constants
    (cost_model.measure_ici_constants) — the multi-chip analog of the
    reference's per-block-size DPU↔host bandwidth tables
    (utils/autotuner.py:24-39, keyed per topology instead)."""

    def test_measure_persist_roundtrip(self, tmp_path, monkeypatch):
        import pygim_tpu.tune.cost_model as cm

        monkeypatch.setattr(cm, "_CACHE", tmp_path / "tpu_constants.json")
        coll = cm.measure_ici_constants(8)
        assert set(coll) == {
            "psum", "all_gather", "all_to_all", "ring", "__meta",
        }
        # provenance metadata: records the calibrating backend so a
        # virtual-mesh calibration is distinguishable from real ICI
        assert coll["__meta"] == {"platform": "cpu", "n_devices": 8}
        for name in ("psum", "all_gather", "all_to_all", "ring"):
            v = coll[name]
            assert v["bw"] > 0 and v["fixed_us"] >= 0
        # persisted per (platform, device count); second call is a hit
        assert (tmp_path / "ici-cpu-n8.json").exists()
        assert cm.measure_ici_constants(8) == coll
        m = cm.TpuCostModel.for_topology(8)
        assert m.coll == coll
        assert m.provenance.endswith("+ici:cpux8")
        assert m.provenance.startswith("measured:")

    def test_predict_uses_collective_constants(self):
        import dataclasses

        from pygim_tpu.tune.cost_model import _DEFAULTS

        base = TpuCostModel(**_DEFAULTS)
        stats = dict(
            gather_bytes=0, stream_bytes=0, psum_bytes=1 << 30,
            n_dispatch=1, collective="all_gather",
        )
        slow = dataclasses.replace(
            base, coll={"all_gather": {"bw": 1e9, "fixed_us": 0.0}}
        )
        fast = dataclasses.replace(
            base, coll={"all_gather": {"bw": 1e12, "fixed_us": 0.0}}
        )
        assert predict_spmm_time(stats, slow) > predict_spmm_time(stats, fast)
        # a collective without measured constants falls back to ici_bw
        other = dict(stats, collective="ring")
        assert predict_spmm_time(other, slow) == predict_spmm_time(
            other, base
        )


def test_plan_statistics_halo_hybrid_shrinks_cut(rng):
    """The halo hub-core strips core edges before the exchange plan
    (parallel/halo.py), so hybrid candidates must be priced on the
    stripped tail's cut — here the remote requests are almost entirely
    hub-hub edges, so the hybrid plan's collective volume collapses."""
    from pygim_tpu.core.graph import CooGraph
    from pygim_tpu.tune.dist import DistPlan

    n, nd, rpd = 2048, 4, 512
    hubs = np.array([d * rpd + i for d in range(nd) for i in range(8)])
    hr = np.repeat(np.repeat(hubs, hubs.size), 4)
    hc = np.repeat(np.tile(hubs, hubs.size), 4)
    tr_ = rng.integers(0, n, 20000)
    tc_ = (tr_ // rpd) * rpd + rng.integers(0, rpd, 20000)
    csr = CooGraph.from_edges(
        np.concatenate([hr, tr_]), np.concatenate([hc, tc_]),
        nrows=n, ncols=n,
    ).to_csr()
    plan = DistPlan("halo", nd, 1, exchange="all_to_all")
    memo: dict = {}
    s_ell = plan_statistics(
        csr, 64, SpmmConfig(backend="ell"), plan=plan, _memo=memo
    )
    s_hyb = plan_statistics(
        csr, 64, SpmmConfig(backend="hybrid", hybrid_k=int(hubs.size)),
        plan=plan, _memo=memo,
    )
    # the REQUEST cut collapses (core edges leave the exchange plan);
    # the core's own hub-feature all_gather is priced separately
    hub_bytes = int(hubs.size) * 64 * 4
    assert s_hyb["psum_bytes"] - hub_bytes < 0.5 * s_ell["psum_bytes"]
    # and the plan as a whole (core on the MXU vs per-edge hub gathers)
    # still predicts faster
    m = TpuCostModel.default()
    assert predict_spmm_time(s_hyb, m) < predict_spmm_time(s_ell, m)


class TestBcsrTuning:
    """BCSR middle-tier pricing via the sampled structure probe
    (tune/bcsr_probe.py) — makes the tile knobs tunable axes (the
    round-2 roadmap gap: plan_statistics ignored bcsr_bytes because
    tile capture depends on the ordering)."""

    def _block_graph(self, rng, n=8192, blk=128, deg=16, shuffle=False):
        # strong 128-node communities, EXACTLY regular degree (no hubs):
        # the hub core covers little, community-aligned (Tr,128) tiles
        # capture nearly everything, and the stable degree rank is the
        # identity (ties) — unless `shuffle` relabels the nodes, which
        # scrambles the rank ordering but not the lp-recoverable blocks
        from pygim_tpu.core.graph import CooGraph

        rows = np.repeat(np.arange(n), deg)
        cols = (rows // blk) * blk + (
            rows % blk + np.tile(np.arange(1, deg + 1), n)
        ) % blk
        if shuffle:
            relabel = rng.permutation(n)
            rows, cols = relabel[rows], relabel[cols]
        return CooGraph.from_edges(rows, cols, nrows=n, ncols=n)

    def test_probe_exact_matches_builder(self, rng):
        """At stride 1 with the rank ordering, the probe's selection is
        the builder's selection — captured edges and tile count match
        build_bcsr_tiles exactly."""
        from pygim_tpu.core.bcsr import build_bcsr_tiles
        from pygim_tpu.tune.bcsr_probe import bcsr_statistics

        coo = self._block_graph(rng, n=4096)
        csr = coo.to_csr()
        rank = np.arange(csr.nrows, dtype=np.int64)  # identity ordering
        rows_of = np.repeat(
            np.arange(csr.nrows, dtype=np.int64), np.diff(csr.rowptr)
        )
        budget, hidden = 4 << 20, 64
        est = bcsr_statistics(
            csr, rank, rows_of, 0, tile_rows=32, order="rank",
            budget_bytes=budget, hidden=hidden,
        )
        bc, in_tile = build_bcsr_tiles(
            rows_of.astype(np.int64), csr.colind.astype(np.int64),
            csr.vals.astype(np.float32), rank,
            n=csr.nrows, tile_rows=32, budget_bytes=budget, hidden=hidden,
        )
        assert est["captured_edges"] == bc.n_edges == int(in_tile.sum())
        assert est["n_vb"] * bc.tiles_per_vblock == est["slots"]
        assert est["slots"] == bc.tiles.shape[0] * bc.tiles.shape[1]

    def test_plan_statistics_bcsr_reduces_tail(self, rng):
        coo = self._block_graph(rng)
        csr = coo.to_csr()
        base = SpmmConfig(backend="hybrid", hybrid_k=256)
        tier = SpmmConfig(
            backend="hybrid", hybrid_k=256, bcsr_bytes=64 << 20
        )
        s0 = plan_statistics(csr, 256, base)
        s1 = plan_statistics(csr, 256, tier)
        assert s1["bcsr_captured"] > 0
        assert s1["bcsr_stream_bytes"] > 0 and s1["bcsr_flops"] > 0
        assert s1["gather_bytes"] < 0.5 * s0["gather_bytes"]
        assert s1["device_bytes"] > s0["device_bytes"]
        # and the captured tier is predicted faster than the raw tail
        m = TpuCostModel.default()
        assert predict_spmm_time(s1, m) < predict_spmm_time(s0, m)

    def test_autotune_extends_hybrid_with_bcsr(self, rng, tmp_path,
                                               monkeypatch):
        """Stage two extends the best single-chip hybrid candidate with
        tile-budget × ordering variants; on a label-shuffled community
        graph the lp ordering recovers the blocks the rank ordering
        scrambles, and a BCSR variant wins outright."""
        monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
        from pygim_tpu.tune import For

        coo = self._block_graph(rng, shuffle=True)
        space = (
            For("backend", ["ell", "hybrid"])
            * For("hybrid_k", [256])
            * For("balance", ["nnz"])
        )
        res = autotune(
            coo, hidden=256, space=space, layouts=("single",),
            use_cache=False,
        )
        assert res.config.bcsr_bytes > 0
        assert res.config.bcsr_order == "lp"
        bcsr_best = {}
        for p, _, t, _ in res.candidates:
            if p.get("bcsr_bytes"):
                o = p["bcsr_order"]
                bcsr_best[o] = min(t, bcsr_best.get(o, np.inf))
        # rank-ordered tiles over shuffled labels catch ~nothing and are
        # dropped at the capture guard (or priced slower if any survive)
        assert bcsr_best["lp"] < bcsr_best.get("rank", np.inf)


def test_autotune_default_space_covers_hybrid_knobs(rng, tmp_path, monkeypatch):
    """space=None searches the hybrid knob axes (core budget × dtype) in
    addition to the backend/balance/block axes — the measured dominant
    axes on hub graphs (docs/PERF.md)."""
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    coo = random_coo(rng, nrows=3000, ncols=3000, nnz=30000, dtype="int8")
    res = autotune(coo, hidden=32, use_cache=False)
    points = [p for p, _, _, _ in res.candidates]
    assert {p.get("hybrid_dtype") for p in points} >= {"bfloat16", "int8", "int4"}
    assert len({p.get("hybrid_core_bytes") for p in points}) > 1
    assert {p.get("backend") for p in points} >= {"blocked", "ell", "hybrid"}


def test_ici_constants_too_many_devices():
    import pytest as _pytest

    from pygim_tpu.tune.cost_model import measure_ici_constants

    with _pytest.raises(ValueError):
        measure_ici_constants(512)


def test_bcsr_probe_empty_tail(rng):
    """k covering every node leaves no tail — the probe reports zeros
    instead of dividing by it."""
    from pygim_tpu.tune.bcsr_probe import bcsr_statistics

    coo = random_coo(rng, nrows=256, ncols=256, nnz=2000)
    csr = coo.to_csr()
    rank = np.arange(256, dtype=np.int64)
    rows_of = np.repeat(np.arange(256, dtype=np.int64), np.diff(csr.rowptr))
    est = bcsr_statistics(
        csr, rank, rows_of, 256, tile_rows=8, order="rank",
        budget_bytes=1 << 20, hidden=32,
    )
    assert est["captured_edges"] == 0 and est["tail_edges"] == 0


def test_autotune_prices_stair_candidates(rng, tmp_path, monkeypatch):
    """space=None includes hybrid_shape='stair' variants (round 5):
    priced from plan_staircase coverage on the actual graph, single-chip
    layouts only, no BCSR second-stage variants of a stair base."""
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    coo = random_coo(rng, nrows=3000, ncols=3000, nnz=30000, dtype="int8")
    res = autotune(coo, hidden=32, n_devices=4, use_cache=False)
    stair = [
        (p, d)
        for p, d, _, _ in res.candidates
        if p.get("hybrid_shape") == "stair"
    ]
    assert stair, "no stair candidates priced"
    assert all(d.get("layout", "single") == "single" for _, d in stair)
    assert not any(
        p.get("bcsr_bytes") for p, _ in stair
    ), "stair bases must not grow BCSR variants"


def test_stair_candidate_prefers_coverage_on_skewed_graph(
    rng, tmp_path, monkeypatch
):
    """On a zipf graph too big for its core budget, the stair region
    captures at least as many edges as the square — its predicted tail
    must not exceed the square's at the same (budget, dtype)."""
    monkeypatch.setenv("PYGIM_TPU_TUNE_CACHE", str(tmp_path))
    from pygim_tpu.core.graph import CooGraph
    from pygim_tpu.ops.spmm import SpmmConfig
    from pygim_tpu.tune.autotuner import plan_statistics

    deg = np.minimum(rng.zipf(1.4, 4000), 500)
    deg = (deg * (80000 / deg.sum())).astype(np.int64) + 1
    rows = np.repeat(np.arange(4000), deg)
    cols = rng.integers(0, 4000, rows.size)
    csr = CooGraph.from_edges(rows, cols, nrows=4000, ncols=4000).to_csr()
    memo = {}
    budget = 1 << 21
    sq = plan_statistics(
        csr, 32, SpmmConfig(backend="hybrid", hybrid_core_bytes=budget),
        _memo=memo,
    )
    st = plan_statistics(
        csr, 32,
        SpmmConfig(
            backend="hybrid", hybrid_core_bytes=budget,
            hybrid_shape="stair",
        ),
        _memo=memo,
    )
    assert st["ell_slots"] <= sq["ell_slots"] * 1.05
    assert st["core_bytes"] <= budget
