"""Per-graph autotuner — the utils/autotuner.py capability, TPU-native.

The reference searches (sp_parts, ds_parts, dpu-balance, tasklet-balance)
with an analytical cost model fed by a native measurement op
(``prepare_tune_csr`` — missing from its snapshot, SURVEY.md §2.1). Here:

* :func:`plan_statistics` IS that measurement op, implemented for real as a
  pure planner statistic (needs no hardware): per-candidate byte/row/nnz
  counters derived from the partition plan — now per *device*, for any
  :class:`~pygim_tpu.tune.dist.DistPlan` (single / 2d sp×ds / halo).
* ``mode='model'`` ranks candidates with the TPU roofline cost model.
* ``mode='measure'`` calibrates the model constants on first use
  (:func:`pygim_tpu.tune.cost_model.measure_constants`), then compiles and
  times the top predicted candidates on the device — affordable on TPU
  because configs are runtime parameters, not per-config ``.so`` builds
  (SURVEY.md §5.6).

The search covers BOTH the reference tuner's axes (the distribution:
sp×ds grid shape, halo exchange strategy, scatter_output —
utils/autotuner.py:259-343) and the backend knobs that only exist here
(hybrid core budget/dtype, ELL degree, nnz balance), plus a second
hierarchical stage that prices BCSR middle-tier variants (tile budget ×
ordering) of the best single-chip hybrid candidate via the sampled
structure probe (tune/bcsr_probe.py).

Results are cached per (graph fingerprint, hidden, devices, mode) the way
the reference keys its builds by frozen params (experiment.py:214-234).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from pathlib import Path
from typing import Optional

import numpy as np

from pygim_tpu.core.graph import CsrGraph
from pygim_tpu.core.partition import make_row_block_plan
from pygim_tpu.ops.spmm import SpmmConfig
from pygim_tpu.tune.cost_model import TpuCostModel, predict_spmm_time
from pygim_tpu.tune.dist import DistPlan, enumerate_dist, halo_statistics
from pygim_tpu.tune.space import For, Space

_CACHE_DIR = Path(
    os.environ.get(
        "PYGIM_TPU_TUNE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pygim_tpu"),
    )
)

# default search space — the TPU analog of the reference's
# sp_ds_set=[(1,32),(2,16)] × blnc_set=[0,2] (autotuner.py:259-261);
# the sp×ds axis itself lives in enumerate_dist (tune/dist.py)
DEFAULT_SPACE = (
    For("balance", ["nnz", "row"])
    * For("block_nnz_budget", [1 << 15, 1 << 17, 1 << 19])
    * For("backend", ["blocked", "ell", "hybrid"])
)

# hybrid-knob extension: core budget × core dtype (the measured winner on
# hub-heavy graphs is a big bf16 core — docs/PERF.md); pruned by the
# hbm_budget_bytes cap in autotune().
HYBRID_SPACE = (
    For("backend", ["hybrid"])
    # 6 GiB: the measured products sweet spot (int4-6GiB fits + wins,
    # 8 GiB OOMs — docs/PERF.md round 3); a space without it cannot
    # rank what the chip actually runs
    * For("hybrid_core_bytes",
          [1 << 30, 4 << 30, 6 << 30, 8 << 30, 12 << 30])
    # int8/int4 candidates are pruned in autotune() for non-integer
    # graphs (int4 = nibble-packed, cells in [-8, 7], 0.5 B/cell)
    * For("hybrid_dtype", [None, "bfloat16", "int8", "int4"])
    * For("balance", ["nnz"])
)


def _stair_mask(memo: dict, csr: CsrGraph, bands) -> np.ndarray:
    """O(nnz) staircase-membership mask, single-slot cached like
    :func:`_in_core_mask` (same RAM argument)."""
    key = tuple(map(tuple, bands))
    last = memo.get("stair_mask_last")
    if last is not None and last[0] == key:
        return last[1]
    rank, rows_of = memo["rank"], memo["rows_of"]
    rr, cc = rank[rows_of], rank[csr.colind]
    his = np.array([b[1] for b in bands], dtype=np.int64)
    ws = np.array([b[2] for b in bands], dtype=np.int64)
    idx = np.searchsorted(his, rr, side="right")
    mask = (idx < len(bands)) & (
        cc < ws[np.minimum(idx, len(bands) - 1)]
    )
    memo["stair_mask_last"] = (key, mask)
    return mask


def _in_core_mask(memo: dict, csr: CsrGraph, k: int) -> np.ndarray:
    """O(nnz) boolean core-membership mask for core size ``k``. Only the
    SINGLE most recent k's mask is retained (``memo["in_core_last"]``):
    the default space produces many distinct k (4 budgets × 4 dtypes),
    and retaining every mask would accumulate multiple GB of tuning RAM
    at 100M+-edge scale — the same cost the halo-stats memo explicitly
    avoids. Recomputing on a k revisit is O(nnz) from the memoized
    rank/rows_of, cheap next to the halo statistics it feeds."""
    last = memo.get("in_core_last")
    if last is not None and last[0] == k:
        return last[1]
    rank, rows_of = memo["rank"], memo["rows_of"]
    mask = (rank[rows_of] < k) & (rank[csr.colind] < k)
    memo["in_core_last"] = (k, mask)
    return mask


def plan_statistics(
    csr: CsrGraph,
    hidden: int,
    config: SpmmConfig,
    sp: int = 1,
    ds: int = 1,
    dtype_bytes: int = 4,
    plan: Optional[DistPlan] = None,
    halo_stats: Optional[dict] = None,
    _memo: Optional[dict] = None,
) -> dict:
    """Per-device counters — the re-implemented ``prepare_tune_csr``
    (autotuner.py:295-302 expected ``[load_bytes, retrieve_bytes,
    merge_rows, max_nnz_per_dpu, max_nnz_per_tasklet, nr_dpus, read_cnt,
    write_cnt]``; these are the TPU-meaningful equivalents).

    All byte counters are PER DEVICE (execution time = the max device =
    any device, since the plans are balanced); ``psum_bytes`` is the
    per-device ICI volume of the plan's collective.
    ``_memo`` caches graph-level intermediates (degree rank) across the
    candidate loop of one :func:`autotune` call.
    """
    if plan is None:
        plan = (
            DistPlan()
            if sp * ds == 1
            else DistPlan("2d", sp, ds)
        )
    sp, ds = plan.sp, plan.ds
    memo = _memo if _memo is not None else {}
    h_local = -(-hidden // ds)
    nb = config.resolve_n_blocks(max(1, csr.nnz // max(1, sp)))
    plan_rb = memo.get(("rbplan", nb, config.balance))
    if plan_rb is None:
        plan_rb = make_row_block_plan(csr, nb, balance=config.balance)
        memo[("rbplan", nb, config.balance)] = plan_rb
    nnz_per_block = (
        csr.rowptr[plan_rb.bounds[1:]] - csr.rowptr[plan_rb.bounds[:-1]]
    )
    core_bytes = 0
    bcsr = None
    k_hybrid = None
    ell_scale = 1.0  # tail shrink from BCSR-tier capture
    if config.backend in ("ell", "hybrid"):
        from pygim_tpu.core.partition import (
            assign_ell_tables,
            choose_degrees_for_config,
        )

        if "deg" not in memo:
            memo["deg"] = np.diff(csr.rowptr).astype(np.int64)
        deg = memo["deg"]
        if config.backend == "hybrid":
            # hub-core coverage estimate: degree-ranked top-k × top-k;
            # a 2d plan column-shards the core, so the same per-device
            # budget buys a √sp-larger core (parallel/spmm_2d.py:142)
            itemsize = {"bfloat16": 2, "int8": 1, "int4": 0.5}.get(
                config.hybrid_dtype, dtype_bytes
            )
            budget_eff = config.hybrid_core_bytes * max(1, sp)
            k = config.hybrid_k or min(
                csr.nrows,
                (int(np.sqrt(budget_eff / itemsize)) // 256) * 256,
            )
            if "rank" not in memo:
                total_deg = deg + np.bincount(
                    csr.colind, minlength=csr.ncols
                )[: csr.nrows]
                rank = np.empty(csr.nrows, dtype=np.int64)
                rank[np.argsort(-total_deg)] = np.arange(csr.nrows)
                memo["rank"] = rank
                memo["rows_of"] = np.repeat(
                    np.arange(csr.nrows, dtype=np.int64), deg
                )
            rank, rows_of = memo["rank"], memo["rows_of"]
            stair_bands = None
            if config.hybrid_shape == "stair" and config.hybrid_k is None:
                # staircase region (core/stair.py): plan from the ONE
                # memoized rank×rank histogram; candidates are
                # single-chip only (autotune filters the layouts)
                from pygim_tpu.core.stair import plan_staircase, stair_grid

                gd = memo.get("stair_grid")
                if gd is None:
                    gd = stair_grid(
                        rank[rows_of], rank[csr.colind], csr.nrows
                    )
                    memo["stair_grid"] = gd
                col_q = 512 if config.hybrid_dtype == "int4" else 256
                budget_cells = int(budget_eff / itemsize)
                bkey = ("stair", budget_cells, config.stair_max_bands,
                        col_q)
                stair_bands = memo.get(bkey)
                if stair_bands is None:
                    stair_bands = plan_staircase(
                        rank[rows_of], rank[csr.colind], csr.nrows,
                        budget_cells,
                        max_bands=config.stair_max_bands, col_quant=col_q,
                        _grid_data=gd,
                    )
                    memo[bkey] = stair_bands
                cells = sum((hi - lo) * w for lo, hi, w in stair_bands)
                core_bytes = int(cells * itemsize)
                k = stair_bands[-1][1] if stair_bands else 0
            else:
                core_bytes = int(k * k * itemsize) // max(1, sp)
            k_hybrid = k
            tkey = (
                ("tail_deg_stair", tuple(map(tuple, stair_bands)))
                if stair_bands is not None
                else ("tail_deg", k)
            )
            tail_deg = memo.get(tkey)
            if tail_deg is None:
                # only the small per-k tail_deg persists in the memo;
                # the O(nnz) mask lives in a single-slot cache
                in_core = (
                    _stair_mask(memo, csr, stair_bands)
                    if stair_bands is not None
                    else _in_core_mask(memo, csr, k)
                )
                tail_deg = np.bincount(
                    rows_of[~in_core], minlength=csr.nrows
                ).astype(np.int64)
                memo[tkey] = tail_deg
            if config.hybrid_dtype in ("int4", "int8"):
                # Integer cores DEMOTE cells whose merged value falls
                # outside the representable range back to the ELL tail
                # (core/partition.py int_demote_slab). On duplicate-
                # merged power-law graphs this is the dominant effect:
                # reddit-sim's hub-hub counts overflow ±7 so the int4
                # k=131k core keeps only ~54% of edges where bf16
                # k=80k keeps ~94% (measured round 3: tail 61.3M slots
                # vs 7.6M; 364 ms vs 144 ms). Exact per-k cell-value
                # histogram, memoized once and shared by int4/int8.
                dkey = (
                    ("demote_stair", tuple(map(tuple, stair_bands)))
                    if stair_bands is not None
                    else ("demote", k)
                )
                dem = memo.get(dkey)
                if dem is None:
                    # a demoted cell re-enters the tail (one entry per
                    # stored edge, ops/spmm.py _demote_edges). On the
                    # duplicate-merged graph the tuner prices (autotune
                    # merges at entry, like every prepare path), cell
                    # value == stored value, so the histogram is a
                    # direct range count over in-core edge values.
                    in_core = (
                        _stair_mask(memo, csr, stair_bands)
                        if stair_bands is not None
                        else _in_core_mask(memo, csr, k)
                    )
                    iv = csr.vals[in_core]
                    s = iv[:: max(1, iv.size // 4096)]
                    dem = {"int4": 0, "int8": 0}
                    if s.size and np.all(s == np.round(s)):
                        dem["int4"] = int(((iv > 7) | (iv < -8)).sum())
                        dem["int8"] = int(
                            ((iv > 127) | (iv < -128)).sum()
                        )
                    memo[dkey] = dem
                demoted = dem[config.hybrid_dtype]
                if demoted:
                    tail_deg = tail_deg.copy()
                    hub = rank < min(k, csr.nrows)
                    # spread demotions over the hub rows (their actual
                    # location) — uniform over hubs is the right first
                    # order for the padding model
                    tail_deg[hub] += demoted // max(1, int(hub.sum()))
            deg = tail_deg
            if config.bcsr_bytes > 0 and stair_bands is None \
                    and plan.layout in (
                "single", "2d", "halo",
            ):
                # BCSR middle tier: price tile capture with the sampled
                # structure probe (tune/bcsr_probe.py); captured edges
                # leave the ELL tail uniformly in the model. The 2D
                # tier's per-shard column ranking captures ~the same
                # tiles split over sp shards (parallel/spmm_2d.py), so
                # its per-device terms divide by sp below. The halo tier
                # mines only IN-BAND tiles (parallel/halo.py
                # _plan_bcsr_halo) — on locality-ordered partitions the
                # dense tiles sit inside communities (= in-band), so the
                # global probe is the right estimate there; an unordered
                # random partition over-credits capture by the out-of-
                # band tile fraction.
                from pygim_tpu.tune.bcsr_probe import bcsr_statistics

                # tiles store bf16 alongside bf16/int8 cores, f32
                # otherwise — the builder's rule (ops/spmm.py bcsr)
                bcsr_item = (
                    2
                    if (config.hybrid_dtype or "float32")
                    in ("bfloat16", "int8")
                    else 4
                )
                bcsr = bcsr_statistics(
                    csr, rank, rows_of, k,
                    tile_rows=config.bcsr_tile,
                    order=config.bcsr_order,
                    budget_bytes=config.bcsr_bytes,
                    hidden=hidden,
                    itemsize=bcsr_item,
                    min_edges=config.bcsr_min_edges,
                    _memo=memo,
                )
                ell_scale = max(
                    0.0,
                    1.0 - bcsr["captured_edges"]
                    / max(1, bcsr["tail_edges"]),
                )
        # multi-degree ELL (round 4): rows split over per-degree tables
        # exactly as the prepare does — literally the same helper
        # (choose_degrees_for_config reads config.hidden_hint like the
        # prepare, NOT this call's pricing ``hidden``), so the tuner's
        # padded-slot and virtual-row counts match the built tables even
        # when the priced runtime width differs from the hint.
        d_list = choose_degrees_for_config(deg, config)
        pick = assign_ell_tables(
            deg, d_list, hidden=config.hidden_hint
        )
        n_vr_total = 0
        padded = 0
        for gi, d_g in enumerate(d_list):
            sub = deg[pick == gi]
            if sub.size == 0:
                continue
            nv = int((-(-sub // d_g)).sum())
            n_vr_total += nv
            padded += nv * d_g
        padded_nnz = int(padded * ell_scale)
        # merge of virtual rows: one write + one scattered read per vrow
        scatter_bytes = int(
            2 * n_vr_total * h_local * dtype_bytes * ell_scale
        )
        ell_vrows = int(n_vr_total * ell_scale)
    else:
        ell_vrows = None
        padded_nnz = nb * plan_rb.nnz_pad
        # blocked/coo materialize the gathered contribution then
        # scatter-read it in the segment-sum (the measured amplification)
        scatter_bytes = 2 * padded_nnz * h_local * dtype_bytes

    # ---- per-device scaling: both the 2d col-split and the halo row
    # split divide edges ~evenly over sp devices ----
    nnz_dev = padded_nnz // max(1, sp)
    scatter_dev = scatter_bytes // max(1, sp)
    out_rows_dev = (
        -(-csr.nrows // sp)
        if plan.layout == "halo" or plan.scatter_output
        else csr.nrows
    )
    gather_bytes = nnz_dev * h_local * dtype_bytes
    stream_bytes = (
        nnz_dev * (4 + dtype_bytes) + out_rows_dev * h_local * dtype_bytes
    )

    # ---- collective volume per device (rides ICI) ----
    n_collectives = 1
    collective = None
    if plan.layout == "2d" and sp > 1:
        collective = "psum"
        merge_rows = csr.nrows * h_local * dtype_bytes
        frac = (sp - 1) / sp
        # psum ≈ reduce-scatter + all-gather; scatter_output keeps only
        # the reduce-scatter half (parallel/spmm_2d.py:224-229)
        psum_bytes = int(
            merge_rows * frac * (1 if plan.scatter_output else 2)
        )
    elif plan.layout == "halo":
        # the halo hub-core strips core edges BEFORE the exchange plan
        # (parallel/halo.py:_plan_core_halo), so price the cut on the
        # stripped tail for hybrid candidates. Only the (small) stats
        # dict is memoized per (sp, k) — a stripped-CSR copy per core
        # size would cost GBs of tuning RAM at 100M+ edges.
        hkey = ("halo", sp, plan.order)
        if k_hybrid and core_bytes > 0:
            hkey = ("halo", sp, plan.order, k_hybrid)
        if halo_stats is None:
            # explicit memo check — setdefault would EVALUATE the
            # O(nnz log nnz) halo statistics on every call
            halo_stats = memo.get(hkey)
            if halo_stats is None:
                # the O(nnz) mask is only materialized on a stats miss
                keep = (
                    ~_in_core_mask(memo, csr, k_hybrid)
                    if k_hybrid and core_bytes > 0
                    else None
                )
                dev_of = None
                if plan.order == "metis":
                    # one partitioner run per device count, shared by
                    # every (config, exchange) candidate at this nd
                    dev_of = memo.get(("metis_part", sp))
                    if dev_of is None:
                        from pygim_tpu.core.cluster import partition_kway

                        dev_of = partition_kway(csr, sp)
                        memo[("metis_part", sp)] = dev_of
                halo_stats = halo_statistics(
                    csr, sp, keep=keep, dev_of=dev_of
                )
                memo[hkey] = halo_stats
        rows = {
            "all_to_all": halo_stats["a2a_recv_rows"],
            "ring": halo_stats["ring_recv_rows"],
            "all_gather": halo_stats["ag_recv_rows"],
        }[plan.exchange]
        psum_bytes = rows * hidden * dtype_bytes
        n_collectives = sp - 1 if plan.exchange == "ring" else 1
        collective = plan.exchange
        if k_hybrid and core_bytes > 0 and plan.exchange != "all_gather":
            # the hub-core's per-mul feature collection: every device
            # receives all ~k hub rows via one small all_gather
            # (parallel/halo.py:core_add). The all_gather exchange pays
            # nothing extra — it reuses its replicated x_full via a
            # take (parallel/halo.py core path).
            psum_bytes += int(k_hybrid * hidden * dtype_bytes)
    else:
        psum_bytes = 0
        n_collectives = 1

    # BCSR middle tier (probed estimates): tile store is HBM-resident;
    # per mul it streams tiles + gathered panels + partial write/merge,
    # and runs the tile FMAs on the MXU
    bcsr_stream = bcsr_flops = bcsr_store = 0
    if bcsr is not None and bcsr["n_tiles"]:
        tr, tc = config.bcsr_tile, 128
        slots, n_vb = bcsr["slots"], bcsr["n_vb"]
        bcsr_store = slots * tr * tc * bcsr_item // max(1, sp)
        bcsr_stream = (
            bcsr_store
            + (slots * tc * h_local * dtype_bytes) // max(1, sp)
            + (2 * n_vb * tr * h_local * dtype_bytes) // max(1, sp)
        )
        bcsr_flops = 2 * slots * tr * tc * h_local // max(1, sp)

    # rough per-device HBM residency, for the hbm budget cap: sparse
    # tables + core + tile store + x slice + output slice, PLUS the
    # run-path working set XLA holds live — one more output-sized buffer
    # (the functionalized at[].add scatter) and the grouped-scan partial
    # stack (ops/spmm.py ELL_PARTIAL_BYTES). Round-4/5 on-chip evidence:
    # a 13.15 GiB core + small extras OOM'd intermittently while the
    # residency sum said 13.4/16 GB — temps are real memory, and the cap
    # must see them or the argmin admits configs the chip rejects
    # (products int4-8GiB, reddit 12GiB+1GiB-BCSR).
    from pygim_tpu.ops.spmm import ELL_PARTIAL_BYTES

    device_bytes = (
        nnz_dev * (4 + dtype_bytes)
        + core_bytes
        + bcsr_store
        + (-(-csr.ncols // max(1, sp))) * h_local * dtype_bytes
        + out_rows_dev * h_local * dtype_bytes
        + ELL_PARTIAL_BYTES
    )

    return {
        "scatter_bytes": scatter_dev,
        "core_bytes": core_bytes,
        # dense-core MXU work (2 flops per cell per local feature): the
        # core turns COMPUTE-bound once flops/cell ≈ 2·h_local outruns
        # bytes/cell · (mxu_rate/hbm_bw) — at H=256 an int8 core streams
        # 1 B/cell but costs 512 flops, so predict_spmm_time takes the
        # max of the stream and MXU terms
        # (cells = core_bytes/itemsize; the packed-int4 unpack throttles
        # the MXU pipe ~1.25× per cell — measured E8, docs/PERF.md)
        "core_flops": int(
            2 * h_local
            * (core_bytes / {"bfloat16": 2, "int8": 1, "int4": 0.5}.get(
                config.hybrid_dtype, dtype_bytes))
            * (1.25 if config.hybrid_dtype == "int4" else 1.0)
        ),
        # BCSR middle tier (sampled-probe estimates; 0 when off)
        "bcsr_stream_bytes": bcsr_stream,
        "bcsr_flops": bcsr_flops,
        "bcsr_captured": 0 if bcsr is None else bcsr["captured_edges"],
        # dominant term: one dense row read per local nnz
        "gather_bytes": gather_bytes,
        # issue-bound ELL tail counters (None for blocked/coo): per-device
        # padded slots and virtual rows, plus the local width that sets
        # V(H). predict_spmm_time prices the tail at
        # max(core.partition.ell_issue_seconds, byte roofline) — the
        # gather engine is issue-rate-bound (CLAUDE.md), so bytes alone
        # under-price the tail 2-4× and the argmin drifts toward
        # smaller cores (refuted on-chip, results/ tuner-argmin A/Bs)
        "ell_slots": nnz_dev if ell_vrows is not None else None,
        "ell_vrows": (
            ell_vrows // max(1, sp) if ell_vrows is not None else None
        ),
        "ell_hidden": h_local,
        # colind + vals streams and the output write
        "stream_bytes": stream_bytes,
        # collective volume (replaces host memadd merge_rows) + which
        # collective carries it (keys the measured per-topology
        # constants, cost_model.measure_ici_constants)
        "psum_bytes": psum_bytes,
        "collective": collective,
        "device_bytes": device_bytes,
        "max_nnz_per_block": int(nnz_per_block.max(initial=0)),
        "mean_nnz_per_block": float(nnz_per_block.mean()) if nb else 0.0,
        "pad_fraction": float(padded_nnz / max(1, csr.nnz)) - 1.0,
        "n_blocks": nb,
        "n_dispatch": n_collectives,
        "rows_pad": plan_rb.rows_pad,
        "nnz_pad": plan_rb.nnz_pad,
    }


def _integer_valued(csr: CsrGraph) -> bool:
    """True when the edge values can ride an exact int8 hub-core:
    integer dtypes always; float graphs when a sample of vals is
    integer-valued (unweighted vals-all-one adjacencies — the cells,
    sums of merged duplicates, are then small ints; the rare >127 cell
    demotes to the ELL tail at prepare)."""
    if np.issubdtype(csr.vals.dtype, np.integer):
        return True
    if not np.issubdtype(csr.vals.dtype, np.floating):
        return False
    sample = csr.vals[:: max(1, csr.vals.size // 4096)]
    return bool(np.all(sample == np.round(sample)))


def _fingerprint(csr: CsrGraph, hidden: int) -> str:
    h = hashlib.sha256()
    h.update(np.asarray([csr.nrows, csr.ncols, csr.nnz, hidden]).tobytes())
    h.update(csr.rowptr[:: max(1, csr.nrows // 64)].tobytes())
    return h.hexdigest()[:16]


@dataclasses.dataclass
class TuneResult:
    config: SpmmConfig
    plan: DistPlan
    predicted_s: float
    measured_s: Optional[float]
    candidates: list  # (config_dict, plan_dict, predicted_s, measured_s|None)
    # constants provenance: "datasheet" (no measurement informed the
    # prediction), "measured:<platform>", optionally "+ici:<platform>x<n>"
    # — a cpu tag means a VIRTUAL mesh calibrated the exchange pricing
    # (relative choices only, not absolute times)
    constants: str = "datasheet"
    # measure-mode candidates that raised during prepare/run, as
    # (config_dict, plan_dict, "ExcType: message") — recorded, never
    # silently dropped: a genuine bug in a candidate must be visible,
    # not scored as "infeasible"
    skipped: list = dataclasses.field(default_factory=list)


def prepare_tuned(graph, result: TuneResult, devices=None):
    """Instantiate the tuned (config, distribution) pair — single-chip,
    2d mesh, or halo, matching how the reference turned its tuner's
    (sp, ds, blnc) argmin into a device allocation
    (utils/autotuner.py:344-360)."""
    plan = result.plan
    if plan.layout == "single":
        from pygim_tpu.ops.spmm import prepare_spmm

        return prepare_spmm(graph, result.config)
    if plan.layout == "2d":
        from pygim_tpu.parallel.mesh import make_mesh
        from pygim_tpu.parallel.spmm_2d import prepare_spmm_2d

        return prepare_spmm_2d(
            graph,
            make_mesh(plan.sp, plan.ds, devices),
            result.config,
            scatter_output=plan.scatter_output,
        )
    from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo

    return prepare_spmm_halo(
        graph,
        make_node_mesh(plan.sp, devices),
        result.config,
        exchange=plan.exchange,
        order=None if plan.order == "none" else plan.order,
    )


def autotune(
    graph,
    hidden: int,
    space: Optional[Space] = None,
    *,
    n_devices: int = 1,
    layouts: tuple = ("single", "2d", "halo"),
    mode: str = "model",
    model: Optional[TpuCostModel] = None,
    use_cache: bool = True,
    repeats: int = 3,
    dtype_bytes: int = 4,
    hbm_budget_bytes: Optional[int] = None,
) -> TuneResult:
    """Pick the best (SpmmConfig, DistPlan) for ``graph`` × width ``hidden``.

    ``mode='model'`` — rank by roofline prediction only (no device time),
    like the reference's analytic argmin (autotuner.py:309-343).
    ``mode='measure'`` — calibrate the model constants on first use, then
    time the top-3 predicted candidates on device and pick the measured
    argmin (the "real timing fallback" of SURVEY.md §7 step 5).
    ``n_devices`` — distribution budget; every factorization plus both
    halo exchanges becomes a candidate (the reference's sp_ds_set axis).
    ``hbm_budget_bytes`` — per-device memory cap pruning hybrid cores and
    tables that don't fit.
    """
    # price what prepare will actually run: every prepare path merges
    # duplicate edges (SpmmConfig.merge_duplicates default) — the tail
    # degrees, halo cuts, and int-core demotions all belong to the
    # merged graph
    from pygim_tpu.core.graph import merge_duplicate_edges

    graph, _ = merge_duplicate_edges(graph)
    csr = graph if isinstance(graph, CsrGraph) else graph.to_csr()
    if space is None:
        # full default search: the blocked/ell/hybrid backends PLUS the
        # hybrid knob axes (core budget × core dtype) — the reference
        # tuner's whole job was picking the distribution, so the default
        # must cover the axes that dominate measured time (docs/PERF.md:
        # core budget/dtype moved products 3.45 s → 2.24 s)
        pts, seen = [], set()
        # staircase variants of every hybrid point (round 5): same
        # budgets/dtypes with the superlevel-set banded region —
        # single-chip only (filtered below), priced via plan_staircase.
        # int4 excluded BY MEASUREMENT: the nibble-packed band dots lose
        # the shape's gain (products stair-int4-6GiB measured 1958 ms vs
        # the square's 1888 — per-band unpack overhead the model does
        # not price; docs/PERF.md round 5)
        stair_pts = [
            {**q, "hybrid_shape": "stair"}
            for q in HYBRID_SPACE
            if q.get("hybrid_dtype") != "int4"
        ]
        for p in list(DEFAULT_SPACE) + list(HYBRID_SPACE) + stair_pts:
            j = json.dumps(p, sort_keys=True)
            if j not in seen:
                seen.add(j)
                pts.append(p)
        space = pts
    if hbm_budget_bytes is None:
        # best-effort per-device cap from the runtime (prunes hybrid
        # cores that cannot fit next to x/output/tables); platforms
        # without memory_stats (CPU) stay uncapped, as before. Only
        # consulted when a backend is ALREADY live: mode='model' tuning
        # must stay pure host planning — initializing a client here
        # would block forever behind another process on this
        # one-client-at-a-time TPU tunnel (CLAUDE.md).
        try:
            from jax._src import xla_bridge as _xb

            if getattr(_xb, "_backends", None):
                import jax

                st = jax.local_devices()[0].memory_stats()
                lim = (st or {}).get("bytes_limit")
                if lim:
                    # 0.875: calibrated against the on-chip OOM ledger
                    # with the device_bytes accounting above — admits
                    # every config that ran (reddit int8/bf16-12GiB,
                    # products int4-6GiB) and prunes every config that
                    # OOM'd (products int4-8/10GiB, 12GiB-core+1GiB-
                    # tile combinations)
                    hbm_budget_bytes = int(lim * 0.875)
        except Exception:
            pass
    # every candidate carries the tuned width: choose_ell_degree (and the
    # hybrid/BCSR guards) read hidden_hint at PREPARE time, so leaving the
    # dataclass default would make prepare pick a different plan than the
    # one the cost model scored
    points = [
        {"hidden_hint": hidden, **p} for p in space
    ]
    key = None
    if use_cache:
        space_h = hashlib.sha256(
            json.dumps(points, sort_keys=True).encode()
        ).hexdigest()[:8]
        key = (
            _fingerprint(csr, hidden)
            + f"-{mode}-nd{n_devices}-{'.'.join(sorted(layouts))}"
            + f"-sp{space_h}-db{dtype_bytes}"
            + (f"-hbm{hbm_budget_bytes}" if hbm_budget_bytes else "")
        )
        path = _CACHE_DIR / f"tune-{key}.json"
        if path.exists():
            try:
                d = json.loads(path.read_text())
                return TuneResult(
                    config=SpmmConfig(**d["config"]),
                    plan=DistPlan(**d.get("plan", {})),
                    predicted_s=d["predicted_s"],
                    measured_s=d.get("measured_s"),
                    candidates=d["candidates"],
                    constants=d.get("constants", "datasheet"),
                    skipped=d.get("skipped", []),
                )
            except Exception:
                pass

    if mode == "measure" and model is None:
        # multi-device budgets also calibrate per-collective ICI
        # constants for this topology (cached per platform × count)
        model = (
            TpuCostModel.for_topology(n_devices)
            if n_devices > 1
            else TpuCostModel.measured()
        )

    dists = enumerate_dist(n_devices, layouts)
    square = csr.nrows == csr.ncols
    memo: dict = {}
    scored = []
    for dist in dists:
        if dist.layout == "halo" and not square:
            continue
        for point in points:
            cfg = SpmmConfig(**point)
            # the halo path aggregates with ELL + an optional hub-core
            # (row-sharded slabs) + the in-band BCSR tier; the 2d path
            # implements ell + hybrid — skip unbuildable combos
            if dist.layout == "halo" and cfg.backend not in (
                "ell", "hybrid",
            ):
                continue
            if dist.layout == "2d" and cfg.backend not in ("ell", "hybrid"):
                continue
            if cfg.backend == "hybrid" and not square:
                continue
            # staircase cores are implemented single-chip only (the
            # sharded layouts keep the square region)
            if cfg.hybrid_shape == "stair" and dist.layout != "single":
                continue
            # the int8 core stores exact small integers (out-of-range
            # cells demote to the ELL tail at prepare); offer it for
            # integer dtypes AND integer-VALUED float graphs (unweighted
            # adjacencies, vals all 1.0 — the common SpMM bench shape),
            # where it packs √2× the hub rank per HBM byte while the
            # float payload still computes in bf16
            if cfg.hybrid_dtype in ("int8", "int4") \
                    and not _integer_valued(csr):
                continue
            stats = plan_statistics(
                csr, hidden, cfg, plan=dist, dtype_bytes=dtype_bytes,
                _memo=memo,
            )
            if (
                hbm_budget_bytes is not None
                and stats["device_bytes"] > hbm_budget_bytes
            ):
                continue
            t = predict_spmm_time(stats, model)
            scored.append((point, dist, t))
    if not scored:
        raise ValueError(
            "no feasible candidate (hbm_budget_bytes too small?)"
        )
    scored.sort(key=lambda s: s[2])

    # ---- second stage: BCSR middle-tier variants of the best
    # single-chip hybrid candidate (tile budget × ordering), priced by
    # the sampled structure probe (tune/bcsr_probe.py). Hierarchical so
    # the O(tail-sample) probe runs for ONE core size k, not for every
    # (core budget, core dtype) combination in the base space.
    base = next(
        (
            (p, d)
            for p, d, _ in scored
            if d.layout == "single"
            and p.get("backend") == "hybrid"
            and not p.get("bcsr_bytes")
            # stair bands subsume the tile tier (prepare ignores
            # bcsr_bytes there) — no BCSR variants of a stair base
            and p.get("hybrid_shape", "square") != "stair"
        ),
        None,
    )
    if square and base is not None:
        bp, bd = base
        for order in ("rank", "lp"):
            for bb in (1 << 30, 5 << 29):  # 1 GiB, 2.5 GiB tile store
                point = {**bp, "bcsr_bytes": bb, "bcsr_order": order}
                cfg = SpmmConfig(**point)
                stats = plan_statistics(
                    csr, hidden, cfg, plan=bd, dtype_bytes=dtype_bytes,
                    _memo=memo,
                )
                if (
                    hbm_budget_bytes is not None
                    and stats["device_bytes"] > hbm_budget_bytes
                ):
                    continue
                if stats["bcsr_captured"] == 0:
                    continue  # no qualifying tiles — identical to base
                scored.append(
                    (point, bd, predict_spmm_time(stats, model))
                )
        scored.sort(key=lambda s: s[2])

    def _mkey(point, dist):
        return json.dumps(
            {**point, "__dist": dataclasses.asdict(dist)}, sort_keys=True
        )

    measured: dict = {}
    skipped: list = []
    if mode == "measure":
        import logging
        import time

        import jax
        import jax.numpy as jnp

        log = logging.getLogger("pygim_tpu.tune")
        avail = len(jax.devices())
        cands = [
            (p, d) for p, d, _ in scored if d.n_devices <= avail
        ][:3]
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((csr.ncols, hidden)),
            dtype=jnp.float32,
        )
        red = jax.jit(lambda o: jnp.sum(o))
        for point, dist in cands:
            shim = TuneResult(SpmmConfig(**point), dist, 0.0, None, [])
            try:
                prep = prepare_tuned(csr, shim)
                float(red(prep.mul(x)))  # compile + warm
                t0 = time.time()
                for _ in range(repeats):
                    out = prep.mul(x)
                float(red(out))
            except Exception as e:
                # infeasible candidate (e.g. int8 core range guard, OOM)
                # OR a genuine bug in its prepare/run — the harness's
                # .failed discipline, in-process: log it and record it
                # in the result so it's never silently scored away
                err = f"{type(e).__name__}: {e}"
                log.warning(
                    "measure-mode candidate skipped: %s %s — %s",
                    point, dataclasses.asdict(dist), err,
                )
                skipped.append((point, dataclasses.asdict(dist), err))
                continue
            measured[_mkey(point, dist)] = (time.time() - t0) / repeats

    if measured:
        best_point, best_dist = min(
            ((p, d) for p, d, _ in scored if _mkey(p, d) in measured),
            key=lambda pd: measured[_mkey(*pd)],
        )
        best_measured = measured[_mkey(best_point, best_dist)]
    else:
        (best_point, best_dist), best_measured = scored[0][:2], None

    result = TuneResult(
        config=SpmmConfig(**best_point),
        plan=best_dist,
        predicted_s=next(
            t for p, d, t in scored if p == best_point and d == best_dist
        ),
        measured_s=best_measured,
        candidates=[
            (p, dataclasses.asdict(d), t, measured.get(_mkey(p, d)))
            for p, d, t in scored
        ],
        constants=(model or TpuCostModel.default()).provenance,
        skipped=skipped,
    )
    if use_cache and key is not None:
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        (_CACHE_DIR / f"tune-{key}.json").write_text(
            json.dumps(
                {
                    "config": dataclasses.asdict(result.config),
                    "plan": dataclasses.asdict(result.plan),
                    "predicted_s": result.predicted_s,
                    "measured_s": result.measured_s,
                    "candidates": result.candidates,
                    "constants": result.constants,
                    "skipped": result.skipped,
                }
            )
        )
    return result
