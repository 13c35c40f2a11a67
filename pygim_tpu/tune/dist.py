"""Distribution-plan search axes for the autotuner.

The reference autotuner's argmin ranged over the *distribution* —
(sp_parts, ds_parts) rank-grid shapes plus the balance policy
(utils/autotuner.py:259-261, 309-343). The TPU analog enumerates the
layouts this framework actually implements:

* ``single``  — one chip, every single-chip backend applies.
* ``2d``      — sp×ds rank grid (`parallel/spmm_2d.py`), with the
  ``scatter_output`` reduce-scatter variant as a knob (halved merge
  traffic, fully sharded result).
* ``halo``    — 1-D row partition with halo feature exchange
  (`parallel/halo.py`), with the exchange strategy (``all_gather`` vs
  ``all_to_all``) as a knob. Which wins is a *graph property* — the
  per-pair cut sizes — so :func:`halo_statistics` measures the actual
  cut of the contiguous partition and the cost model prices both.

Every statistic here is host-side planning arithmetic — no device time,
the same discipline as :func:`pygim_tpu.tune.autotuner.plan_statistics`
(the reimplemented ``prepare_tune_csr``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pygim_tpu.core.graph import CsrGraph
from pygim_tpu.core.partition import round_up


@dataclasses.dataclass(frozen=True)
class DistPlan:
    """One point on the distribution axes.

    ``layout``: "single" | "2d" | "halo".
    ``sp``/``ds``: rank-grid shape (2d); halo uses sp=n_devices, ds=1.
    ``exchange``: halo feature-exchange strategy.
    ``scatter_output``: 2d reduce-scatter variant.
    ``order``: halo node layout — "none" (contiguous ids) or "metis"
    (multilevel k-way partition order, core/cluster.py).
    """

    layout: str = "single"
    sp: int = 1
    ds: int = 1
    exchange: str = "all_to_all"
    scatter_output: bool = False
    order: str = "none"

    @property
    def n_devices(self) -> int:
        return self.sp * self.ds

    def describe(self) -> str:
        if self.layout == "single":
            return "single-chip"
        if self.layout == "2d":
            tag = "+scatter" if self.scatter_output else ""
            return f"2d sp={self.sp} ds={self.ds}{tag}"
        otag = "" if self.order == "none" else f" order={self.order}"
        return f"halo nd={self.sp} exchange={self.exchange}{otag}"


def enumerate_dist(
    n_devices: int, layouts: tuple = ("single", "2d", "halo"),
    orders: tuple = ("none", "metis"),
) -> list[DistPlan]:
    """All distribution candidates for an ``n_devices`` budget.

    The reference enumerated its sp_ds_set explicitly
    (utils/autotuner.py:259); here every factorization of the device
    count is a candidate, plus every halo exchange × node-order pair
    (the metis order is priced from its ACTUAL cut — one partitioner
    run per device count, memoized across candidates).
    """
    plans: list[DistPlan] = []
    if n_devices <= 1:
        return [DistPlan()] if "single" in layouts else []
    if "single" in layouts:
        plans.append(DistPlan())
    if "2d" in layouts:
        for sp in range(1, n_devices + 1):
            if n_devices % sp:
                continue
            ds = n_devices // sp
            plans.append(DistPlan("2d", sp, ds))
            if sp > 1:
                plans.append(DistPlan("2d", sp, ds, scatter_output=True))
    if "halo" in layouts:
        for order in orders:
            for ex in ("all_gather", "all_to_all", "ring"):
                if ex == "all_gather" and order != "none":
                    continue  # all_gather volume is order-independent
                plans.append(
                    DistPlan("halo", n_devices, 1, exchange=ex,
                             order=order)
                )
    return plans


def halo_statistics(
    csr: CsrGraph, nd: int, keep: "np.ndarray | None" = None,
    dev_of: "np.ndarray | None" = None,
) -> dict:
    """Measured cut statistics of the contiguous ``nd``-way row partition.

    Returns the padded per-pair request size ``halo_k`` (the all_to_all
    buffer is (nd·K, H) per device — `parallel/halo.py` pads K to the max
    pair), the exact total remote-unique row count, and the all_gather
    volume in rows, so the cost model can price both exchanges from the
    *actual* graph cut rather than a density heuristic (the TPU analog of
    dpu_prepare_xfer's exact per-rank transfer lists,
    backend_pim/spmm_default/spmm_mul_csr.c:277-329).

    ``keep``: optional edge mask (storage order) — the cut of the masked
    subgraph, WITHOUT materializing a stripped CSR copy (the hub-core
    pricing path strips core edges this way per candidate core size).

    ``dev_of``: optional node→device map (e.g. a k-way partition): the
    cut is then measured under THAT layout instead of contiguous ids —
    how the tuner prices ``order="metis"`` plans without relabeling the
    graph.
    """
    n_pad = round_up(csr.nrows, nd)
    rpd = n_pad // nd
    rows_of = np.repeat(
        np.arange(csr.nrows, dtype=np.int64), np.diff(csr.rowptr)
    )
    colind = csr.colind
    if keep is not None:
        rows_of = rows_of[keep]
        colind = colind[keep]
    if dev_of is None:
        d_of = rows_of // rpd
        owner = colind.astype(np.int64) // rpd
    else:
        dev_of = np.asarray(dev_of, dtype=np.int64)
        d_of = dev_of[rows_of]
        owner = dev_of[colind]
    remote = d_of != owner
    if remote.any():
        # unique (device, peer, col) triples -> per-pair request sizes
        key = (d_of[remote] * nd + owner[remote]) * csr.ncols + colind[
            remote
        ].astype(np.int64)
        pair = np.unique(key) // csr.ncols
        counts = np.bincount(pair, minlength=nd * nd).reshape(nd, nd)
        k = int(counts.max())
        total_unique = int(counts.sum())
        # ring exchange: per-shift buffer K_s = max over receivers of the
        # request at that shift (parallel/halo.py ring plan); total recv
        # rows = Σ_s K_s — no global-max inflation
        ring_rows = 0
        for s in range(1, nd):
            k_s = int(
                max(counts[(d + s) % nd, d] for d in range(nd))
            )
            ring_rows += max(8, round_up(k_s, 8)) if k_s else 8
    else:
        k, total_unique = 0, 0
        ring_rows = 8 * (nd - 1)
    k_pad = max(1, round_up(k, 8))
    return {
        "halo_k": k_pad,
        # rows RECEIVED per device per multiply, with padding inflation
        "a2a_recv_rows": nd * k_pad,
        "ring_recv_rows": ring_rows,
        "ag_recv_rows": n_pad - rpd,
        "cut_rows_total": total_unique,
        "local_edge_fraction": float(
            (~remote).sum() / max(1, rows_of.shape[0])
        ),
    }
