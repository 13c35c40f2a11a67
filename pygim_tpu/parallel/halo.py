"""Edge-partitioned distributed SpMM with halo feature exchange.

The multi-host scaling capability (BASELINE.md §3 config 5; SURVEY.md §5.7):
the global graph is 1-D row-partitioned over a ``nodes`` mesh axis — each
device owns a contiguous node range, its rows of A, its slice of x, and
produces its slice of the output (fully sharded, unlike the 2D sp×ds path
whose output is replicated across ``sp``).

The aggregation needs neighbor features owned by other devices — the halo.
Two exchange strategies, selectable per graph (an autotuner axis):

* ``all_gather`` — replicate x over the axis each step. Simple, bandwidth
  O(N·H); wins when most nodes are halo anyway (dense cuts, small N).
* ``all_to_all``  — each device sends only the rows its peers actually
  reference (precomputed per-pair request lists, padded to the max count).
  Bandwidth O(halo·H); wins on well-partitioned graphs where cuts are
  small. This is the TPU analog of the reference's per-rank scatter of
  exactly the needed dense slice (dpu_prepare_xfer, spmm_mul_csr.c:277-329)
  — and the generalization of its host-side merge to ICI collectives.

* ``ring`` — nd−1 collective-permute shifts with per-shift buffer sizes
  (no global-max padding inflation).

The hybrid backend adds a row-sharded dense hub-core on top of any
exchange: device-local (kp, nd·kp) slabs multiply an all_gathered hub
feature buffer on the MXU, and core edges leave the tail (and its halo
requests) at prepare. With ``bcsr_bytes > 0`` the BCSR tile tier mines
each device's IN-BAND edges (band-local rank space, so panel gathers
never leave ``x_loc``) — the full three-tier backend composes with every
exchange, as every parallelization composes with every format in the
reference (utils/experiment.py:146-171).

All index plumbing is precomputed on host at prepare time (prepare-once /
run-many, SURVEY.md §1 invariant).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pygim_tpu.core.graph import CsrGraph
from pygim_tpu.core.partition import round_up
from pygim_tpu.ops.spmm import SpmmConfig, _core_matmul, ell_scan_spmm


_BCSR_KEYS = (
    "bcsr_tiles", "bcsr_panel_idx", "bcsr_vblock_to_rb",
    "bcsr_panel_nodes", "bcsr_row_nodes",
)


def make_node_mesh(n_devices: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices[:n_devices]), axis_names=("nodes",))


class PreparedSpmmHalo:
    """Row-partitioned prepare-once/run-many SpMM over a 1-D ``nodes`` mesh.

    ``mul(x)`` takes the global (nrows, H) dense operand (sharded or not)
    and returns the global product, row-sharded over ``nodes``.
    """

    def __init__(
        self, graph, mesh: Mesh, config: Optional[SpmmConfig] = None,
        exchange: str = "all_to_all", order=None,
    ):
        config = config or SpmmConfig()
        if exchange not in ("all_gather", "all_to_all", "ring"):
            raise ValueError(f"unknown exchange {exchange!r}")
        if config.merge_duplicates:
            from pygim_tpu.core.graph import merge_duplicate_edges

            graph, _ = merge_duplicate_edges(graph)
        self.mesh, self.config, self.exchange = mesh, config, exchange
        nd = mesh.shape["nodes"]
        self.nd = nd

        # optional locality clustering (core/cluster.py — the METIS/
        # ClusterData capability, inference.py:64-73): partition in the
        # reordered space so contiguous ranges have small cuts; mul()
        # still takes and returns ORIGINAL-order arrays (one in-jit
        # gather each way)
        self.order_choice = order if isinstance(order, str) else None
        if isinstance(order, str):
            if order == "auto":
                # measure, don't assume: R-MAT-style graphs carry
                # locality in their ids (metis WORSENS the reddit-sim
                # cut, 0.85 vs 0.76 contiguous — round-3 measurement)
                # while community graphs cut 3-8x with it. Partition,
                # compare cuts, keep the better layout.
                from pygim_tpu.core.cluster import (
                    edge_cut_fraction,
                    partition_kway,
                )

                part = partition_kway(graph, nd)
                contig = (
                    np.arange(graph.nrows, dtype=np.int64) * nd
                    // graph.nrows
                ).astype(np.int32)
                if edge_cut_fraction(graph, part) < 0.95 * (
                    edge_cut_fraction(graph, contig)
                ):
                    order = np.argsort(part, kind="stable").astype(
                        np.int64
                    )
                    self.order_choice = "metis"
                else:
                    order = None
                    self.order_choice = "none"
            elif order == "metis":
                # multilevel k-way partition into nd parts, nodes sorted
                # by part: each device's contiguous row range becomes a
                # low-cut cluster (core/cluster.py partition_order)
                from pygim_tpu.core.cluster import partition_order

                order = partition_order(graph, nd)
            else:
                from pygim_tpu.core.cluster import locality_order

                order = locality_order(graph, method=order)
        self.order = order
        if order is not None:
            from pygim_tpu.core.cluster import relabel

            graph = relabel(graph, order)

        csr = graph if isinstance(graph, CsrGraph) else graph.to_csr()
        if csr.nrows != csr.ncols:
            raise ValueError("halo mode requires a square adjacency")
        self.nrows = csr.nrows
        self.n_pad = round_up(csr.nrows, nd)
        self.rows_per_dev = self.n_pad // nd

        # distributed hybrid hub-core (the single-chip measured winner on
        # power-law graphs — docs/PERF.md): each device keeps a dense
        # slab of its OWN hub rows × all k hub columns; core edges leave
        # the tail BEFORE the exchange is planned, so halo requests
        # shrink too. Stripping returns the tail csr.
        self.hybrid_k_eff = 0
        self._core_dev = {}
        self.has_bcsr = False
        if config.backend == "hybrid":
            csr = self._plan_core_halo(csr, config)

        # --- host-side partition: rows (and x rows) by contiguous range ---
        parts: list[CsrGraph] = []
        bounds = [
            (min(d * self.rows_per_dev, csr.nrows),
             min((d + 1) * self.rows_per_dev, csr.nrows))
            for d in range(nd)
        ]
        for lo, hi in bounds:
            # trailing devices may own zero real rows (hi == lo): empty part
            (e0, e1) = (int(csr.rowptr[lo]), int(csr.rowptr[hi])) \
                if hi > lo else (0, 0)
            rowptr = csr.rowptr[lo : hi + 1] - csr.rowptr[lo]
            if rowptr.size == 0:
                rowptr = np.zeros(1, dtype=csr.rowptr.dtype)
            rowptr = np.concatenate(
                [rowptr, np.full(self.rows_per_dev - (hi - lo), rowptr[-1],
                                 dtype=rowptr.dtype)]
            )
            parts.append(
                CsrGraph(
                    rowptr=rowptr.astype(np.int32),
                    colind=csr.colind[e0:e1].copy(),
                    vals=csr.vals[e0:e1].copy(),
                    ncols=csr.ncols,
                )
            )

        if config.backend == "hybrid" and config.bcsr_bytes > 0:
            # BCSR middle tier BEFORE exchange planning: captured edges
            # leave the ELL tails (they are in-band, so halo requests are
            # unaffected by construction)
            self._plan_bcsr_halo(parts, bounds, config)

        if exchange in ("all_to_all", "ring"):
            self._plan_all_to_all(parts, bounds)
        else:
            self._plan_all_gather(parts)
        self._dev.update(self._core_dev)
        if order is not None:
            inv = np.empty(self.nrows, dtype=np.int32)
            inv[np.asarray(order)] = np.arange(self.nrows, dtype=np.int32)
            repl = NamedSharding(mesh, P())
            self._dev["order"] = jax.device_put(
                np.asarray(order, dtype=np.int32), repl
            )
            self._dev["inv_order"] = jax.device_put(inv, repl)
        self._x_sharding = NamedSharding(mesh, P("nodes"))
        self._run = self._build_run()

    # ----------------------------------------------------------- planning

    def _plan_core_halo(self, csr: CsrGraph, config: SpmmConfig) -> CsrGraph:
        """Row-sharded dense hub-core over the ``nodes`` mesh.

        Device d's slab holds its own hub rows (hubs whose node id falls
        in d's row range, ≈k/nd of them, padded to ``kp``) × ALL k hub
        columns laid out in GATHERED-BUFFER order: hub of rank j sits at
        column ``owner(j)·kp + slot(j)``, which is exactly where one
        ``all_gather`` of every device's (kp, H) hub-feature slice lands
        it at run time. Per-device memory ≈ k²·itemsize/nd, so
        ``hybrid_core_bytes`` (per device) buys a √nd-larger hub rank —
        same scaling as the 2D path's column-sharded core. Core edges
        are stripped from the returned tail csr (and with them their
        halo requests). int8/int4 slabs demote non-representable cells
        to the tail, like the single-chip and 2D builders."""
        import ml_dtypes

        n, nd, rpd = csr.nrows, self.nd, self.rows_per_dev
        deg = np.diff(csr.rowptr).astype(np.int64)
        deg = deg + np.bincount(csr.colind, minlength=n)[:n]
        order = np.argsort(-deg).astype(np.int32)
        rank = np.empty(n, dtype=np.int32)
        rank[order] = np.arange(n, dtype=np.int32)

        core_dtype = config.hybrid_dtype or "float32"
        itemsize = {"bfloat16": 2, "int8": 1, "int4": 0.5}.get(
            core_dtype, 4
        )
        if config.hybrid_k is not None:
            k = max(0, min(config.hybrid_k, n))
        else:
            k = int(np.sqrt(config.hybrid_core_bytes * nd / itemsize))
            k = min((k // 256) * 256, n)
            # k² /nd per device assumes ~balanced hub ownership; when
            # node ids correlate with degree (pre-sorted inputs), one
            # device can own nearly all hubs and every slab inflates to
            # (k, nd·k). Shrink the budget-derived k until the ACTUAL
            # per-device slab honors hybrid_core_bytes. (An explicit
            # hybrid_k is taken literally.)
            while k >= 256:
                owned = np.bincount(
                    order[:k].astype(np.int64) // rpd, minlength=nd
                ).max()
                kp_try = max(8, round_up(int(owned), 8))
                if kp_try * (nd * kp_try) * itemsize \
                        <= config.hybrid_core_bytes:
                    break
                k -= 256
            k = max(0, k)
        if k == 0:
            return csr

        hubs = order[:k].astype(np.int64)  # rank j -> node id
        owner = hubs // rpd
        kp = max(8, round_up(int(np.bincount(owner, minlength=nd).max()), 8))
        slot = np.empty(k, dtype=np.int64)
        own_hub = np.zeros((nd, kp), dtype=np.int32)
        for d in range(nd):
            sel = np.flatnonzero(owner == d)
            slot[sel] = np.arange(sel.size)
            own_hub[d, : sel.size] = hubs[sel] - d * rpd
        buffer_pos = owner * kp + slot  # hub rank -> gathered-buffer col

        rows_of = np.repeat(
            np.arange(n, dtype=np.int64), np.diff(csr.rowptr)
        )
        rr = rank[rows_of]
        cc = rank[csr.colind]
        in_core = (rr < k) & (cc < k)
        row_owner = rows_of // rpd

        w = nd * kp  # slab column count (buffer order)
        np_core = {
            "bfloat16": ml_dtypes.bfloat16, "int8": np.int8,
            "int4": np.uint8,
        }.get(core_dtype, np.float32)
        slabs = np.zeros(
            (nd, kp, w // 2 if core_dtype == "int4" else w), dtype=np_core
        )
        for d in range(nd):
            sel = np.flatnonzero(in_core & (row_owner == d))
            slab = np.zeros((kp, w), dtype=np.float32)
            np.add.at(
                slab, (slot[rr[sel]], buffer_pos[cc[sel]]),
                csr.vals[sel].astype(np.float32),
            )
            if core_dtype in ("int8", "int4"):
                from pygim_tpu.core.partition import int_demote_slab

                slab, bad_flat = int_demote_slab(slab, core_dtype)
                if bad_flat.size:
                    e_flat = slot[rr[sel]] * w + buffer_pos[cc[sel]]
                    demote = np.isin(e_flat, bad_flat)
                    in_core[sel[demote]] = False
            if core_dtype == "int4":
                from pygim_tpu.core.partition import pack_nibbles

                slabs[d] = pack_nibbles(slab)
            else:
                slabs[d] = slab.astype(np_core)
            del slab
        sh = NamedSharding(self.mesh, P("nodes"))
        # gathered-buffer position -> global node id (padding slots point
        # at node 0 — their slab columns are zero). Lets the all_gather
        # exchange reuse its replicated x_full instead of paying a second
        # collective for the hub features.
        buf_nodes = np.zeros(nd * kp, dtype=np.int32)
        buf_nodes[buffer_pos] = hubs
        self._core_dev = {
            "core_slab": jax.device_put(slabs, sh),
            "core_own": jax.device_put(own_hub, sh),
            "core_buf_nodes": jax.device_put(
                buf_nodes, NamedSharding(self.mesh, P())
            ),
        }
        self.hybrid_k_eff = k

        # strip core edges: the exchange planners see only the tail
        from pygim_tpu.core.partition import strip_csr

        return strip_csr(csr, ~in_core, rows_of)

    def _plan_bcsr_halo(self, parts, bounds, config: SpmmConfig):
        """BCSR tile tier on the halo layout — the `_plan_bcsr_2d` trick
        transposed to row bands (VERDICT r2 item 4).

        Each device mines tiles from its IN-BAND edges (both endpoints in
        its own row range): rows and panels are ranked by the band
        subgraph's degree (optionally re-ordered by RCM/label-prop via
        ``tail_tile_order``), so a (128, H) panel gather touches only
        ``x_loc`` rows the device already holds — no exchange interaction
        at all. Captured edges are stripped from the ELL tail parts in
        place. On a locality-clustered partition (``order=...``) most
        edges are in-band, which is exactly where tile capture lives
        (docs/PERF.md "Tile ordering on latent-community graphs").
        Out-of-band (halo) edges stay in the halo ELL tail: their tiles
        would have to gather from the exchange buffer, whose layout
        differs per exchange and whose rows are already minimal
        (request lists are deduped) — no panel locality to mine.
        """
        from pygim_tpu.core.bcsr import (
            TILE_COLS,
            build_bcsr_tiles,
            tail_tile_order,
        )
        from pygim_tpu.core.partition import strip_csr

        nd, rpd = self.nd, self.rows_per_dev
        core_dtype = config.hybrid_dtype or "float32"
        bdt = (
            "bfloat16" if core_dtype in ("bfloat16", "int8") else "float32"
        )
        tr, tc = config.bcsr_tile, TILE_COLS

        bcs, captured = [], 0
        for d, p in enumerate(parts):
            lo, _hi = bounds[d]
            rows_of = np.repeat(
                np.arange(p.nrows, dtype=np.int64), np.diff(p.rowptr)
            )
            local = (p.colind >= lo) & (p.colind < lo + rpd)
            rr_n = rows_of[local]
            cc_n = p.colind[local].astype(np.int64) - lo
            if rr_n.size == 0:
                bcs.append(None)
                continue
            # band rank: in-band degree (out + in), densest rows first —
            # the same degree heuristic as the hub-core, restricted to
            # this band's subgraph
            deg = (
                np.bincount(rr_n, minlength=rpd)
                + np.bincount(cc_n, minlength=rpd)
            )
            order = np.argsort(-deg).astype(np.int64)
            rank = np.empty(rpd, dtype=np.int64)
            rank[order] = np.arange(rpd)
            if config.bcsr_order in ("rcm", "lp"):
                order, rank = tail_tile_order(
                    rr_n, cc_n, order, rank, 0, rpd, config.bcsr_order,
                )
            bc, in_tile = build_bcsr_tiles(
                rank[rr_n], rank[cc_n], p.vals[local], order,
                n=rpd, tile_rows=tr, budget_bytes=config.bcsr_bytes,
                hidden=config.hidden_hint, dtype=bdt,
                min_edges=config.bcsr_min_edges,
            )
            if bc is not None:
                strip = np.zeros(p.colind.shape[0], dtype=bool)
                strip[np.flatnonzero(local)[in_tile]] = True
                parts[d] = strip_csr(p, ~strip, rows_of)
                captured += bc.n_edges
            bcs.append(bc)
        if captured == 0:
            return

        # ---- pad per-device tables to one static shape (P("nodes")) ----
        s_max = max(bc.tiles_per_vblock for bc in bcs if bc is not None)
        step = max(1, (8 << 20) // max(
            1, s_max * tc * config.hidden_hint * 4
        ))
        n_vb_max = max(
            (bc.tiles.shape[0] for bc in bcs if bc is not None), default=1
        )
        step = min(step, n_vb_max)
        n_vb_pad = round_up(n_vb_max, step)
        np_max = max(
            (bc.panel_nodes.shape[0] for bc in bcs if bc is not None),
            default=tc,
        )
        nr_max = max(
            (bc.row_nodes.shape[0] for bc in bcs if bc is not None),
            default=tr,
        )
        np_tiles = np.zeros(
            (nd, n_vb_pad, s_max, tr, tc),
            dtype=next(b for b in bcs if b is not None).tiles.dtype,
        )
        np_pidx = np.zeros((nd, n_vb_pad, s_max), dtype=np.int32)
        np_vb2rb = np.zeros((nd, n_vb_pad), dtype=np.int32)
        # padding gathers row 0 (zero tiles → zero partials); padded row
        # targets scatter-add zeros into the LAST local row
        np_pnodes = np.zeros((nd, np_max), dtype=np.int32)
        np_rnodes = np.full((nd, nr_max), rpd - 1, dtype=np.int32)
        for d, bc in enumerate(bcs):
            if bc is None:
                continue
            nv, sv = bc.tiles.shape[0], bc.tiles_per_vblock
            np_tiles[d, :nv, :sv] = bc.tiles
            np_pidx[d, :nv, :sv] = bc.panel_idx
            n_rb = bc.row_nodes.shape[0] // tr
            np_vb2rb[d] = n_rb - 1  # padded vblocks target the last rb
            np_vb2rb[d, :nv] = bc.vblock_to_rb
            np_pnodes[d, : bc.panel_nodes.shape[0]] = bc.panel_nodes
            np_rnodes[d, : bc.row_nodes.shape[0]] = bc.row_nodes
        sh = NamedSharding(self.mesh, P("nodes"))
        self._bcsr_dev = {
            "bcsr_tiles": jax.device_put(np_tiles, sh),
            "bcsr_panel_idx": jax.device_put(np_pidx, sh),
            "bcsr_vblock_to_rb": jax.device_put(np_vb2rb, sh),
            "bcsr_panel_nodes": jax.device_put(np_pnodes, sh),
            "bcsr_row_nodes": jax.device_put(np_rnodes, sh),
        }
        self._core_dev.update(self._bcsr_dev)
        self.has_bcsr = True
        self.bcsr_step = step
        self.bcsr_edges = captured

    def _ell_tables(self, parts, prefix: str = ""):
        """Shared-shape multi-degree ELL tables per device part (the ell
        backend's formulation, shared with the 2D mesh path). Returns
        ``(dev, meta)``: prefixed device arrays sharded on "nodes" and
        the static [(chunk, degree)] list. Virtual-row padding targets
        the last local row (keeps indices sorted for the scatter-add);
        padded vals are 0 so the add is harmless."""
        from pygim_tpu.ops.spmm import plan_shared_ell_tables

        stacked, meta = plan_shared_ell_tables(
            parts, self.config, vfill=max(self.rows_per_dev - 1, 0)
        )
        self.ell_degree, self.row_chunk = meta[0][1], meta[0][0]
        sh = NamedSharding(self.mesh, P("nodes"))
        return {
            f"{prefix}{k}": jax.device_put(v, sh)
            for k, v in stacked.items()
        }, meta

    def _plan_all_gather(self, parts):
        # colind stays global; each shard gathers from the replicated x
        self.halo_k = self.n_pad  # every device receives all rows
        self.request_rows = (self.nd - 1) * self.rows_per_dev * self.nd
        self._dev, self.ell_meta = self._ell_tables(parts)

    def _plan_all_to_all(self, parts, bounds):
        nd, rpd = self.nd, self.rows_per_dev
        # per device: which remote rows (by owner) do my edges reference?
        requests = []  # requests[d][peer] = unique global col ids owned by peer
        for d, p in enumerate(parts):
            owner = p.colind // rpd
            req = []
            for peer in range(nd):
                cols = np.unique(p.colind[owner == peer])
                req.append(cols if peer != d else cols[:0])
            requests.append(req)
        # the partition's actual cut volume (unique remote rows summed
        # over devices, pre-padding) — what a locality order minimizes
        self.request_rows = sum(
            len(r) for req in requests for r in req
        )
        ring = self.exchange == "ring"
        if ring:
            # RING exchange: nd-1 ppermute shifts, each with its OWN
            # static buffer size K_s = max over devices of the request to
            # the peer at that shift. On a locality-clustered partition
            # the cut concentrates on adjacent shards, so far shifts cost
            # ~nothing — fixing the global-max padding inflation of the
            # single all_to_all (one dense pair inflated every device's
            # buffer to nd·K).
            ks = []
            for s in range(1, nd):
                k_s = max(
                    len(requests[(d + s) % nd][d]) for d in range(nd)
                )
                ks.append(max(8, round_up(k_s, 8)) if k_s else 8)
            self.ring_ks = ks
            offsets = np.concatenate(
                ([0], np.cumsum(ks))
            ).astype(np.int64)
            halo_rows = int(offsets[-1])
            self.halo_k = halo_rows  # total recv rows per device
            # send_idx_s[d]: local row ids d sends to peer (d+s)%nd
            send_tabs = {}
            for i, s in enumerate(range(1, nd)):
                tab = np.zeros((nd, ks[i]), dtype=np.int32)
                for d in range(nd):
                    want = requests[(d + s) % nd][d]
                    tab[d, : len(want)] = want - d * rpd
                send_tabs[f"send_idx_{i}"] = jax.device_put(
                    tab, NamedSharding(self.mesh, P("nodes"))
                )
        else:
            # pad: K = max over all (d, peer) request sizes, aligned
            K = max(
                (len(r) for req in requests for r in req), default=1
            )
            K = max(1, round_up(K, 8))
            self.halo_k = K
            halo_rows = nd * K

            # send_idx[d, peer, K]: LOCAL row ids device d must send to
            # peer (peer requested them). recv layout: concat over peers
            # -> halo buffer of shape (nd*K, H) on each device.
            send_idx = np.zeros((nd, nd, K), dtype=np.int32)
            for d in range(nd):
                for peer in range(nd):
                    want = requests[peer][d]
                    send_idx[d, peer, : len(want)] = want - d * rpd

        # remap each device's colind into [local | halo] index space:
        #   local col c (owner==d)  -> c - d*rpd
        #   remote col c (owner==p) -> position in the halo buffer
        #     (all_to_all: p*K + pos; ring: offsets[(d-p)%nd - 1] + pos)
        # split each part into LOCAL-only edges (computable before the
        # exchange lands — XLA overlaps that ell scan with the in-flight
        # collective) and HALO edges (indices into the received buffer).
        local_parts, halo_parts = [], []
        for d, p in enumerate(parts):
            owner = p.colind // rpd
            rows_of = np.repeat(
                np.arange(p.nrows, dtype=np.int64), np.diff(p.rowptr)
            )
            is_local = owner == d
            new_col = np.empty_like(p.colind)
            new_col[is_local] = p.colind[is_local] - d * rpd
            for peer in range(nd):
                if peer == d:
                    continue
                sel = owner == peer
                if not sel.any():
                    continue
                pos = np.searchsorted(requests[d][peer], p.colind[sel])
                if ring:
                    base = offsets[(d - peer) % nd - 1]
                else:
                    base = peer * K
                new_col[sel] = base + pos

            def rebuild(mask, ncols):
                counts = np.bincount(rows_of[mask], minlength=p.nrows)
                rowptr = np.zeros(p.nrows + 1, dtype=np.int32)
                np.cumsum(counts, out=rowptr[1:])
                return CsrGraph(
                    rowptr=rowptr, colind=new_col[mask], vals=p.vals[mask],
                    ncols=ncols,
                )

            local_parts.append(rebuild(is_local, rpd))
            halo_parts.append(rebuild(~is_local, halo_rows))
        local_tabs, self._local_meta = self._ell_tables(
            local_parts, prefix="local_"
        )
        halo_tabs, self._halo_meta = self._ell_tables(
            halo_parts, prefix="halo_"
        )
        self._dev = dict(local_tabs)
        self._dev.update(halo_tabs)
        if ring:
            self._dev.update(send_tabs)
        else:
            self._dev["send_idx"] = jax.device_put(
                send_idx, NamedSharding(self.mesh, P("nodes"))
            )

    # ------------------------------------------------------------ run fns

    def _build_run(self):
        from pygim_tpu.ops.spmm import shared_ell_keys

        mesh, nd = self.mesh, self.nd
        rpd = self.rows_per_dev
        hybrid = self.hybrid_k_eff > 0
        has_bcsr = self.has_bcsr
        b_step = self.bcsr_step if has_bcsr else 0
        n_core_args = 2 if hybrid else 0

        def bcsr_add(out, x_loc, tiles_, pidx, vb2rb, pnodes, rnodes):
            # in-band tile tier: panels gather from x_loc only (planned
            # that way), partials scatter into the local out carry
            from pygim_tpu.ops.spmm import bcsr_scan_spmm

            wide = (
                jnp.issubdtype(x_loc.dtype, jnp.integer)
                and x_loc.dtype != jnp.int8
            )  # wide ints exceed bf16's exact range (single-chip choice)
            return bcsr_scan_spmm(
                x_loc, pnodes[0], tiles_[0], pidx[0], vb2rb[0], rnodes[0],
                out, b_step,
                compute_dtype=jnp.float32 if wide else None,
            )

        def core_add(out, x_loc, slab, own_hub):
            # one small all_gather collects every device's (kp, H) hub
            # slice; slab columns were laid out in exactly that buffer
            # order at prepare (padded slots hit zero slab columns/rows)
            hs = jnp.take(x_loc, own_hub[0], axis=0)
            hub_x = jax.lax.all_gather(hs, "nodes", tiled=True)
            co = _core_matmul(slab[0], hub_x, jnp.float32)
            return out.at[own_hub[0]].add(co.astype(out.dtype))

        if self.exchange == "all_gather":
            meta = self.ell_meta
            n_ell = 3 * len(meta)

            def local_fn(*args):
                ell_args, x_local = args[:n_ell], args[n_ell]
                rest = args[n_ell + 1:]
                x_full = jax.lax.all_gather(
                    x_local[0], "nodes", tiled=True
                )
                out = None
                for i, (chunk, degree) in enumerate(meta):
                    c, v, r = ell_args[3 * i: 3 * i + 3]
                    out = ell_scan_spmm(
                        x_full, c[0], v[0], r[0], chunk, degree, rpd,
                        out=out,
                    )
                if hybrid:
                    # x_full already holds every hub row — assemble the
                    # gathered-order buffer with a take, no 2nd collective
                    slab, own_hub, buf_nodes = rest[:3]
                    hub_x = jnp.take(x_full, buf_nodes, axis=0)
                    co = _core_matmul(slab[0], hub_x, jnp.float32)
                    out = out.at[own_hub[0]].add(co.astype(out.dtype))
                if has_bcsr:
                    out = bcsr_add(
                        out, x_local[0], *rest[3 if hybrid else 0:]
                    )
                return out[None]

            in_specs = (P("nodes"),) * (n_ell + 1) + (
                (P("nodes"), P("nodes"), P()) if hybrid else ()
            ) + ((P("nodes"),) * 5 if has_bcsr else ())

            def runner(dev, xp):
                args = [dev[k] for k in shared_ell_keys(meta)] + [xp]
                if hybrid:
                    args += [
                        dev["core_slab"], dev["core_own"],
                        dev["core_buf_nodes"],
                    ]
                if has_bcsr:
                    args += [dev[k] for k in _BCSR_KEYS]
                return jax.shard_map(
                    local_fn, mesh=mesh, in_specs=in_specs,
                    out_specs=P("nodes"),
                )(*args)

        elif self.exchange == "ring":
            lmeta, hmeta = self._local_meta, self._halo_meta
            n_l, n_h = 3 * len(lmeta), 3 * len(hmeta)
            n_shift = nd - 1

            def local_fn(*args):
                l_args = args[:n_l]
                h_args = args[n_l: n_l + n_h]
                rest = args[n_l + n_h:]
                send_tabs, x_local = rest[:n_shift], rest[n_shift]
                x_loc = x_local[0]
                # per-shift ppermute with per-shift buffer sizes; XLA
                # overlaps the permutes with the local-edge scan
                blocks = []
                for i, s in enumerate(range(1, nd)):
                    snd = jnp.take(
                        x_loc, send_tabs[i][0].reshape(-1), axis=0
                    )
                    rcv = jax.lax.ppermute(
                        snd, "nodes",
                        perm=[(j, (j + s) % nd) for j in range(nd)],
                    )
                    blocks.append(rcv)
                out = None
                for i, (lc, ld) in enumerate(lmeta):
                    c, v, r = l_args[3 * i: 3 * i + 3]
                    out = ell_scan_spmm(
                        x_loc, c[0], v[0], r[0], lc, ld, rpd, out=out
                    )
                if blocks:  # nd == 1: no peers, every edge is local
                    halo = jnp.concatenate(blocks, axis=0)
                    for i, (hc, hd) in enumerate(hmeta):
                        c, v, r = h_args[3 * i: 3 * i + 3]
                        out = ell_scan_spmm(
                            halo, c[0], v[0], r[0], hc, hd, rpd, out=out
                        )
                if hybrid:
                    out = core_add(
                        out, x_loc,
                        *rest[n_shift + 1 : n_shift + 3],
                    )
                if has_bcsr:
                    out = bcsr_add(
                        out, x_loc, *rest[n_shift + 1 + n_core_args :]
                    )
                return out[None]

            in_specs = (P("nodes"),) * (
                n_l + n_h + 1 + nd - 1 + n_core_args
                + (5 if has_bcsr else 0)
            )

            def runner(dev, xp):
                args = [
                    *[dev[k] for k in shared_ell_keys(lmeta, "local_")],
                    *[dev[k] for k in shared_ell_keys(hmeta, "halo_")],
                    *[dev[f"send_idx_{i}"] for i in range(nd - 1)],
                    xp,
                ]
                if hybrid:
                    args += [dev["core_slab"], dev["core_own"]]
                if has_bcsr:
                    args += [dev[k] for k in _BCSR_KEYS]
                return jax.shard_map(
                    local_fn, mesh=mesh, in_specs=in_specs,
                    out_specs=P("nodes"),
                )(*args)

        else:
            K = self.halo_k
            lmeta, hmeta = self._local_meta, self._halo_meta
            n_l, n_h = 3 * len(lmeta), 3 * len(hmeta)

            def local_fn(*args):
                l_args = args[:n_l]
                h_args = args[n_l: n_l + n_h]
                send_idx, x_local = args[n_l + n_h], args[n_l + n_h + 1]
                rest = args[n_l + n_h + 2:]
                x_loc = x_local[0]                     # (rpd, H)
                # start the exchange: rows each peer requested
                send = jnp.take(x_loc, send_idx[0].reshape(-1), axis=0)
                send = send.reshape(nd, K, x_loc.shape[1])
                halo = jax.lax.all_to_all(
                    send, "nodes", split_axis=0, concat_axis=0
                )
                # local-only edges depend ONLY on x_loc — XLA's scheduler
                # overlaps this scan with the in-flight all_to_all
                out = None
                for i, (lc, ld) in enumerate(lmeta):
                    c, v, r = l_args[3 * i: 3 * i + 3]
                    out = ell_scan_spmm(
                        x_loc, c[0], v[0], r[0], lc, ld, rpd, out=out
                    )
                # halo edges consume the received buffer (peer p's chunk
                # lands in slot p, ordered by source device)
                halo2 = halo.reshape(nd * K, -1)
                for i, (hc, hd) in enumerate(hmeta):
                    c, v, r = h_args[3 * i: 3 * i + 3]
                    out = ell_scan_spmm(
                        halo2, c[0], v[0], r[0], hc, hd, rpd, out=out
                    )
                if hybrid:
                    out = core_add(out, x_loc, *rest[:2])
                if has_bcsr:
                    out = bcsr_add(out, x_loc, *rest[n_core_args:])
                return out[None]

            in_specs = (P("nodes"),) * (
                n_l + n_h + 2 + n_core_args + (5 if has_bcsr else 0)
            )

            def runner(dev, xp):
                args = [
                    *[dev[k] for k in shared_ell_keys(lmeta, "local_")],
                    *[dev[k] for k in shared_ell_keys(hmeta, "halo_")],
                    dev["send_idx"], xp,
                ]
                if hybrid:
                    args += [dev["core_slab"], dev["core_own"]]
                if has_bcsr:
                    args += [dev[k] for k in _BCSR_KEYS]
                return jax.shard_map(
                    local_fn, mesh=mesh, in_specs=in_specs,
                    out_specs=P("nodes"),
                )(*args)

        permuted = self.order is not None

        def run(x, dev):
            # pad + reshard INSIDE the traced program (callable from a
            # caller's jit via raw_mul — no per-call host work)
            xp = x
            if permuted:  # original order -> cluster order
                xp = jnp.take(xp, dev["order"], axis=0)
            if self.n_pad != x.shape[0]:
                xp2 = jnp.zeros((self.n_pad, x.shape[1]), dtype=x.dtype)
                xp = xp2.at[: x.shape[0]].set(xp)
            xp = jax.lax.with_sharding_constraint(
                xp.reshape(self.nd, self.rows_per_dev, -1),
                self._x_sharding,
            )
            out = runner(dev, xp)
            out = out.reshape(self.n_pad, -1)[: self.nrows]
            if permuted:  # back to original order
                out = jnp.take(out, dev["inv_order"], axis=0)
            return out

        self._raw_run = run
        return jax.jit(run)

    @property
    def dev_arrays(self) -> dict:
        """Device-resident sharded tables for jit-argument threading
        (same contract as ``PreparedSpmm.dev_arrays``)."""
        return dict(self._dev)

    def raw_mul(self, x, dev: dict):
        """Unjitted product for composition inside caller jits — a whole
        multi-layer forward (exchange included) compiles to ONE program."""
        return self._raw_run(x, dev)

    def mul(self, x) -> jax.Array:
        if x.shape[0] != self.nrows:
            raise ValueError(f"x rows {x.shape[0]} != nrows {self.nrows}")
        return self._run(x, self.dev_arrays)

    def phase_times(self, x, iters: int = 3) -> dict:
        """Measured exchange vs compute split (the reference's
        load_dense/retrieve timer slots, spmm_mul_csr.c:563-580).

        ``all_to_all``: ``local_time`` runs only the local-edge scan (no
        exchange, no halo edges) — ``exchange_time`` is the difference.
        ``all_gather``: ``exchange_time`` times the collective alone."""
        from pygim_tpu.utils.timers import device_time

        mesh, nd, rpd = self.mesh, self.nd, self.rows_per_dev
        total = device_time(self.mul, x, iters=iters) * 1e3
        out = {"mul_time(ms)": total}
        xp = x
        if self.n_pad != self.nrows:
            xp = jnp.zeros((self.n_pad, x.shape[1]), dtype=x.dtype)
            xp = xp.at[: self.nrows].set(x)
        xp = jax.device_put(
            xp.reshape(nd, rpd, -1), self._x_sharding
        )
        if self.exchange in ("all_to_all", "ring"):
            from pygim_tpu.ops.spmm import shared_ell_keys

            lmeta = self._local_meta
            n_l = 3 * len(lmeta)

            def local_only(*args):
                xl = args[n_l]
                out = None
                for i, (lc, ld) in enumerate(lmeta):
                    c, v, r = args[3 * i: 3 * i + 3]
                    out = ell_scan_spmm(
                        xl[0], c[0], v[0], r[0], lc, ld, rpd, out=out
                    )
                return out[None]

            fn = jax.jit(jax.shard_map(
                local_only, mesh=mesh,
                in_specs=(P("nodes"),) * (n_l + 1),
                out_specs=P("nodes"),
            ))
            d = self._dev
            local = device_time(
                fn, *[d[k] for k in shared_ell_keys(lmeta, "local_")],
                xp, iters=iters,
            ) * 1e3
            out["local_time(ms)"] = local
            core = 0.0
            if self.hybrid_k_eff > 0:
                # hub-core split: slab matmul + the hub-feature
                # all_gather, alone (the reference's kernel-phase
                # discipline applied to the tier)
                def core_only(slab, own_hub, xl):
                    x_loc = xl[0]
                    hs = jnp.take(x_loc, own_hub[0], axis=0)
                    hub_x = jax.lax.all_gather(hs, "nodes", tiled=True)
                    return _core_matmul(slab[0], hub_x, jnp.float32)[None]

                cfn = jax.jit(jax.shard_map(
                    core_only, mesh=mesh, in_specs=(P("nodes"),) * 3,
                    out_specs=P("nodes"),
                ))
                core = device_time(
                    cfn, d["core_slab"], d["core_own"], xp, iters=iters,
                ) * 1e3
                out["core_time(ms)"] = core
            bcsr = 0.0
            if self.has_bcsr:
                b_step = self.bcsr_step

                def bcsr_only(tiles_, pidx, vb2rb, pnodes, rnodes, xl):
                    from pygim_tpu.ops.spmm import bcsr_scan_spmm

                    x_loc = xl[0]
                    carry = jnp.zeros(
                        (rpd, x_loc.shape[1]), jnp.float32
                    )
                    return bcsr_scan_spmm(
                        x_loc, pnodes[0], tiles_[0], pidx[0], vb2rb[0],
                        rnodes[0], carry, b_step,
                    )[None]

                bfn = jax.jit(jax.shard_map(
                    bcsr_only, mesh=mesh, in_specs=(P("nodes"),) * 6,
                    out_specs=P("nodes"),
                ))
                bcsr = device_time(
                    bfn, *[d[k] for k in _BCSR_KEYS], xp, iters=iters,
                ) * 1e3
                out["bcsr_time(ms)"] = bcsr
            out["exchange_time(ms)"] = max(
                0.0, total - local - core - bcsr
            )
        else:
            def gather_only(xl):
                xf = jax.lax.all_gather(xl[0], "nodes", tiled=True)
                return jnp.sum(xf, axis=0, dtype=jnp.float32)[None]

            fn = jax.jit(jax.shard_map(
                gather_only, mesh=mesh, in_specs=(P("nodes"),),
                out_specs=P("nodes"),
            ))
            exch = device_time(fn, xp, iters=iters) * 1e3
            out["exchange_time(ms)"] = exch
            out["local_time(ms)"] = max(0.0, total - exch)
        return out


def prepare_spmm_halo(
    graph, mesh: Mesh, config: Optional[SpmmConfig] = None,
    exchange: str = "all_to_all", order=None,
) -> PreparedSpmmHalo:
    """``order``: None (contiguous ids), a permutation array, or a
    locality method name ("rcm" / "lp" — core/cluster.py) used to
    cluster-partition the rows before sharding."""
    return PreparedSpmmHalo(graph, mesh, config, exchange, order=order)
