"""2D sp×ds distributed SpMM under ``shard_map``.

The reference's 2D parallelization (SURVEY.md §2.3):

* ``sp_parts`` — A split by columns (= x rows); partial results summed.
  Reference merges per-rank staging buffers on the host with memadd_2D
  (spmm_mul_csr.c:497-506); here the merge is ``psum`` over the ``sp``
  mesh axis, on device, riding ICI.
* ``ds_parts`` — x and the output split by feature columns; no reduction
  (memcpy_2D concatenation, spmm_mul_csr.c:492-496 → pure ``ds`` sharding).

Each (sp, ds) shard runs the grouped ELL formulation — the measured
single-chip winner (:func:`pygim_tpu.ops.spmm.ell_scan_spmm`, fused
gather+reduce over fixed-degree virtual rows) — on its A column-part ×
feature-slice tile, with optional hub-core/BCSR tiers stacked on top.
x is sharded 2D — rows over ``sp``, features over ``ds`` — so the dense
operand never exists replicated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pygim_tpu.core.graph import CsrGraph
from pygim_tpu.core.partition import round_up
from pygim_tpu.ops.spmm import SpmmConfig, _core_matmul, ell_scan_spmm


class PreparedSpmm2D:
    """Prepare-once/run-many over a 2D mesh.

    Analog of ``spmm_csr_to_device_group`` + ``spmm_csr_run_group``
    (pytorch_api.cpp:204-280) with the group = the device mesh. The sparse
    tables are laid out (sp, n_blocks, nnz_pad) and sharded on ``sp``
    (replicated over ``ds``); x is sharded (rows→sp, features→ds).
    """

    def __init__(
        self, graph, mesh: Mesh, config: Optional[SpmmConfig] = None,
        *, scatter_output: bool = False,
    ):
        config = config or SpmmConfig()
        if config.merge_duplicates:
            from pygim_tpu.core.graph import merge_duplicate_edges

            graph, _ = merge_duplicate_edges(graph)
        self.mesh = mesh
        self.config = config
        # scatter_output: reduce-scatter the sp-axis merge so the output
        # comes back fully sharded P("sp","ds") — rows over sp, features
        # over ds — instead of row-replicated P(None,"ds"). Halves the
        # merge traffic and leaves the result distributed for a following
        # sharded layer.
        self.scatter_output = scatter_output
        sp = mesh.shape["sp"]
        self.sp, self.ds = sp, mesh.shape["ds"]

        csr = graph if isinstance(graph, CsrGraph) else graph.to_csr()
        self.nrows, self.ncols = csr.nrows, csr.ncols
        # pad A's column count so x rows shard equally over sp
        self.ncols_pad = round_up(csr.ncols, sp)
        padded = CsrGraph(
            rowptr=csr.rowptr, colind=csr.colind, vals=csr.vals,
            ncols=self.ncols_pad,
        )
        parts = padded.col_split(sp)

        # distributed hybrid: the dense hub-core is column-sharded over sp
        # (shard s holds the core columns whose nodes live in its x rows),
        # so core memory scales down with sp and the existing psum merges
        # core and tail contributions together.
        self.hybrid_k_eff = 0
        self.has_bcsr = False
        if config.backend == "hybrid":
            if csr.nrows != csr.ncols:
                raise ValueError("hybrid backend requires square adjacency")
            self._plan_core_2d(csr, parts, config)
            if config.bcsr_bytes > 0:
                self._plan_bcsr_2d(csr, parts, config)

        # per-shard multi-degree ELL tables (the ell backend's
        # formulation, the fastest gather-engine path measured —
        # docs/PERF.md), with one static shape across all sp parts:
        # degrees chosen from the COMBINED histogram, per-table
        # virtual-row dim padded to the max over parts (pad rows have
        # val 0 / vrow nrows-1 — harmless additions that keep the segment
        # stream sorted).
        from pygim_tpu.ops.spmm import plan_shared_ell_tables

        stacked, self.ell_meta = plan_shared_ell_tables(
            parts, config, vfill=max(self.nrows - 1, 0)
        )
        self.ell_degree, self.row_chunk = (
            self.ell_meta[0][1], self.ell_meta[0][0],
        )
        sharded = NamedSharding(mesh, P("sp"))
        self._dev = {
            k: jax.device_put(v, sharded) for k, v in stacked.items()
        }
        self._x_sharding = NamedSharding(mesh, P("sp", "ds"))
        self._run = self._build_run()

    def _plan_core_2d(self, csr, parts, config: SpmmConfig):
        """Column-shard the dense hub-core over sp; strips core edges out
        of ``parts`` in place (the tail keeps only non-core edges)."""
        import ml_dtypes

        n, sp = csr.nrows, self.sp
        deg = np.diff(csr.rowptr).astype(np.int64)
        deg = deg + np.bincount(csr.colind, minlength=n)[:n]
        order = np.argsort(-deg).astype(np.int32)
        rank = np.empty(n, dtype=np.int32)
        rank[order] = np.arange(n, dtype=np.int32)

        core_dtype = config.hybrid_dtype or "float32"
        itemsize = {"bfloat16": 2, "int8": 1, "int4": 0.5}.get(core_dtype, 4)
        if config.hybrid_k is not None:
            k = max(1, min(config.hybrid_k, n))
        else:
            # per-shard core memory is ~k²/sp: the budget buys a √sp-larger core
            k = int(np.sqrt(config.hybrid_core_bytes * sp / itemsize))
            k = min(max((k // 256) * 256, min(256, n)), n)
        self.hybrid_k_eff = k

        # Part s's edges have source (col) nodes in shard s's x range, so
        # their core columns are exactly the ranked nodes shard s owns —
        # each shard's (k, k_col_pad) slice is built independently and cast
        # to the core dtype before the next is touched (one f32 scratch
        # slice of host RAM, never the full (k, k) dense core).
        w = self.ncols_pad // sp
        owner = order[:k] // w  # shard owning each ranked node's x row
        k_col_pad = max(8, int(np.bincount(owner, minlength=sp).max()))
        if core_dtype == "int4":
            k_col_pad += k_col_pad % 2  # nibble packing pairs slab columns
        # rank -> position within its shard's column slice
        pos_in_shard = np.zeros(k, dtype=np.int64)
        sels = []
        for s in range(sp):
            sel = np.flatnonzero(owner == s)
            pos_in_shard[sel] = np.arange(sel.size)
            sels.append(sel)
        np_core = {
            "bfloat16": ml_dtypes.bfloat16, "int8": np.int8,
            "int4": np.uint8,
        }.get(core_dtype, np.float32)
        # int4 tier: nibble-packed uint8, slab column pairs (2j, 2j+1)
        # per byte — matches the run path's even/odd dot pair over the
        # core_rows-gathered x slice (_core_matmul's uint8 branch)
        core_cols = k_col_pad // 2 if core_dtype == "int4" else k_col_pad
        cores = np.zeros((sp, k, core_cols), dtype=np_core)
        core_rows = np.zeros((sp, k_col_pad), dtype=np.int32)
        for s, p in enumerate(parts):
            lo = s * w
            rows_of = np.repeat(
                np.arange(p.nrows, dtype=np.int64), np.diff(p.rowptr)
            )
            rr = rank[rows_of]
            cc_global = p.colind.astype(np.int64) + lo
            cc = rank[np.minimum(cc_global, n - 1)]
            in_core = (rr < k) & (cc < k) & (cc_global < n)
            slab = np.zeros((k, k_col_pad), dtype=np.float32)
            np.add.at(slab, (rr[in_core], pos_in_shard[cc[in_core]]),
                      p.vals[in_core].astype(np.float32))
            if core_dtype in ("int8", "int4"):
                # cells not representable in the integer core dtype are
                # zeroed in the core and demoted to the exact ELL tail
                # (ops/spmm.py does the same on the single-chip path)
                from pygim_tpu.core.partition import int_demote_slab

                slab, bad_flat = int_demote_slab(slab, core_dtype)
                if bad_flat.size:
                    idx = np.flatnonzero(in_core)
                    e_flat = (
                        rr[idx].astype(np.int64) * k_col_pad
                        + pos_in_shard[cc[idx]]
                    )
                    demote = np.isin(e_flat, bad_flat)
                    in_core[idx[demote]] = False
            if core_dtype == "int4":
                from pygim_tpu.core.partition import pack_nibbles

                cores[s] = pack_nibbles(slab)
            else:
                cores[s] = slab.astype(np_core)
            del slab
            core_rows[s, : sels[s].size] = order[:k][sels[s]] - lo
            # strip core edges from the tail part (rebuild CSR)
            from pygim_tpu.core.partition import strip_csr

            parts[s] = strip_csr(p, ~in_core, rows_of)
        sharded = NamedSharding(self.mesh, P("sp"))
        self._core_dev = {
            "core": jax.device_put(cores, sharded),
            "core_rows": jax.device_put(core_rows, sharded),
            "core_nodes": jax.device_put(
                order[:k], NamedSharding(self.mesh, P())
            ),
        }
        self._rank, self._order = rank, order

    def _plan_bcsr_2d(self, csr, parts, config: SpmmConfig):
        """BCSR middle tier over the mesh (core/bcsr.py, sharded form).

        Rows keep the GLOBAL tile rank (partials scatter into the
        pre-psum (nrows, h) carry), but the panel (column) dimension is
        ranked PER SHARD — each x-shard's own nodes ordered by the tile
        rank — so a (128, H) panel gather only touches rows the shard
        holds. ``bcsr_bytes`` is the per-device tile budget, matching
        ``hybrid_core_bytes``'s per-device semantics. Captured edges are
        stripped from the ELL tail parts in place.
        """
        from pygim_tpu.core.bcsr import (
            TILE_COLS,
            build_bcsr_tiles,
            tail_tile_order,
        )

        n, sp = csr.nrows, self.sp
        w = self.ncols_pad // sp
        k = self.hybrid_k_eff
        rank, order = self._rank, self._order
        core_dtype = config.hybrid_dtype or "float32"
        bdt = (
            "bfloat16" if core_dtype in ("bfloat16", "int8") else "float32"
        )

        part_edges = []
        for s, p in enumerate(parts):
            rows_of = np.repeat(
                np.arange(p.nrows, dtype=np.int64), np.diff(p.rowptr)
            )
            part_edges.append(
                (rows_of, p.colind.astype(np.int64) + s * w, p.vals)
            )
        t_order, t_rank = order.astype(np.int64), rank
        if config.bcsr_order in ("rcm", "lp") and k < n:
            t_order, t_rank = tail_tile_order(
                np.concatenate([e[0] for e in part_edges]),
                np.concatenate([e[1] for e in part_edges]),
                t_order, rank, k, n, config.bcsr_order,
            )

        tr, tc = config.bcsr_tile, TILE_COLS
        bcs, captured = [], 0
        for s, p in enumerate(parts):
            rows_of, cols_g, vals = part_edges[s]
            lo, hi = s * w, min(n, s * w + w)
            n_s = max(1, hi - lo)
            loc_nodes = np.arange(lo, max(lo, hi), dtype=np.int64)
            loc_sorted = loc_nodes[
                np.argsort(t_rank[loc_nodes], kind="stable")
            ]
            col_rank_of = np.zeros(n_s, dtype=np.int64)
            col_rank_of[loc_sorted - lo] = np.arange(loc_sorted.size)
            bc, in_tile = build_bcsr_tiles(
                t_rank[rows_of],
                col_rank_of[np.minimum(cols_g - lo, n_s - 1)],
                vals,
                t_order,
                n=n,
                tile_rows=tr,
                budget_bytes=config.bcsr_bytes,
                hidden=config.hidden_hint,
                dtype=bdt,
                min_edges=config.bcsr_min_edges,
                col_order=loc_sorted,
                n_cols=n_s,
            )
            if bc is not None:
                from pygim_tpu.core.partition import strip_csr

                parts[s] = strip_csr(p, ~in_tile, rows_of)
                captured += bc.n_edges
            bcs.append(bc)
        if captured == 0:
            return

        # ---- pad per-shard tables to one static shape ----
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
            (sp, n_vb_pad, s_max, tr, tc),
            dtype=next(b for b in bcs if b is not None).tiles.dtype,
        )
        np_pidx = np.zeros((sp, n_vb_pad, s_max), dtype=np.int32)
        np_vb2rb = np.zeros((sp, n_vb_pad), dtype=np.int32)
        np_pnodes = np.zeros((sp, np_max), dtype=np.int32)
        np_rnodes = np.full((sp, nr_max), n - 1, dtype=np.int32)
        for s, bc in enumerate(bcs):
            if bc is None:
                continue
            nv, sv = bc.tiles.shape[0], bc.tiles_per_vblock
            np_tiles[s, :nv, :sv] = bc.tiles
            np_pidx[s, :nv, :sv] = bc.panel_idx
            n_rb = bc.row_nodes.shape[0] // tr
            np_vb2rb[s] = n_rb - 1  # padded vblocks target the last rb
            np_vb2rb[s, :nv] = bc.vblock_to_rb
            # panel gathers index the SHARD-LOCAL x block
            np_pnodes[s, : bc.panel_nodes.shape[0]] = (
                bc.panel_nodes - s * w
            )
            np_rnodes[s, : bc.row_nodes.shape[0]] = bc.row_nodes
        sharded = NamedSharding(self.mesh, P("sp"))
        self._bcsr_dev = {
            "tiles": jax.device_put(np_tiles, sharded),
            "panel_idx": jax.device_put(np_pidx, sharded),
            "vblock_to_rb": jax.device_put(np_vb2rb, sharded),
            "panel_nodes": jax.device_put(np_pnodes, sharded),
            "row_nodes": jax.device_put(np_rnodes, sharded),
        }
        self.has_bcsr = True
        self.bcsr_step = step
        self.bcsr_edges = captured

    def _build_run(self):
        mesh = self.mesh
        meta = self.ell_meta
        n_ell = 3 * len(meta)
        hybrid = self.hybrid_k_eff > 0
        scatter = self.scatter_output
        sp = self.sp
        # scatter mode pads rows so each sp shard owns an equal row block
        self.nrows_pad = round_up(self.nrows, sp) if scatter else self.nrows
        nrows = self.nrows_pad

        has_bcsr = self.has_bcsr
        b_step = self.bcsr_step if has_bcsr else 0

        def mk_local_fn(merge: bool):
            def local_fn(*args):
                ell_args, x_local = args[:n_ell], args[n_ell]
                rest = args[n_ell + 1:]
                # leading sp dim arrives as size-1 block; squeeze it.
                # Tables hold disjoint row sets — accumulate in any order.
                out = None
                for i, (chunk, degree) in enumerate(meta):
                    c, v, r = ell_args[3 * i: 3 * i + 3]
                    out = ell_scan_spmm(
                        x_local, c[0], v[0], r[0], chunk, degree, nrows,
                        out=out,
                    )
                if hybrid:
                    core, core_rows, core_nodes = rest[:3]
                    co = _core_matmul(
                        core[0], jnp.take(x_local, core_rows[0], axis=0),
                        jnp.float32,
                    )
                    out = out.at[core_nodes].add(co.astype(out.dtype))
                if has_bcsr:
                    from pygim_tpu.ops.spmm import bcsr_scan_spmm

                    tiles_, pidx, vb2rb, pnodes, rnodes = rest[3:8]
                    # wide integer payloads exceed bf16's exact range
                    # (same choice as the single-chip run builder)
                    wide = (
                        jnp.issubdtype(x_local.dtype, jnp.integer)
                        and x_local.dtype != jnp.int8
                    )
                    out = bcsr_scan_spmm(
                        x_local, pnodes[0], tiles_[0], pidx[0],
                        vb2rb[0], rnodes[0], out, b_step,
                        compute_dtype=jnp.float32 if wide else None,
                    )
                if not merge:
                    return out  # per-shard partial (phase timing only)
                if scatter:
                    # reduce-scatter over sp: each shard keeps its row block
                    return jax.lax.psum_scatter(
                        out, "sp", scatter_dimension=0, tiled=True
                    )
                return jax.lax.psum(out, "sp")

            return local_fn

        in_specs = [P("sp")] * n_ell + [P("sp", "ds")]
        if hybrid:
            in_specs += [P("sp"), P("sp"), P()]
        if has_bcsr:
            in_specs += [P("sp")] * 5
        shard_fn = jax.shard_map(
            mk_local_fn(True),
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P("sp", "ds") if scatter else P(None, "ds"),
        )
        shard_fn_local = jax.shard_map(
            mk_local_fn(False),
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P("sp", "ds"),
        )

        def mk_run(fn, trim_rows):
            def run(x, dev):
                # pad + reshard INSIDE the traced program — callable from a
                # caller's jit (raw_mul) with no per-call host work; padding
                # is a traced zeros+set, resharding a GSPMD constraint
                h = x.shape[1]
                h_pad = round_up(h, self.ds)
                xp = x
                if self.ncols_pad != x.shape[0] or h_pad != h:
                    xp = jnp.zeros((self.ncols_pad, h_pad), dtype=x.dtype)
                    xp = xp.at[: x.shape[0], :h].set(x)
                xp = jax.lax.with_sharding_constraint(xp, self._x_sharding)
                from pygim_tpu.ops.spmm import shared_ell_keys

                args = [dev[k] for k in shared_ell_keys(meta)] + [xp]
                if hybrid:
                    args += [dev["core"], dev["core_rows"], dev["core_nodes"]]
                if has_bcsr:
                    args += [
                        dev["tiles"], dev["panel_idx"],
                        dev["vblock_to_rb"], dev["panel_nodes"],
                        dev["row_nodes"],
                    ]
                out = fn(*args)
                if trim_rows:
                    out = out[: self.nrows]
                return out[:, :h] if h_pad != h else out

            return run

        self._raw_run = mk_run(shard_fn, scatter)
        local_j = jax.jit(mk_run(shard_fn_local, False))
        self._run_local = lambda x: local_j(x, self.dev_arrays)
        return jax.jit(self._raw_run)

    @property
    def dev_arrays(self) -> dict:
        """Device-resident sharded tables — thread through YOUR jit and
        use :meth:`raw_mul` inside, exactly like the single-chip
        ``PreparedSpmm`` (closing over ``.mul`` would bake the tables in
        as HLO constants)."""
        out = dict(self._dev)
        if self.hybrid_k_eff > 0:
            out.update(self._core_dev)
        if self.has_bcsr:
            out.update(self._bcsr_dev)
        return out

    def raw_mul(self, x, dev: dict):
        """Unjitted product for composition inside caller jits — the
        whole multi-layer forward compiles to ONE program (the
        one-run-call-per-multiply discipline of the reference's
        pytorch_api.cpp:248-280)."""
        return self._raw_run(x, dev)

    def mul(self, x) -> jax.Array:
        """out = A @ x. Pads/reshards inside the jit, runs, trims."""
        if x.shape[0] != self.ncols:
            raise ValueError(f"x rows {x.shape[0]} != A cols {self.ncols}")
        return self._run(x, self.dev_arrays)

    def phase_times(self, x, iters: int = 3) -> dict:
        """Measured phase split: full mul vs the same program with the
        sp-merge collective removed (each shard keeps its partial).
        ``psum_time`` is the difference — the ICI merge cost the
        reference accounted as its host memadd phase
        (spmm_mul_csr.c:497-506)."""
        from pygim_tpu.utils.timers import device_time

        total = device_time(self.mul, x, iters=iters) * 1e3
        local = device_time(self._run_local, x, iters=iters) * 1e3
        return {
            "mul_time(ms)": total,
            "local_time(ms)": local,
            "psum_time(ms)": max(0.0, total - local),
        }


def prepare_spmm_2d(
    graph, mesh: Mesh, config: Optional[SpmmConfig] = None,
    *, scatter_output: bool = False, **kw
) -> PreparedSpmm2D:
    """Entry point — the distributed analog of ``prepare_pim_spmm``."""
    if config is None:
        config = SpmmConfig(**kw)
    elif kw:
        config = dataclasses.replace(config, **kw)
    return PreparedSpmm2D(graph, mesh, config, scatter_output=scatter_output)
