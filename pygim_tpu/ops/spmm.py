"""Prepare-once / run-many SpMM on TPU.

The reference's key invariant — sparse operand "prepared" once (partitioned,
padded, copied to device) and multiplied many times (`to_device_group` vs
`run_group`, SURVEY.md §1) — maps here to: :func:`prepare_spmm` plans,
pads, and uploads static block tables to HBM, returning a
:class:`PreparedSpmm` whose :meth:`~PreparedSpmm.mul` is a cached-jit
function of the dense operand only.

Backends
--------
``oracle``   one-shot gather+segment_sum (spmm_host_* analog; small graphs).
``blocked``  nnz-balanced row blocks under ``lax.scan`` — bounded memory
             (one block's (nnz_pad, H) gather live at a time), XLA fuses the
             gather, multiply and sorted segment-sum per step. The analog of
             the DPU hot loop (spmm_mul_csr_dpu.c:108-126) expressed as
             compiler-friendly dataflow.
``coo``      exact-nnz chunks with mid-row cuts; chunk partials are summed
             into the full output (the segmented-reduction answer to the
             reference's four tasklet lock schemes, SURVEY.md §5.2).
``hybrid``   dense hub-core (MXU) + BCSR tile tier + ELL tail — the
             measured-best formulation for power-law graphs (docs/PERF.md).

A hand-written Pallas backend existed through round 2 and was RETIRED:
the round-1 kernel study (docs/PERF.md "The wall") measured the per-edge
scalar loop in VMEM at the same ~7 ns/edge as XLA's gather engine, and
Mosaic rejects every multi-row formulation (single-row DMA from tiled
HBM, sublane-dim take, unaligned 1-D slices), so the kernel could never
beat the XLA formulations it duplicated. See docs/PERF.md "Pallas
retirement" for the full basis.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pygim_tpu.core.graph import CooGraph, CsrGraph
from pygim_tpu.core.partition import (
    build_coo_chunks,
    build_ell_blocks,
    make_row_block_plan,
    round_up,
    row_slot_table,
)
from pygim_tpu.ops.reference import (
    accum_dtype,
    spmm_coo_oracle,
    spmm_coo_oracle_chunked,
)


@dataclasses.dataclass(frozen=True)
class SpmmConfig:
    """Runtime configuration — the collapse of the reference's three config
    tiers (compile-time -D flags, CLI, sweep DSL; SURVEY.md §5.6) into one.

    ``block_nnz_budget`` bounds per-step gather memory: n_blocks is chosen
    so each block holds at most ~budget nnz (pre-balance).
    """

    format: str = "csr"              # csr | coo
    backend: str = "blocked"         # oracle | blocked | ell | coo | hybrid
    balance: str = "nnz"             # nnz | row   (partition.c analogs)
    n_blocks: Optional[int] = None   # explicit override
    block_nnz_budget: int = 1 << 17  # ~128k nnz/block
    ell_degree: Optional[int] = None # ell backend: fixed degree (auto=None)
    ell_tables: int = 3              # auto-degree: max multi-degree ELL
                                     # tables (choose_ell_degrees); a
                                     # pinned ell_degree forces 1 table.
                                     # Multi-degree splits rows across
                                     # per-degree tables so short rows
                                     # stop paying padding and long rows
                                     # stop paying per-virtual-row
                                     # overhead (measured −24 ms of the
                                     # 65 ms reddit tail, docs/PERF.md
                                     # round 4)
    hidden_hint: int = 256           # expected dense width (memory guard
                                     # for the auto degree chooser)
    # hybrid backend: dense hub-core on the MXU + ELL tail via gather.
    hybrid_k: Optional[int] = None         # core size (auto from budget;
                                           # 0 disables the dense core)
    hybrid_core_bytes: int = 4 << 30       # core memory budget
    hybrid_dtype: Optional[str] = None     # core dtype (None = vals dtype;
                                           # 'bfloat16' halves core traffic;
                                           # 'int8' halves it again for
                                           # integer-valued graphs; 'int4'
                                           # (nibble-packed, cells in
                                           # [-8, 7])
                                           # once more — k grows √2 per
                                           # halving)
    # hybrid BCSR middle tier: dense (bcsr_tile, 128) tiles in rank space
    # between the core and the ELL tail (core/bcsr.py). 0 bytes = off.
    bcsr_bytes: int = 0                    # tile-store budget
    bcsr_tile: int = 32                    # tile rows Tr
    bcsr_min_edges: int = 0                # edges/tile cutoff (0 = auto
                                           # from the marginal model)
    bcsr_order: str = "rank"               # tile ordering: "rank" (degree)
                                           # or "rcm" (tail locality)
    bcsr_layout: str = "row"               # scheduling: "row" (row-block
                                           # major) or "panel" (column-
                                           # block major, amortized panel
                                           # reads — lower edge cutoff)
    # hybrid core REGION in rank space: "square" = the classic [0,k)²
    # hub block; "stair" = the byte-optimal superlevel-set staircase —
    # ≤ stair_max_bands dense row bands of tapering column width chosen
    # by core/stair.py (measured on reddit-sim: 99.36% edge coverage at
    # 12 GiB vs the square's 96.85% — the tail is issue-bound, so
    # coverage per byte is the single-chip headline lever; round 5)
    hybrid_shape: str = "square"
    stair_max_bands: int = 8
    # merge duplicate (row, col) entries at prepare — a semantic no-op
    # for SpMM that shrinks every gather tier (core/graph.py
    # merge_duplicate_edges). R-MAT-style generators emit multi-edges:
    # reddit-sim stores 114.6M edges over 78.8M unique pairs (1.45x),
    # and int-core demotions drop from per-duplicate-edge to per-cell.
    merge_duplicates: bool = True
    # oracle backend: stream edges through a lax.scan in chunks of this
    # many edges instead of one (nnz, H) gather+segment_sum. Same math;
    # bounds forward AND autodiff-transpose memory, so the oracle ARM of
    # trained-parity fits at flagship scale (reference.py
    # spmm_coo_oracle_chunked). None = the plain one-shot oracle.
    oracle_edge_chunk: Optional[int] = None

    def resolve_n_blocks(self, nnz: int) -> int:
        if self.n_blocks is not None:
            return self.n_blocks
        return max(1, -(-nnz // self.block_nnz_budget))


def blocked_spmm(colind, vals, rowloc, row_slot, x, rows_pad: int):
    """The blocked gather+sorted-segment-sum product, reusable by the
    single-chip backend and the per-shard body of the 2D mesh backend.

    ``colind``/``vals``/``rowloc``: (n_blocks, nnz_pad) static ELL tables;
    ``row_slot``: (nrows,) map from global row to flattened padded slot;
    ``x``: (ncols, H). Returns (nrows, H) in the accumulation dtype.
    """
    acc = accum_dtype(jnp.result_type(vals.dtype, x.dtype))
    if x.shape[0] == 0 or colind.shape[0] == 0:
        # zero-column or zero-edge shard: the padding indices in the
        # tables would take() from an empty x axis — the product is
        # exact zeros by definition
        return jnp.zeros((row_slot.shape[0], x.shape[1]), acc)

    def body(_, blk):
        ci, v, rl = blk
        g = jnp.take(x, ci, axis=0).astype(acc) * v.astype(acc)[:, None]
        out_b = jax.ops.segment_sum(
            g, rl, num_segments=rows_pad, indices_are_sorted=True
        )
        return None, out_b

    _, out_blocks = jax.lax.scan(body, None, (colind, vals, rowloc))
    flat = out_blocks.reshape(-1, x.shape[1])
    return jnp.take(flat, row_slot, axis=0)


def ell_step_tables(cols2d, vals2d, vrow_to_row, chunk):
    """Repack (nvr_pad, D) ELL tables into the scan's native layout:
    ``(n_steps, chunk·D)`` flat steps + ``(n_steps, chunk)`` row targets.

    Two reasons this is the STORED device layout (host-side reshape at
    prepare, not in the jit): a (nvr, D) array tiles its last dim to 128
    lanes — 2.7× HBM at the typical D≈48 — and the in-jit reshape
    materialized a full padded COPY of both tables per compiled program
    (measured 2×1.36 GB of HLO temp at ogbn-products scale)."""
    nvr, d = cols2d.shape
    n_steps = nvr // chunk
    return (
        np.ascontiguousarray(cols2d).reshape(n_steps, chunk * d),
        np.ascontiguousarray(vals2d).reshape(n_steps, chunk * d),
        np.ascontiguousarray(vrow_to_row).reshape(n_steps, chunk),
    )


def _ell_suffix(i: int) -> str:
    """Device/host key suffix of ELL table ``i``: table 0 keeps the
    historical unsuffixed names (cols2d/vals2d/vrow_to_row)."""
    return "" if i == 0 else f"_{i}"


def _ell_chunk(config, degree: int) -> int:
    """Rows per scan step so each step gathers ~block_nnz_budget slots."""
    return max(8, round_up(max(1, config.block_nnz_budget // degree), 8))


def _plan_ell_tables(csr, config) -> "list[tuple[int, object]]":
    """Multi-degree ELL planning shared by the ell backend and the hybrid
    tail: rows split across per-degree tables by the measured cost model
    (core/partition.py:choose_ell_degrees — padding vs per-virtual-row
    overhead). A pinned ``config.ell_degree`` or ``ell_tables <= 1``
    collapses to the single-table layout. Returns [(chunk, EllRows)]."""
    from pygim_tpu.core.partition import (
        build_ell_rows_multi,
        choose_degrees_for_config,
    )

    degrees = choose_degrees_for_config(csr.row_lengths, config)
    tables = build_ell_rows_multi(
        csr, degrees, hidden=config.hidden_hint,
        row_chunk_for=lambda D: _ell_chunk(config, D),
    )
    return [(_ell_chunk(config, t.degree), t) for t in tables]


def _install_ell_tables(dev: dict, tables) -> "list[tuple[int, int]]":
    """Upload planned tables into ``dev`` in step layout; returns the
    static metadata [(chunk, degree)] the run paths close over."""
    meta = []
    for i, (chunk, t) in enumerate(tables):
        c3, v3, r3 = ell_step_tables(t.cols, t.vals, t.vrow_to_row, chunk)
        sfx = _ell_suffix(i)
        dev[f"cols2d{sfx}"] = jnp.asarray(c3)
        dev[f"vals2d{sfx}"] = jnp.asarray(v3)
        dev[f"vrow_to_row{sfx}"] = jnp.asarray(r3)
        meta.append((chunk, t.degree))
    return meta


def _ell_tail_all(x, dev: dict, meta, nrows: int, out=None, part_of=None):
    """Run every ELL table, accumulating into one output. Tables hold
    disjoint row sets (build_ell_rows_multi), so order is irrelevant.
    ``part_of(chunk, degree) -> part_fn`` customizes the per-block body
    (fused quantization); default is the plain weighted reduce."""
    for i, (chunk, degree) in enumerate(meta):
        sfx = _ell_suffix(i)
        args = (
            dev[f"cols2d{sfx}"], dev[f"vals2d{sfx}"],
            dev[f"vrow_to_row{sfx}"],
        )
        if part_of is None:
            out = ell_scan_spmm(x, *args, chunk, degree, nrows, out=out)
        else:
            out = part_of(x, *args, chunk, degree, nrows, out=out)
    return out


def _ell_tail_core_interleaved(x, dev, meta, nrows, inter, core_fn):
    """Hybrid tail + core with the core row slabs interleaved into each
    table's scan (see :func:`_ell_grouped_scan`). ``inter`` is the
    prepare-time ``(slabs, steps, k)`` plan; table *i*'s share of core
    rows is device-resident as ``dev["core3d{sfx}"]`` of shape
    (steps_i, slab_i, cols) and streams through the scan as xs
    (PreparedSpmm._install_core has the measured history of why).
    ``core_fn(slab) -> (slab_rows, H)`` computes one slab's product
    against the (already gathered/quantized) core payload. Returns
    ``(out, core_out)`` with ``core_out`` trimmed back to the plan's
    k rows (pad rows dropped)."""
    slabs, steps, k = inter
    out, cparts = None, []
    for i, (chunk, degree) in enumerate(meta):
        sfx = _ell_suffix(i)
        args = (
            dev[f"cols2d{sfx}"], dev[f"vals2d{sfx}"],
            dev[f"vrow_to_row{sfx}"], chunk, degree, nrows,
        )
        core3d = dev.get(f"core3d{sfx}")
        if core3d is None or slabs[i] * steps[i] == 0:
            out = ell_scan_spmm(x, *args, out=out)
            continue
        out, cp = ell_scan_spmm(
            x, *args, out=out, core3d=core3d, core_fn=core_fn,
        )
        cparts.append(cp)
    core_out = (
        cparts[0] if len(cparts) == 1 else jnp.concatenate(cparts)
    )[:k]
    return out, core_out


def plan_shared_ell_tables(parts, config, vfill: int):
    """Multi-degree ELL tables with ONE static shape across SPMD shards.

    The shard_map paths (parallel/spmm_2d.py, parallel/halo.py) need
    identical per-shard table shapes, so unlike the single-chip planner
    (:func:`_plan_ell_tables`) the degrees come from the COMBINED degree
    histogram of all parts and every part materializes every table
    (possibly empty — ``build_ell_rows_multi(keep_empty=True)``), padded
    to the max virtual-row count over parts.

    Returns ``(stacked, meta)``: ``stacked["cols2d{sfx}"]`` etc. are
    numpy arrays in step layout stacked over parts (leading device dim,
    caller shards them); ``meta`` is the static ``[(chunk, degree)]``
    list the run paths close over. Padding rows carry val 0 and vrow
    ``vfill`` (callers pass their last local row, keeping the per-shard
    segment stream sorted and the extra adds harmless)."""
    from pygim_tpu.core.partition import (
        build_ell_rows_multi,
        choose_degrees_for_config,
    )

    all_len = np.concatenate([p.row_lengths for p in parts])
    degrees = choose_degrees_for_config(all_len, config)
    per_part = [
        build_ell_rows_multi(
            p, degrees, hidden=config.hidden_hint,
            row_chunk_for=lambda D: _ell_chunk(config, D),
            keep_empty=True,
        )
        for p in parts
    ]
    stacked, meta = {}, []
    for i, D in enumerate(degrees):
        chunk = _ell_chunk(config, D)
        nvr = round_up(
            max(tabs[i].cols.shape[0] for tabs in per_part), chunk
        )

        def pad(a, fill=0):
            out = np.full((nvr,) + a.shape[1:], fill, dtype=a.dtype)
            out[: a.shape[0]] = a
            return out

        steps = [
            ell_step_tables(
                pad(tabs[i].cols), pad(tabs[i].vals),
                pad(tabs[i].vrow_to_row, vfill), chunk,
            )
            for tabs in per_part
        ]
        sfx = _ell_suffix(i)
        stacked[f"cols2d{sfx}"] = np.stack([t[0] for t in steps])
        stacked[f"vals2d{sfx}"] = np.stack([t[1] for t in steps])
        stacked[f"vrow_to_row{sfx}"] = np.stack([t[2] for t in steps])
        meta.append((chunk, D))
    return stacked, meta


def shared_ell_keys(meta, prefix: str = "") -> "list[str]":
    """Flat device-dict key list for ``meta`` tables, in the positional
    order the shard_map run bodies consume them."""
    keys = []
    for i in range(len(meta)):
        sfx = _ell_suffix(i)
        keys += [
            f"{prefix}cols2d{sfx}", f"{prefix}vals2d{sfx}",
            f"{prefix}vrow_to_row{sfx}",
        ]
    return keys


# Per-call byte cap on the stacked ELL partial. Grouping trades the
# round-1 single segment-sum (fast, but an (nvr, H) HLO temp — 2.9 GB at
# ogbn-products scale) against the round-2 per-step scatter carry (memory
# -lean, but measured 819→657 GB/s on reddit: the (nrows, H) scan carry
# re-materializes per step). The grouped form stacks at most this many
# bytes of partials per group and scatter-adds once per group — one group
# on reddit (bit-identical to the fast path), ~12 on products.
ELL_PARTIAL_BYTES = int(
    os.environ.get("PYGIM_ELL_PARTIAL_BYTES", 256 << 20)
)
# Unrolled-group cap: each group is its own (scan + scatter-add) pair in
# the HLO, so unbounded group counts bloat the program (remote compiles
# on the tunnel are minutes-per-program); past the cap the partial budget
# is allowed to grow instead.
ELL_MAX_GROUPS = int(os.environ.get("PYGIM_ELL_MAX_GROUPS", 24))


def _group_inner(n_steps: int, bytes_per_step: int) -> int:
    """Steps per group: honor ELL_PARTIAL_BYTES, but never exceed
    ELL_MAX_GROUPS groups."""
    if n_steps <= 0:
        return 1
    inner = max(1, ELL_PARTIAL_BYTES // max(1, bytes_per_step))
    inner = max(inner, -(-n_steps // ELL_MAX_GROUPS))
    return min(inner, n_steps)


def _ell_grouped_scan(x, cols2d, vals2d, vrow_to_row, chunk, degree,
                      nrows, out, part_fn, core3d=None, core_fn=None):
    """Shared grouped ELL driver. ``part_fn(gathered, vals) -> (chunk, H)``
    partial sums in the accumulation dtype. Groups are static slices of
    the step stream (unrolled outer loop — no (nrows, H) scan carry);
    each group runs an inner ``lax.scan`` stacking ≤ ELL_PARTIAL_BYTES of
    partials, then one sorted scatter-add (the virtual-row stream is
    globally non-decreasing, so every slice is sorted too).

    ``core3d``/``core_fn``: optional hub-core interleaving. ``core3d``
    is this table's share of core rows, stored (n_steps, slab, cols) so
    each scan step streams one slab as xs — the formulation that gets
    XLA's loop-operand prefetch/double-buffering and measured 1.29×
    gather/MXU concurrency on v5e (tools/overlap_probe.py). Each step
    additionally computes ``core_fn(slab) -> (slab, H)``, so the
    MXU-bound core product and the issue-bound gather ride the SAME
    scan. Per-step ``dynamic_slice`` from a 2-D core measured ZERO
    overlap at full scale, and static per-table slices OOM'd — see
    PreparedSpmm._install_core. Returns ``(out, core_parts)`` with
    ``core_parts`` of shape (n_steps·slab, H) when interleaving, else
    just ``out``."""
    h = x.shape[1]
    n_steps = cols2d.shape[0]
    if n_steps == 0 or x.shape[0] == 0:
        # zero-edge or zero-column shard: nothing to gather. The tables
        # may still pad to ≥1 step, but a take() from a 0-row x raises
        # (and x[0, 0]-style probes read out of bounds) — return exact
        # zeros in the accumulation dtype, which part_fn.acc already
        # derives from x's dtype in both callers.
        out = jnp.zeros((nrows, h), part_fn.acc) if out is None else out
        if core3d is not None:
            return out, jnp.zeros((0, h), part_fn.acc)
        return out
    core_slab = 0 if core3d is None else int(core3d.shape[1])
    # group sizing counts BOTH stacked buffers: the (chunk, H) tail
    # partials and, when interleaving, the (slab, H) core partials
    inner = _group_inner(n_steps, (chunk + core_slab) * h * 4)

    def body(_, blk):
        if core3d is None:
            c, v = blk
        else:
            c, v, cs = blk
        g = jnp.take(x, c, axis=0).reshape(chunk, degree, h)
        if core3d is None:
            return None, part_fn(g, v)
        return None, (part_fn(g, v), core_fn(cs))

    core_parts = []
    for lo in range(0, n_steps, inner):
        hi = min(lo + inner, n_steps)
        xs = (cols2d[lo:hi], vals2d[lo:hi])
        if core3d is not None:
            xs = xs + (core3d[lo:hi],)
        _, parts = jax.lax.scan(body, None, xs)
        if core3d is not None:
            parts, cp = parts
            core_parts.append(cp.reshape((hi - lo) * core_slab, h))
        seg = parts.reshape((hi - lo) * chunk, h)
        rows = vrow_to_row[lo:hi].reshape((hi - lo) * chunk)
        if out is None:
            out = jax.ops.segment_sum(
                seg, rows, num_segments=nrows, indices_are_sorted=True
            )
        else:
            out = out.at[rows].add(
                seg.astype(out.dtype), indices_are_sorted=True
            )
    if core3d is not None:
        return out, (
            core_parts[0]
            if len(core_parts) == 1
            else jnp.concatenate(core_parts)
        )
    return out


def ell_scan_spmm_quant(
    x, q_scale, q_dtype, cols2d, vals2d, vrow_to_row, chunk, degree, nrows,
    out=None,
):
    """ELL scan with symmetric quantization FUSED into the gather
    consumer: each gathered block is ``round(g / q_scale)`` cast to the
    integer dtype in registers — bit-identical to quantizing x up front
    (same rounding, same integer accumulation) but the (N, H) quantized
    copy of x is never materialized and no separate dequantize pass runs
    (the reference's quantize-in-aggregate hook, pyg_gcn_conv.py:130-137,
    taken one step further). Tables in step layout (ell_step_tables);
    grouped accumulation (_ell_grouped_scan) bounds the stacked partial."""
    acc = accum_dtype(jnp.result_type(vals2d.dtype, jnp.dtype(q_dtype)))

    def part_fn(g, v):
        # divide (not multiply-by-reciprocal): bit-identical rounding
        # to the unfused symmetric_quantize (quant/__init__.py:40)
        q = jnp.round(g / q_scale).astype(q_dtype)
        return jnp.sum(
            q.astype(acc) * v.reshape(chunk, degree, 1).astype(acc),
            axis=1,
        )

    part_fn.acc = acc
    return _ell_grouped_scan(
        x, cols2d, vals2d, vrow_to_row, chunk, degree, nrows, out, part_fn
    )


def ell_scan_spmm(x, cols2d, vals2d, vrow_to_row, chunk, degree, nrows,
                  out=None, core3d=None, core_fn=None):
    """The ell backend's compute body (shared with the hybrid tail):
    fixed-degree gather + fused weighted reduce under ``lax.scan``,
    accumulated in memory-bounded groups (_ell_grouped_scan): each group
    stacks ≤ ELL_PARTIAL_BYTES of per-step partials and scatter-adds once
    (sorted — the virtual-row stream is non-decreasing). Tables in step
    layout (ell_step_tables: (n_steps, chunk·D) / (n_steps, chunk))."""
    acc = accum_dtype(jnp.result_type(vals2d.dtype, x.dtype))

    def part_fn(g, v):
        return jnp.sum(
            g.astype(acc) * v.reshape(chunk, degree, 1).astype(acc),
            axis=1,
        )

    part_fn.acc = acc
    return _ell_grouped_scan(
        x, cols2d, vals2d, vrow_to_row, chunk, degree, nrows, out, part_fn,
        core3d=core3d, core_fn=core_fn,
    )


def _nibble_halves(packed, cdt):
    """Sign-extended (lo, hi) nibble planes of a packed (k, k/2) uint8
    int4 core, as ``cdt``. Pure elementwise — XLA fuses both transforms
    into the dot operand reads (measured temp-free at k=32768, E8)."""
    lo = (packed & 0xF).astype(jnp.int8)
    lo = lo - jnp.where(lo > 7, jnp.int8(16), jnp.int8(0))
    hi = (packed >> 4).astype(jnp.int8)
    hi = hi - jnp.where(hi > 7, jnp.int8(16), jnp.int8(0))
    return lo.astype(cdt), hi.astype(cdt)


# int32 temp budget for the chunked wide-integer core product; module
# constant so tests can shrink it to exercise the multi-chunk path
_WIDE_INT_CHUNK_BYTES = 1 << 28


def _wide_int_core_dot(core, xq):
    """Exact int32 core product for WIDE integer payloads (int16/int32
    quantization, |q| up to 2^19 — not s8-representable): the stored
    int8/packed-int4 core must promote to int32, but a whole-core
    ``astype`` materializes a 4×(int8)–8×(int4) temp (~24 GiB at the
    products core) — an HBM OOM. Promote CHUNKED instead: scan row
    chunks of the core, convert + dot each (≤256 MB of int32 temp),
    and stitch the (k, H) product. The last chunk overlaps (clamped
    start) rather than padding the multi-GiB core."""
    k = core.shape[0]
    # temp budget per chunk = chunk · (unpacked cols) · 4 B int32; use
    # the actual column count (cores are square ONLY in the standalone
    # case — the interleaved per-slab calls have k = slab rows while
    # cols keep the full core width, and packed uint8 unpacks 2× cols)
    cols = core.shape[1] * (2 if core.dtype == jnp.uint8 else 1)
    chunk = max(256, min(k, _WIDE_INT_CHUNK_BYTES // max(1, 4 * cols)))
    n_steps = -(-k // chunk)
    if n_steps <= 1:
        if core.dtype == jnp.uint8:
            lo, hi = _nibble_halves(core, jnp.int32)
            return jnp.dot(lo, xq[0::2], preferred_element_type=jnp.int32) \
                + jnp.dot(hi, xq[1::2], preferred_element_type=jnp.int32)
        return jnp.dot(
            core.astype(jnp.int32), xq, preferred_element_type=jnp.int32
        )

    def body(carry, i):
        start = jnp.minimum(i * chunk, k - chunk)
        blk = jax.lax.dynamic_slice(
            core, (start, jnp.int32(0)), (chunk, core.shape[1])
        )
        if core.dtype == jnp.uint8:
            lo, hi = _nibble_halves(blk, jnp.int32)
            part = jnp.dot(
                lo, xq[0::2], preferred_element_type=jnp.int32
            ) + jnp.dot(hi, xq[1::2], preferred_element_type=jnp.int32)
        else:
            part = jnp.dot(
                blk.astype(jnp.int32), xq, preferred_element_type=jnp.int32
            )
        return jax.lax.dynamic_update_slice(
            carry, part, (start, jnp.int32(0))
        ), None

    out0 = jnp.zeros((k, xq.shape[1]), dtype=jnp.int32)
    out, _ = jax.lax.scan(
        body, out0, jnp.arange(n_steps, dtype=jnp.int32)
    )
    return out


def _core_matmul(core, xq, acc):
    """Dense hub-core product with dtype-aware MXU routing. An int8 core
    multiplies int8 payloads on the MXU's double-rate s8 path with exact
    int32 accumulation; wider integer payloads (int16/int32 quantization,
    |q| up to 2^19 — not int8-representable) promote to int32 in bounded
    row chunks (:func:`_wide_int_core_dot`); float payloads ride bf16
    (core cells are integers ≤127, exact in bf16's 8-bit mantissa).
    Non-int8 cores keep their native dtype.

    A uint8 core is the nibble-packed int4 tier (0.5 B/cell in HBM —
    k grows √2 over int8 at the same budget): byte j of a row holds
    cells (2j, 2j+1), so dot(A, x) = dot(A_even, x[0::2]) +
    dot(A_odd, x[1::2]) with the two nibble planes unpacked inline
    (fused into the dot reads; the MXU pays ~1.23× per cell vs s8 but
    the HBM residency — the binding constraint — halves; E8 study)."""
    if core.dtype == jnp.uint8:
        if xq.dtype == jnp.int8:
            cdt, pet = jnp.int8, jnp.int32
        elif jnp.issubdtype(xq.dtype, jnp.integer):
            return _wide_int_core_dot(core, xq.astype(jnp.int32))
        else:
            cdt, pet = jnp.bfloat16, acc
            xq = xq.astype(jnp.bfloat16)
        lo, hi = _nibble_halves(core, cdt)
        return jnp.dot(
            lo, xq[0::2], preferred_element_type=pet
        ) + jnp.dot(hi, xq[1::2], preferred_element_type=pet)
    if core.dtype == jnp.int8:
        if xq.dtype == jnp.int8:
            return jnp.dot(core, xq, preferred_element_type=jnp.int32)
        if jnp.issubdtype(xq.dtype, jnp.integer):
            return _wide_int_core_dot(core, xq.astype(jnp.int32))
        if os.environ.get("PYGIM_CORE_PALLAS") and core.shape[0] % 256 == 0:
            # explicit VMEM-fused widen (ops/pallas_core.py). A/B
            # MEASURED round 3: 114.1 ms vs 108.0 ms for the XLA branch
            # below — XLA fuses the astype into the dot reads, so the
            # gate stays off by default (docs/PERF.md).
            from pygim_tpu.ops.pallas_core import dequant_core_dot

            return dequant_core_dot(core, xq).astype(acc)
        return jnp.dot(
            core.astype(jnp.bfloat16), xq.astype(jnp.bfloat16),
            preferred_element_type=acc,
        )
    if (
        core.dtype == jnp.bfloat16
        and jnp.issubdtype(xq.dtype, jnp.integer)
        and xq.dtype != jnp.int8
    ):
        # Wide integer payload (int16/int32 quantization, |q| up to 2^19)
        # on a bf16 core: bf16 integers are exact only to 2^8, so casting
        # xq to the core dtype would degrade the dominant tier to ~2^-9
        # relative precision while the tail stays exact-integer. Promote
        # BOTH operands to f32 instead — core cells (≤127) and |q| ≤ 2^19
        # are both f32-exact (f32 holds integers to 2^24).
        return jnp.dot(
            core.astype(jnp.float32), xq.astype(jnp.float32),
            preferred_element_type=acc,
        )
    return jnp.dot(core, xq.astype(core.dtype), preferred_element_type=acc)


def bcsr_panel_scan_spmm(x, panel_nodes, tiles, panel_idx, tile_rb,
                         row_nodes, out, step: int, q_scale=None,
                         compute_dtype=None):
    """PANEL-MAJOR BCSR compute body (core/bcsr.py:build_bcsr_panels).

    Iterates column blocks: each step gathers ``step`` (128, H) panels
    ONCE and multiplies every tile of those panels against them — the
    panel read is amortized over all its tiles, so the per-tile
    qualification bar drops to tile-read + partial-merge cost
    (panel_tile_cutoffs). Partials scatter-add DIRECTLY into the caller's
    (nrows, H) output carry via ``row_nodes`` (rank row → original node):
    no intermediate (n_rb·Tr, H) buffer exists — at products scale that
    buffer plus its copy into out cost ~5 GB of HBM."""
    h = x.shape[1]
    n_vp, t_fix, tr, tc = tiles.shape
    x_panels = jnp.take(x, panel_nodes, axis=0)
    if q_scale is not None:  # fused symmetric quantization (exact /)
        x_panels = jnp.round(x_panels / q_scale)
    x_panels = x_panels.reshape(-1, tc, h)
    n_steps = n_vp // step
    tiles_s = tiles.reshape(n_steps, step, t_fix, tr, tc)
    pidx_s = panel_idx.reshape(n_steps, step)
    rank_rows = (
        tile_rb.astype(jnp.int32)[:, :, None] * tr
        + jnp.arange(tr, dtype=jnp.int32)[None, None, :]
    ).reshape(n_steps, step * t_fix * tr)
    rows_s = jnp.take(row_nodes.astype(jnp.int32), rank_rows)
    # compute_dtype=f32 for wide integer quantization payloads (|q| up
    # to 2^19 — bf16's exact-integer range is only 2^8; the bf16→f32
    # tile upcast itself is lossless)
    cdt = compute_dtype or tiles.dtype
    per_rows = step * t_fix * tr
    # memory-bounded groups (see _ell_grouped_scan): inner scans stack
    # bounded tile partials, one scatter-add per group — no (nrows, H)
    # scan carry (measured to re-materialize per step)
    inner = _group_inner(n_steps, per_rows * h * 4)

    def body(_, blk):
        t, pi = blk
        p = jnp.take(x_panels, pi, axis=0)  # (step, tc, h) — one read
        o = jnp.einsum(
            "ptrk,pkh->ptrh", t.astype(cdt), p.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        return None, o.reshape(per_rows, h)

    for lo in range(0, n_steps, inner):
        hi = min(lo + inner, n_steps)
        _, parts = jax.lax.scan(
            body, None, (tiles_s[lo:hi], pidx_s[lo:hi])
        )
        out = out.at[rows_s[lo:hi].reshape(-1)].add(
            parts.reshape((hi - lo) * per_rows, h).astype(out.dtype)
        )
    return out


def bcsr_scan_spmm(x, panel_nodes, tiles, panel_idx, vblock_to_rb,
                   row_nodes, out, step: int, q_scale=None,
                   compute_dtype=None):
    """Row-block-major BCSR compute body (core/bcsr.py tables).

    One panel-table gather amortizes each gather issue over a contiguous
    (128, H) block of rank-permuted x; the per-step compute is one MXU
    matmul (Tr, S·128) @ (S·128, H) per virtual row block; partials
    scatter-add DIRECTLY into the caller's (nrows, H) output carry via
    ``row_nodes`` — no intermediate (n_rb·Tr, H) buffer (the stacked /
    double-buffered forms cost 3+ GB each at products scale)."""
    h = x.shape[1]
    n_vb, s, tr, tc = tiles.shape
    x_panels = jnp.take(x, panel_nodes, axis=0)
    if q_scale is not None:  # fused symmetric quantization (exact /)
        x_panels = jnp.round(x_panels / q_scale)
    x_panels = x_panels.reshape(-1, tc, h)
    n_steps = n_vb // step
    tiles_s = tiles.reshape(n_steps, step, s, tr, tc)
    pidx_s = panel_idx.reshape(n_steps, step, s)
    rank_rows = (
        vblock_to_rb.astype(jnp.int32)[:, None] * tr
        + jnp.arange(tr, dtype=jnp.int32)[None, :]
    ).reshape(n_steps, step * tr)
    rows_s = jnp.take(row_nodes.astype(jnp.int32), rank_rows)
    # compute_dtype=f32 for wide integer quantization payloads (see
    # bcsr_panel_scan_spmm)
    cdt = compute_dtype or tiles.dtype
    per_rows = step * tr
    # memory-bounded groups (see _ell_grouped_scan): inner scans stack
    # bounded tile partials, one scatter-add per group — no (nrows, H)
    # scan carry (measured to re-materialize per step)
    inner = _group_inner(n_steps, per_rows * h * 4)

    def body(_, blk):
        t, pi = blk
        # (step, s, tc, h) panel gather — 128-row blocks, bandwidth-bound
        p = jnp.take(x_panels, pi.reshape(-1), axis=0).reshape(
            step, s * tc, h
        )
        tt = t.transpose(0, 2, 1, 3).reshape(step, tr, s * tc)
        o = jnp.einsum(
            "brk,bkh->brh", tt.astype(cdt), p.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        return None, o.reshape(per_rows, h)

    for lo in range(0, n_steps, inner):
        hi = min(lo + inner, n_steps)
        _, parts = jax.lax.scan(
            body, None, (tiles_s[lo:hi], pidx_s[lo:hi])
        )
        out = out.at[rows_s[lo:hi].reshape(-1)].add(
            parts.reshape((hi - lo) * per_rows, h).astype(out.dtype)
        )
    return out


class PreparedSpmm:
    """Device-resident prepared sparse operand with a cached-jit ``mul``.

    Analog of the opaque group pointer returned by
    ``spmm_csr_to_device_group`` (pytorch_api.cpp:204-243) plus the
    ``spmm_csr_run_group`` run path — but the "device copy" is just arrays
    living in HBM and the "run" is a jitted function.
    """

    def __init__(self, graph, config: SpmmConfig):
        self.config = config
        if config.merge_duplicates and config.backend != "oracle":
            # oracle stays raw: an independent reference must not share
            # the prepared path's transformations
            from pygim_tpu.core.graph import merge_duplicate_edges

            graph, _ = merge_duplicate_edges(graph)
        coo = graph if isinstance(graph, CooGraph) else None
        csr = graph if isinstance(graph, CsrGraph) else None
        if config.format == "csr":
            csr = csr if csr is not None else coo.to_csr()
            self.nrows, self.ncols = csr.nrows, csr.ncols
            self.nnz = csr.nnz
            self.val_dtype = jnp.dtype(csr.vals.dtype)
        else:
            coo = coo if coo is not None else csr.to_coo()
            self.nrows, self.ncols = coo.nrows, coo.ncols
            self.nnz = coo.nnz
            self.val_dtype = jnp.dtype(coo.vals.dtype)

        backend = config.backend
        if backend == "oracle":
            src = coo if coo is not None else csr.to_coo()
            s = src.sort_by_row()
            self._dev = {
                "rows": jnp.asarray(s.rows),
                "cols": jnp.asarray(s.cols),
                "vals": jnp.asarray(s.vals),
            }
        elif backend == "blocked":
            csr = csr if csr is not None else coo.to_csr()
            nb = config.resolve_n_blocks(csr.nnz)
            plan = make_row_block_plan(
                csr, nb, balance=config.balance,
                row_align=8, nnz_align=8,
            )
            ell = build_ell_blocks(csr, plan)
            row_slot = row_slot_table(plan)
            self.plan = plan
            self._dev = {
                "colind": jnp.asarray(ell.colind),
                "vals": jnp.asarray(ell.vals),
                "rowloc": jnp.asarray(ell.rowloc),
                "row_slot": jnp.asarray(row_slot),
            }
            self.rows_pad = plan.rows_pad
            self.nnz_pad = plan.nnz_pad
        elif backend == "ell":
            csr = csr if csr is not None else coo.to_csr()
            self._dev = {}
            self.ell_meta = _install_ell_tables(
                self._dev, _plan_ell_tables(csr, config)
            )
            self.row_chunk, self.ell_degree = self.ell_meta[0]
        elif backend == "hybrid":
            # Dense hub-core on the MXU + ELL tail via the gather engine —
            # the TPU-first answer to power-law graphs: the reference's
            # "hub row" problem (nnz balancing + lock schemes) becomes an
            # opportunity: after degree-ranking, the top-K×top-K block of
            # a scale-free graph is dense enough that one dense matmul
            # (~free on the MXU, streamed at full HBM bandwidth) replaces
            # the majority of per-edge gathers, which are issue-rate-bound
            # at ~7 ns each (CLAUDE.md measurements).
            coo = coo if coo is not None else csr.to_coo()
            if coo.nrows != coo.ncols:
                raise ValueError("hybrid backend requires square adjacency")
            if not np.issubdtype(coo.vals.dtype, np.floating):
                # integer aggregation rides a bf16 or int8 core: int8
                # payloads (|v| ≤ 2^4 after symmetric quantization,
                # quantize.py:22) and small multi-edge counts are exact in
                # both; the tail stays exact-integer through the ell path.
                # An int8 core halves bytes/cell (k grows √2 at the same
                # HBM budget) and rides the MXU's double-rate s8 path;
                # an int4 core halves again (nibble-packed uint8 storage,
                # unpacked inline into the dot — measured temp-free
                # fusion, E8 in docs/PERF.md). Cells outside the target
                # integer range are demoted to the exact ELL tail at
                # prepare.
                if config.hybrid_dtype not in (
                    None, "bfloat16", "int8", "int4"
                ):
                    raise ValueError(
                        "integer hybrid aggregation requires a bfloat16, "
                        "int8 or int4 core"
                    )
                if config.hybrid_dtype is None:
                    config = dataclasses.replace(
                        config, hybrid_dtype="bfloat16"
                    )
                self.config = config
                coo = dataclasses.replace(
                    coo, vals=coo.vals.astype(np.float32)
                )
            self._prepare_hybrid(coo, config)
        elif backend == "coo":
            coo = coo if coo is not None else csr.to_coo()
            nb = config.resolve_n_blocks(coo.nnz)
            ch = build_coo_chunks(coo, nb)
            self._dev = {
                "rows": jnp.asarray(ch.rows),
                "cols": jnp.asarray(ch.cols),
                "vals": jnp.asarray(ch.vals),
            }
        else:
            raise ValueError(f"unknown backend {backend!r}")
        self.raw_run = _make_run(backend, self)
        self._run = jax.jit(self.raw_run)

    def _prepare_hybrid(self, coo, config: SpmmConfig):
        import hashlib
        import os
        from pathlib import Path

        # prepare-result cache: building the dense core of a 100M-edge
        # graph costs minutes; repeated benchmark runs reload it from disk
        # (prepare-once taken literally).
        cache_dir = Path(
            os.environ.get(
                "PYGIM_TPU_DATA",
                os.path.join(os.path.expanduser("~"), ".cache", "pygim_tpu"),
            )
        )
        h = hashlib.sha256()
        h.update(np.asarray([coo.nrows, coo.nnz]).tobytes())
        stride = max(1, coo.nnz // 64)
        # structure AND values: two graphs with identical sparsity but
        # different edge weights (raw vs gcn_norm'd) must not collide.
        h.update(coo.rows[::stride].tobytes())
        h.update(coo.cols[::stride].tobytes())
        h.update(np.ascontiguousarray(coo.vals[::stride]).tobytes())
        h.update(str(coo.vals.dtype).encode())
        # layout/algorithm version: bump when the prepare-time layout or
        # the auto-degree model changes, so stale cached tables rebuild
        h.update(b"prep-v4-")
        h.update(
            f"{config.hybrid_k}-{config.hybrid_core_bytes}-"
            f"{config.hybrid_dtype}-{config.ell_degree}-"
            f"{config.ell_tables}-"
            f"{config.block_nnz_budget}-{config.bcsr_bytes}-"
            f"{config.bcsr_tile}-{config.bcsr_min_edges}-"
            f"{config.bcsr_order}-{config.bcsr_layout}-"
            f"{config.hidden_hint}".encode()
        )
        if config.hybrid_shape != "square":
            # appended ONLY for non-square shapes so every pre-existing
            # square cache key stays valid (13 GiB rebuilds are minutes)
            h.update(
                f"{config.hybrid_shape}-{config.stair_max_bands}".encode()
            )
        cache_path = cache_dir / f"hybrid-{h.hexdigest()[:16]}.npz"
        host = None
        if cache_path.exists():
            try:
                z = np.load(cache_path)
                host = {k2: z[k2] for k2 in z.files}
            except Exception:
                host = None
        if host is None:
            host = self._prepare_hybrid_build(coo, config)
            try:
                cache_dir.mkdir(parents=True, exist_ok=True)
                tmp = cache_path.with_suffix(".tmp.npz")
                np.savez(tmp, **host)
                os.replace(tmp, cache_path)
            except Exception:
                pass
        self.hybrid_k_eff = int(host["k"])
        self._dev = {}
        self.ell_meta = []
        for i in range(int(host.get("n_ell", 1))):
            sfx = _ell_suffix(i)
            chunk = int(host[f"chunk{sfx}"])
            c3, v3, r3 = ell_step_tables(
                host[f"cols2d{sfx}"], host[f"vals2d{sfx}"],
                host[f"vrow_to_row{sfx}"], chunk,
            )
            self._dev[f"cols2d{sfx}"] = jnp.asarray(c3)
            self._dev[f"vals2d{sfx}"] = jnp.asarray(v3)
            self._dev[f"vrow_to_row{sfx}"] = jnp.asarray(r3)
            self.ell_meta.append((chunk, int(host[f"degree{sfx}"])))
        self.row_chunk, self.ell_degree = self.ell_meta[0]
        self.interleave = None
        self.stair = None
        if "stair_bands" in host:
            # staircase core: per-band dense blocks (see
            # _prepare_stair_build); hybrid_k_eff counts covered ROWS
            self.stair = [
                tuple(int(v) for v in b) for b in host["stair_bands"]
            ]
            for b in range(len(self.stair)):
                arr = host[f"stair{b}"]
                if str(host["core_dtype"]) == "bfloat16":
                    import ml_dtypes

                    arr = arr.view(ml_dtypes.bfloat16)
                self._dev[f"stair{b}"] = jnp.asarray(arr)
            self._dev["core_nodes"] = jnp.asarray(host["core_nodes"])
        elif self.hybrid_k_eff > 0:
            core = host["core"]
            if str(host["core_dtype"]) == "bfloat16":
                import ml_dtypes

                core = core.view(ml_dtypes.bfloat16)
            self._install_core(core)
            self._dev["core_nodes"] = jnp.asarray(host["core_nodes"])
        self._install_hybrid_bcsr(host)

    def _install_core(self, core):
        """Upload the dense hub core, planning the core↔tail interleave
        (PYGIM_HYBRID_INTERLEAVE=1) when enabled: split the core into one
        row slab per ELL-tail scan step so the MXU-bound core product
        rides the tail's ``lax.scan`` — measured 1.29× gather/MXU
        concurrency on v5e when the slab streams as scan **xs**
        (tools/overlap_probe.py D; separate top-level ops only 1.10×).

        Storage layout is the whole trick. Two formulations failed on
        chip (round 4): static per-table slices of a device-resident 2-D
        core materialized multi-GiB HLO temps and OOM'd; a per-step
        ``dynamic_slice`` from the closed-over 2-D core ran but measured
        ZERO overlap (102.7 ms vs 102.4 plain on the int8-12GiB reddit
        prep — the slab read does not get the scan-operand prefetch /
        double-buffering treatment). So when the plan engages, the core
        is stored per table as a 3-D ``core3d{sfx}`` array of shape
        (n_steps, slab, cols) — a zero-copy host reshape — and the run
        path feeds it straight to ``lax.scan`` as xs, the exact
        formulation the probe measured overlapping. Without a plan the
        core stays 2-D at ``dev["core"]``.

        ``sum(slab_i · n_steps_i) >= k``; the few overshoot rows
        (< n_steps rows, ~MBs) are zero-padded on the HOST before upload
        (padding on device would transiently double the multi-GiB core's
        HBM footprint) and their zero products are trimmed after concat.
        Records ``self.interleave = (slabs, steps, k)``. The tail tables
        are coarse-stepped by construction (~26 steps on reddit-sim at
        the shipped config) so slabs land at MXU-friendly thousands of
        rows; cores smaller than 8 rows/step skip the plan."""
        if os.environ.get("PYGIM_HYBRID_INTERLEAVE", "0") != "1":
            self._dev["core"] = jnp.asarray(core)
            return
        steps = [
            int(self._dev[f"cols2d{_ell_suffix(i)}"].shape[0])
            for i in range(len(self.ell_meta))
        ]
        total = sum(steps)
        k = int(core.shape[0])
        slab = k // max(1, total)
        if total == 0 or slab < 8:
            self._dev["core"] = jnp.asarray(core)
            return
        slabs = [slab] * len(steps)
        deficit = k - slab * total
        if deficit:
            j = int(np.argmax(steps))
            slabs[j] += -(-deficit // steps[j])
        k_pad = sum(s * n for s, n in zip(slabs, steps))
        if k_pad > k:
            core = np.concatenate(
                [core, np.zeros((k_pad - k,) + core.shape[1:], core.dtype)]
            )
        off = 0
        for i, (s, n) in enumerate(zip(slabs, steps)):
            share = s * n
            self._dev[f"core3d{_ell_suffix(i)}"] = jnp.asarray(
                np.ascontiguousarray(core[off : off + share]).reshape(
                    n, s, core.shape[1]
                )
            )
            off += share
        self.interleave = (slabs, steps, k)

    def _core_scatter(self, dev, out, xc, acc):
        """Add the dense-core product into ``out`` (node-id space),
        dispatching on the storage layout. ``xc`` is the rank-gathered
        payload ``take(x, core_nodes)``.

        For the staircase layout each band scatter-adds its own
        ``(rows_b, H)`` product — deliberately NO ``jnp.concatenate`` of
        band products: the concat formulation MEASURED 261.7 ms on v5e
        where per-band scatter-adds run 50.4 ms and tuple outputs
        38.6 ms for the identical dots (round-5 isolation jobs; the
        concat drags the whole 8-dot program into a pathological fusion
        — sum of standalone dots is 64.2 ms)."""
        if getattr(self, "stair", None) is not None:
            cn = dev["core_nodes"]
            for b, (lo, hi, w) in enumerate(self.stair):
                p = _core_matmul(dev[f"stair{b}"], xc[:w], acc)
                out = out.at[cn[lo:hi]].add(p.astype(out.dtype))
            return out
        core_out = self._core_product(dev, xc, acc)
        cn = dev["core_nodes"]
        return out.at[cn[: self.hybrid_k_eff]].add(
            core_out.astype(out.dtype)
        )

    def _core_product(self, dev, xc, acc):
        """Dense-core product independent of the storage layout (2-D
        ``dev["core"]``; interleaved per-table ``core3d`` slabs —
        reshaped back to 2-D per table, free on a jit input; or
        staircase bands, each dotted against its width's prefix of the
        rank-gathered ``xc``), trimmed to the un-padded
        ``hybrid_k_eff`` rows. Callers scatter the result with
        ``core_nodes[:hybrid_k_eff]`` — but prefer :meth:`_core_scatter`
        on the hot paths: the stair branch here pays a measured-
        pathological concat and exists only for phase diagnostics."""
        if getattr(self, "stair", None) is not None:
            outs = [
                _core_matmul(dev[f"stair{b}"], xc[:w], acc)
                for b, (_lo, _hi, w) in enumerate(self.stair)
            ]
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        if self.interleave is None:
            return _core_matmul(dev["core"], xc, acc)
        outs = []
        for i in range(len(self.ell_meta)):
            key = f"core3d{_ell_suffix(i)}"
            if key in dev:
                c3 = dev[key]
                outs.append(
                    _core_matmul(c3.reshape(-1, c3.shape[2]), xc, acc)
                )
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        return out[: self.interleave[2]]

    def _install_hybrid_bcsr(self, host):
        self.has_bcsr = "bcsr_tiles" in host
        if self.has_bcsr:
            tiles = host["bcsr_tiles"]
            if str(host["bcsr_dtype"]) == "bfloat16":
                import ml_dtypes

                tiles = tiles.view(ml_dtypes.bfloat16)
            self.bcsr_kind = str(host.get("bcsr_kind", "row"))
            self.bcsr_step = int(host["bcsr_step"])
            self.bcsr_n_rb = int(host["bcsr_n_rb"])
            self.bcsr_edges = int(host["bcsr_edges"])
            self._dev.update(
                tiles=jnp.asarray(tiles),
                panel_idx=jnp.asarray(host["bcsr_panel_idx"]),
                panel_nodes=jnp.asarray(host["bcsr_panel_nodes"]),
                row_nodes=jnp.asarray(host["bcsr_row_nodes"]),
            )
            if self.bcsr_kind == "panel":
                self._dev["tile_rb"] = jnp.asarray(host["bcsr_tile_rb"])
            else:
                self._dev["vblock_to_rb"] = jnp.asarray(
                    host["bcsr_vblock_to_rb"]
                )

    def _prepare_hybrid_build(self, coo, config: SpmmConfig):
        from pygim_tpu.utils.timers import PhaseTimer

        pt = self.prepare_timer = PhaseTimer()

        n = coo.nrows
        pt.start("rank")
        deg = np.bincount(coo.rows, minlength=n).astype(np.int64)
        deg += np.bincount(coo.cols, minlength=n)
        order = np.argsort(-deg).astype(np.int32)
        rank = np.empty(n, dtype=np.int32)
        rank[order] = np.arange(n, dtype=np.int32)
        pt.stop("rank")

        core_dtype = config.hybrid_dtype or str(coo.vals.dtype)
        if core_dtype == "bfloat16":
            itemsize = 2.0
        elif core_dtype == "int4":
            itemsize = 0.5  # nibble-packed: two cells per stored byte
        else:
            itemsize = float(np.dtype(core_dtype).itemsize)
        if config.hybrid_shape == "stair" and config.hybrid_k is None \
                and config.hybrid_core_bytes > 0:
            return self._prepare_stair_build(
                coo, config, rank, order, core_dtype, itemsize, pt
            )
        if config.hybrid_k is not None:
            k = max(0, min(config.hybrid_k, n))
        elif config.hybrid_core_bytes <= 0:
            k = 0
        else:
            k = int(np.sqrt(config.hybrid_core_bytes / itemsize))
            k = (k // 256) * 256
            k = min(max(k, min(256, n)), n)
        if core_dtype == "int4":
            k -= k % 2  # nibble packing pairs columns per byte
        self.hybrid_k_eff = k

        from pygim_tpu.core import native

        def _demote_edges(bad_flat, in_core):
            """Move the edges of non-representable cells to the ELL tail:
            an edge is demoted when its (rank-row, rank-col) cell is in
            ``bad_flat`` (global row-major flat indices)."""
            idx = np.flatnonzero(in_core)
            flat = (
                rank[coo.rows[idx]].astype(np.int64) * k
                + rank[coo.cols[idx]]
            )
            demote = np.isin(flat, bad_flat)
            in_core = in_core.copy()
            in_core[idx[demote]] = False
            import logging

            logging.getLogger("pygim_tpu").info(
                "%s core: %d cells (%d edges) not representable"
                " — demoted to the ELL tail",
                core_dtype, bad_flat.size, int(demote.sum()),
            )
            return in_core

        dense = None
        banded = None
        pt.start("core_fill")
        if k == 0:
            in_core = np.zeros(coo.nnz, dtype=bool)
        else:
            # banded native build: final-dtype core directly, no (k,k)
            # f32 intermediate (measured 870 s of page faults + NumPy
            # temp churn at k=113k — docs/PERF.md prepare notes)
            banded = native.core_build_banded(
                coo.rows, coo.cols, coo.vals.astype(np.float32), rank, k,
                core_dtype,
            )
            if banded is not None:
                dense, tail_mask, bad_flat = banded
                in_core = ~tail_mask
                if bad_flat.size:
                    in_core = _demote_edges(bad_flat, in_core)
            else:
                filled = native.core_fill_native(
                    coo.rows, coo.cols, coo.vals.astype(np.float32), rank, k
                )
                if filled is not None:
                    dense, tail_mask = filled
                    in_core = ~tail_mask
                else:
                    rr = rank[coo.rows]
                    cc = rank[coo.cols]
                    in_core = (rr < k) & (cc < k)
                    flat = rr[in_core].astype(np.int64) * k + cc[in_core]
                    dense = np.bincount(
                        flat, weights=coo.vals[in_core].astype(np.float64),
                        minlength=k * k,
                    ).reshape(k, k).astype(np.float32)
        pt.stop("core_fill")
        if k > 0 and banded is None:
            pt.start("core_convert")
            if core_dtype == "bfloat16":
                dense = native.f32_to_bf16_bits(dense).reshape(k, k)
            elif core_dtype in ("int8", "int4"):
                # exact-integer core: a cell (sum of merged duplicate
                # edge values) rides the core only if it is an
                # integer representable in the core dtype (|c| ≤ 127
                # for int8, ≤ 7 for int4); the rare offenders (e.g.
                # >127 parallel edges between two hubs in an R-MAT sim)
                # are zeroed in the core and DEMOTED to the exact ELL
                # tail — correctness never depends on the core dtype.
                # Row-chunked conversion: the f32 core is tens of GB at
                # production k, so whole-array temps would double host RAM.
                hi_lim, lo_lim = (127, -128) if core_dtype == "int8" \
                    else (7, -8)
                out8 = np.empty((k, k), dtype=np.int8)
                bad_r, bad_c = [], []
                for lo in range(0, k, 4096):
                    blk = dense[lo : lo + 4096]
                    rb = np.round(blk)
                    bad = (rb > hi_lim) | (rb < lo_lim) | (rb != blk)
                    if bad.any():
                        br, bc = np.nonzero(bad)
                        bad_r.append(br.astype(np.int64) + lo)
                        bad_c.append(bc.astype(np.int64))
                        rb = np.where(bad, 0.0, rb)
                    out8[lo : lo + 4096] = rb
                dense = out8
                if bad_r:
                    bad_flat = np.concatenate(bad_r) * k + np.concatenate(
                        bad_c
                    )
                    in_core = _demote_edges(bad_flat, in_core)
                if core_dtype == "int4":
                    # nibble-pack: byte j holds cells (2j, 2j+1) of the
                    # row — low nibble = even column, high = odd. Packed
                    # row-chunked for the same host-RAM reason as above.
                    packed = np.empty((k, k // 2), dtype=np.uint8)
                    for lo in range(0, k, 4096):
                        blk = dense[lo : lo + 4096]
                        lo4 = blk[:, 0::2].astype(np.uint8) & 0xF
                        hi4 = blk[:, 1::2].astype(np.uint8) & 0xF
                        packed[lo : lo + 4096] = lo4 | (hi4 << 4)
                    dense = packed
            pt.stop("core_convert")

        host: dict = {"k": np.int64(k), "core_dtype": np.str_(core_dtype)}
        if k > 0:
            core_store = dense
            if core_dtype == "bfloat16":
                core_store = dense.view(np.uint16)
            host["core"] = core_store
            host["core_nodes"] = order[:k]  # rank i ↔ node order[i]

        # middle tier: dense (Tr, 128) tiles in rank space (core/bcsr.py)
        tail_sel = ~in_core
        pt.start("bcsr")
        if config.bcsr_bytes > 0:
            from pygim_tpu.core.bcsr import build_bcsr_tiles

            t_idx = np.flatnonzero(tail_sel)
            # tile ordering: degree rank by default; "rcm" (reverse
            # Cuthill-McKee — bandwidth-shaped) or "lp" (label
            # propagation — community-shaped) re-order the non-core band
            # by the tail subgraph's structure. Measured: rcm 13.1% vs
            # rank 8.9% tile capture on products-sim (Tr=16); lp recovers
            # latent block communities rcm's BFS layering splits
            # (docs/PERF.md)
            t_order, t_rank = order, rank
            if config.bcsr_order in ("rcm", "lp") and k < n:
                from pygim_tpu.core.bcsr import tail_tile_order

                t_order, t_rank = tail_tile_order(
                    coo.rows[t_idx], coo.cols[t_idx], order, rank, k, n,
                    config.bcsr_order,
                )
            bkw = dict(
                n=n, tile_rows=config.bcsr_tile,
                budget_bytes=config.bcsr_bytes,
                hidden=config.hidden_hint,
                # tile STORAGE stays bf16 alongside an int8 core (cell
                # values — merged small-int edge weights — are bf16-
                # exact; int8 tiles would truncate the raw-float mul
                # path). Wide quantized payloads are handled at COMPUTE
                # time: the fused path upcasts tiles+panels to f32
                # (raw_mul_quantized's compute_dtype).
                dtype="bfloat16"
                if core_dtype in ("bfloat16", "int8")
                else "float32",
                min_edges=config.bcsr_min_edges,
            )
            brr = t_rank[coo.rows[t_idx]]
            bcc = t_rank[coo.cols[t_idx]]
            if config.bcsr_layout == "panel":
                from pygim_tpu.core.bcsr import build_bcsr_panels

                bc, in_tile = build_bcsr_panels(
                    brr, bcc, coo.vals[t_idx], t_order, **bkw
                )
            else:
                bc, in_tile = build_bcsr_tiles(
                    brr, bcc, coo.vals[t_idx], t_order, **bkw
                )
            if bc is not None and config.bcsr_layout == "panel":
                tail_sel = tail_sel.copy()
                tail_sel[t_idx[in_tile]] = False
                t_fix, tr = bc.tiles_per_vp, bc.tile_rows
                # step: ~8 MB of panel gather per scan step
                step = max(1, (8 << 20) // max(
                    1, 128 * config.hidden_hint * 4
                ))
                n_vp = bc.tiles.shape[0]
                step = min(step, max(1, n_vp))
                n_vp_pad = round_up(n_vp, step)
                tiles = np.zeros(
                    (n_vp_pad,) + bc.tiles.shape[1:], dtype=bc.tiles.dtype
                )
                tiles[:n_vp] = bc.tiles
                panel_idx = np.zeros(n_vp_pad, dtype=np.int32)
                panel_idx[:n_vp] = bc.panel_idx
                tile_rb = np.zeros((n_vp_pad, t_fix), dtype=np.int32)
                tile_rb[:n_vp] = bc.tile_rb
                bdt = str(bc.tiles.dtype)
                host.update(
                    bcsr_kind=np.str_("panel"),
                    bcsr_tiles=tiles.view(np.uint16)
                    if bdt == "bfloat16" else tiles,
                    bcsr_dtype=np.str_(bdt),
                    bcsr_panel_idx=panel_idx,
                    bcsr_tile_rb=tile_rb,
                    bcsr_panel_nodes=bc.panel_nodes,
                    bcsr_row_nodes=bc.row_nodes,
                    bcsr_step=np.int64(step),
                    bcsr_n_rb=np.int64(bc.n_rb),
                    bcsr_edges=np.int64(bc.n_edges),
                )
            elif bc is not None:
                tail_sel = tail_sel.copy()
                tail_sel[t_idx[in_tile]] = False
                s, tr = bc.tiles_per_vblock, bc.tile_rows
                # pad vblocks to a scan-step multiple (~8 MB panel gather
                # per step); pad vblocks point at panel 0 with zero tiles
                # and target the last row block (sorted contract)
                step = max(1, (8 << 20) // max(
                    1, s * 128 * config.hidden_hint * 4
                ))
                n_vb = bc.tiles.shape[0]
                step = min(step, max(1, n_vb))
                n_vb_pad = round_up(n_vb, step)
                n_rb = bc.row_nodes.shape[0] // tr
                tiles = np.zeros(
                    (n_vb_pad,) + bc.tiles.shape[1:], dtype=bc.tiles.dtype
                )
                tiles[:n_vb] = bc.tiles
                panel_idx = np.zeros((n_vb_pad, s), dtype=np.int32)
                panel_idx[:n_vb] = bc.panel_idx
                vb_to_rb = np.full(n_vb_pad, n_rb - 1, dtype=np.int32)
                vb_to_rb[:n_vb] = bc.vblock_to_rb
                bdt = str(bc.tiles.dtype)
                host.update(
                    bcsr_kind=np.str_("row"),
                    bcsr_tiles=tiles.view(np.uint16)
                    if bdt == "bfloat16" else tiles,
                    bcsr_dtype=np.str_(bdt),
                    bcsr_panel_idx=panel_idx,
                    bcsr_vblock_to_rb=vb_to_rb,
                    bcsr_panel_nodes=bc.panel_nodes,
                    bcsr_row_nodes=bc.row_nodes,
                    bcsr_step=np.int64(step),
                    bcsr_n_rb=np.int64(n_rb),
                    bcsr_edges=np.int64(bc.n_edges),
                )

        pt.stop("bcsr")
        self._finish_hybrid_tail(host, coo, config, tail_sel, pt)
        return host

    def _finish_hybrid_tail(self, host, coo, config, tail_sel, pt):
        """Build the ELL tail tables for the non-core edges (shared by
        the square and staircase core builds)."""
        n = coo.nrows
        pt.start("ell_tail")
        # tail stays in ORIGINAL node ids — no full-graph permutation at
        # run time; only the core/tile tiers touch the ranking (bounded
        # gathers of x rows and scatter-adds of their products).
        tail = CooGraph(
            rows=coo.rows[tail_sel], cols=coo.cols[tail_sel],
            vals=coo.vals[tail_sel], nrows=n, ncols=n,
        )
        tail_csr = tail.to_csr()
        tables = _plan_ell_tables(tail_csr, config)
        host["n_ell"] = np.int64(len(tables))
        for i, (chunk, t) in enumerate(tables):
            sfx = _ell_suffix(i)
            host[f"degree{sfx}"] = np.int64(t.degree)
            host[f"chunk{sfx}"] = np.int64(chunk)
            host[f"cols2d{sfx}"] = t.cols
            host[f"vals2d{sfx}"] = t.vals
            host[f"vrow_to_row{sfx}"] = t.vrow_to_row
        pt.stop("ell_tail")

    def _prepare_stair_build(
        self, coo, config: SpmmConfig, rank, order, core_dtype, itemsize,
        pt,
    ):
        """Staircase-core prepare (hybrid_shape='stair'): ≤
        ``stair_max_bands`` dense row bands of tapering width in
        degree-rank space, planned as the byte-budget superlevel set of
        the rank×rank cell density (core/stair.py — measured on
        reddit-sim: 99.36% coverage at 12 GiB vs the square's 96.85%;
        the issue-bound tail shrinks by the coverage delta, the core
        MXU flops stay budget-bound). Cells outside a band, and cells
        not representable in an integer core dtype, demote to the exact
        ELL tail exactly as in the square build. BCSR is not composed
        with stair bands (the bands already take the coverage the tiles
        would — config.bcsr_bytes is ignored with a log note)."""
        import logging

        from pygim_tpu.core.stair import plan_staircase

        n = coo.nrows
        budget_cells = int(config.hybrid_core_bytes / itemsize)
        col_q = 512 if core_dtype == "int4" else 256
        rr = rank[coo.rows].astype(np.int64)
        cc = rank[coo.cols].astype(np.int64)
        pt.start("stair_plan")
        bands = plan_staircase(
            rr, cc, n, budget_cells,
            max_bands=config.stair_max_bands, col_quant=col_q,
        )
        pt.stop("stair_plan")
        host: dict = {"core_dtype": np.str_(core_dtype)}
        if config.bcsr_bytes > 0:
            logging.getLogger("pygim_tpu").info(
                "hybrid_shape='stair': bcsr_bytes ignored (bands subsume "
                "the tile tier's coverage)"
            )
        if not bands:
            host["k"] = np.int64(0)
            self._finish_hybrid_tail(
                host, coo, config, np.ones(coo.nnz, dtype=bool), pt
            )
            return host
        his = np.array([b[1] for b in bands], dtype=np.int64)
        ws = np.array([b[2] for b in bands], dtype=np.int64)
        bi = np.searchsorted(his, rr, side="right")
        in_core = (bi < len(bands)) & (cc < ws[np.minimum(bi, len(bands) - 1)])
        rows_total = int(his[-1])
        host["k"] = np.int64(rows_total)
        host["stair_bands"] = np.asarray(bands, dtype=np.int64)
        host["core_nodes"] = order[: max(rows_total, int(ws.max()))]

        if core_dtype == "int4":
            hi_lim, lo_lim = 7, -8
        else:
            hi_lim, lo_lim = 127, -128
        pt.start("core_fill")
        idx = np.flatnonzero(in_core)
        sidx = idx[np.argsort(rr[idx], kind="stable")]
        srr = rr[sidx]
        vals32 = coo.vals.astype(np.float64)
        demoted = []
        for b, (lo, hi, w) in enumerate(bands):
            rows_b = hi - lo
            if core_dtype == "int4":
                store = np.empty((rows_b, w // 2), dtype=np.uint8)
            elif core_dtype == "int8":
                store = np.empty((rows_b, w), dtype=np.int8)
            elif core_dtype == "bfloat16":
                store = np.empty((rows_b, w), dtype=np.uint16)
            else:
                store = np.empty((rows_b, w), dtype=np.float32)
            # ~256 MB f32 of cells per fill chunk
            chunk_rows = max(8, ((1 << 28) // max(1, w * 4)) // 8 * 8)
            for c0 in range(0, rows_b, chunk_rows):
                c1 = min(c0 + chunk_rows, rows_b)
                e0 = np.searchsorted(srr, lo + c0, side="left")
                e1 = np.searchsorted(srr, lo + c1, side="left")
                eidx = sidx[e0:e1]
                flat = (rr[eidx] - (lo + c0)) * w + cc[eidx]
                blk = np.bincount(
                    flat, weights=vals32[eidx],
                    minlength=(c1 - c0) * w,
                ).astype(np.float32).reshape(c1 - c0, w)
                if core_dtype in ("int8", "int4"):
                    rb = np.round(blk)
                    bad = (rb > hi_lim) | (rb < lo_lim) | (rb != blk)
                    if bad.any():
                        bad_flat = np.flatnonzero(bad.ravel())
                        dem = np.isin(flat, bad_flat)
                        demoted.append(eidx[dem])
                        rb = np.where(bad, 0.0, rb)
                    if core_dtype == "int8":
                        store[c0:c1] = rb.astype(np.int8)
                    else:
                        q = rb.astype(np.int8)
                        lo4 = q[:, 0::2].astype(np.uint8) & 0xF
                        hi4 = q[:, 1::2].astype(np.uint8) & 0xF
                        store[c0:c1] = lo4 | (hi4 << 4)
                elif core_dtype == "bfloat16":
                    from pygim_tpu.core import native

                    # bit view, NOT value cast: f32_to_bf16_bits returns
                    # bfloat16 VALUES; the store holds their bits
                    store[c0:c1] = np.asarray(
                        native.f32_to_bf16_bits(blk)
                    ).reshape(c1 - c0, w).view(np.uint16)
                else:
                    store[c0:c1] = blk
            host[f"stair{b}"] = store
        if demoted:
            dem = np.concatenate(demoted)
            in_core[dem] = False
            logging.getLogger("pygim_tpu").info(
                "%s stair core: %d edges not representable — demoted to "
                "the ELL tail", core_dtype, dem.size,
            )
        pt.stop("core_fill")
        self._finish_hybrid_tail(host, coo, config, ~in_core, pt)
        return host

    def mul(self, x):
        """out = A @ x. ``x``: (ncols, H) device array. Matches
        ``SparseTensorCOO.mul`` (backend_pim/spmm.py:113-122) semantics."""
        if x.shape[0] != self.ncols:
            raise ValueError(f"x rows {x.shape[0]} != A cols {self.ncols}")
        return self._run(x, **self._dev)

    @property
    def dev_arrays(self) -> dict:
        """The prepared device-resident tables. Thread these through YOUR
        jit as arguments and use :meth:`raw_mul` inside — closing a jit
        over ``.mul`` instead would bake them in as giant HLO constants
        (fatal on remote-compile backends)."""
        return self._dev

    def raw_mul(self, x, dev: dict):
        """Unjitted product for composition inside caller jits:
        ``jax.jit(lambda x, dev: model_apply(x, lambda v: prep.raw_mul(v, dev)))``."""
        return self.raw_run(x, **dev)

    @property
    def supports_fused_quant(self) -> bool:
        """True when :meth:`raw_mul_quantized` can fold symmetric int
        quantization into the aggregate body (ell / hybrid backends)."""
        return self.config.backend in ("ell", "hybrid")

    def raw_mul_quantized(self, x, dev: dict, agg_dtype: str):
        """Fused quantize → A·x → dequantize: the integer quantization
        is bit-exact vs
        ``symmetric_dequantize(raw_mul(symmetric_quantize(x)[1]), 1, s)``
        (identical round(x/scale) and integer accumulation; the float
        output matches to f32 summation-order ulp across the two XLA
        programs). For quantized dtypes NARROWER than x (int8/int16) the
        rounded values are materialized ONCE as an (N, H) integer table
        and every tier gathers from it: the tail's issue-bound gather
        then moves 256 B rows instead of 1 KB — measured 169 ms/multiply
        faster on ogbn-products (E7, docs/PERF.md) — and the arithmetic
        is unchanged (round once + gather ≡ gather + round; same f32
        accumulation order). Same-width dtypes (int32/int64) keep the
        round fused into the gather consumer: their table would be the
        same byte size as x and buy nothing. ``x`` is float; returns the
        dequantized float product."""
        from pygim_tpu.quant import _SCALE_EXP

        if not self.supports_fused_quant:
            raise ValueError(
                f"fused quantization unsupported for backend "
                f"{self.config.backend!r}"
            )
        name = jnp.dtype(agg_dtype).name
        k = _SCALE_EXP.get(name, 20)
        q_dtype = name if name in _SCALE_EXP or name == "int64" else None
        abs_max = jnp.max(jnp.abs(x))
        scale = abs_max * 2.0 / (2.0 ** k)
        safe = jnp.where(scale == 0, jnp.ones_like(scale), scale)
        qdt = q_dtype or x.dtype
        use_table = (
            q_dtype is not None
            and jnp.dtype(qdt).itemsize < jnp.dtype(x.dtype).itemsize
        )
        inter = getattr(self, "interleave", None)
        core_done = False
        if use_table:
            xq = jnp.round(x / safe).astype(qdt)
            if inter is not None and self.hybrid_k_eff > 0:
                # interleave the core into the tail scans here too —
                # same measured-concurrency basis as the float path;
                # int8 payloads ride the MXU's s8 path per slab
                acc_i = accum_dtype(
                    jnp.result_type(jnp.float32, jnp.dtype(qdt))
                )
                core_nodes = dev["core_nodes"]
                xc = jnp.take(xq, core_nodes, axis=0)
                out, core_out = _ell_tail_core_interleaved(
                    xq, dev, self.ell_meta, self.nrows, inter,
                    lambda cs: _core_matmul(cs, xc, acc_i),
                )
                out = out.at[core_nodes].add(core_out.astype(out.dtype))
                core_done = True
            else:
                out = _ell_tail_all(xq, dev, self.ell_meta, self.nrows)
        else:
            def _quant_table(x_, c, v, r, chunk, degree, nrows, out=None):
                return ell_scan_spmm_quant(
                    x_, safe, qdt, c, v, r, chunk, degree, nrows, out=out
                )

            out = _ell_tail_all(
                x, dev, self.ell_meta, self.nrows, part_of=_quant_table
            )
        if self.config.backend == "hybrid":
            acc = accum_dtype(jnp.result_type(jnp.float32, jnp.dtype(qdt)))
            if self.hybrid_k_eff > 0 and not core_done:
                core_nodes = dev["core_nodes"]
                xc = (
                    jnp.take(xq, core_nodes, axis=0)
                    if use_table
                    else jnp.round(
                        jnp.take(x, core_nodes, axis=0) / safe
                    ).astype(qdt)
                )
                # layout-independent core add (2-D core, interleaved
                # core3d slabs, or stair bands via per-band scatters)
                out = self._core_scatter(dev, out, xc, acc)
            if getattr(self, "has_bcsr", False):
                # wide integer payloads (int16/int32: |q| up to 2^19)
                # exceed bf16's exact-integer range — compute the tile
                # tier in f32 (exact: f32 carries 24 mantissa bits)
                wide = q_dtype in ("int16", "int32", "int64")
                cd = jnp.float32 if wide else None
                # with the table, panels gather pre-rounded integers
                # (cast to the compute dtype inside — exact)
                bx = xq if use_table else x
                bscale = None if use_table else safe
                if self.bcsr_kind == "panel":
                    out = bcsr_panel_scan_spmm(
                        bx, dev["panel_nodes"], dev["tiles"],
                        dev["panel_idx"], dev["tile_rb"],
                        dev["row_nodes"], out, self.bcsr_step,
                        q_scale=bscale, compute_dtype=cd,
                    )
                else:
                    out = bcsr_scan_spmm(
                        bx, dev["panel_nodes"], dev["tiles"],
                        dev["panel_idx"], dev["vblock_to_rb"],
                        dev["row_nodes"], out, self.bcsr_step,
                        q_scale=bscale, compute_dtype=cd,
                    )
        # dequantize (scale_edge = 1.0 as in the reference conv layers);
        # scale==0 ⇒ all-zero input ⇒ out·0 = the correct zeros
        return out * scale

    def mul_quantized(self, x, agg_dtype: str):
        """Jitted convenience wrapper over :meth:`raw_mul_quantized`."""
        key = ("qrun", str(agg_dtype))
        cache = self.__dict__.setdefault("_qruns", {})
        if key not in cache:
            cache[key] = jax.jit(
                lambda x, dev: self.raw_mul_quantized(x, dev, agg_dtype)
            )
        return cache[key](x, self._dev)

    def phase_times(self, x, iters: int = 3) -> dict:
        """Measured sub-phase device times in ms — the TPU analog of the
        reference's per-multiply timer slots (load_dense / kernel /
        retrieve / alignment, spmm_mul_csr.c:563-580). Each phase is its
        own jitted program over the prepared tables (one extra compile per
        phase on first call):

        * ``gather_time`` — gather-only scan over the edge column stream
          (per-chunk row gathers + a register reduce; no merge writes).
        * ``tail_time`` — the full ELL tail (gather+multiply+segment-sum).
        * ``core_time`` / ``bcsr_time`` — hybrid dense tiers.
        * ``mul_time`` — the production fused program.

        Phases are independent measurements of overlapping work, not an
        additive decomposition (XLA fuses the real program)."""
        from pygim_tpu.utils.timers import device_time

        d = self._dev
        out = {"mul_time(ms)": device_time(self.mul, x, iters=iters) * 1e3}
        b = self.config.backend

        def gather_only():
            # step-layout tables: one (chunk·D,) index row per scan step
            def fn(x, c):
                def body(acc, cc):
                    g = jnp.take(
                        x, cc, axis=0,
                        indices_are_sorted=False, unique_indices=False,
                    )
                    return acc + g.astype(jnp.float32).sum(axis=0), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((x.shape[1],), jnp.float32), c
                )
                return acc

            return jax.jit(fn)

        if b in ("ell", "hybrid"):
            meta = self.ell_meta
            n_t = len(meta)
            g = gather_only()
            out["gather_time(ms)"] = sum(
                device_time(
                    g, x, d[f"cols2d{_ell_suffix(i)}"], iters=iters
                ) * 1e3
                for i in range(n_t)
            )

            def tail_fn(x, *arrs):
                o = None
                for i, (chunk, degree) in enumerate(meta):
                    c, v, r = arrs[3 * i : 3 * i + 3]
                    o = ell_scan_spmm(
                        x, c, v, r, chunk, degree, self.nrows, out=o
                    )
                return o

            tail_args = []
            for i in range(n_t):
                sfx = _ell_suffix(i)
                tail_args += [
                    d[f"cols2d{sfx}"], d[f"vals2d{sfx}"],
                    d[f"vrow_to_row{sfx}"],
                ]
            out["tail_time(ms)"] = device_time(
                jax.jit(tail_fn), x, *tail_args, iters=iters
            ) * 1e3
        if b == "hybrid" and self.hybrid_k_eff > 0:
            # core_time = the production-form core add (scatter form —
            # a concat of stair band products measured 5x pathological,
            # _core_scatter) into a zero output, trimmed of interleave
            # pad rows, so the phase split prices what the fused
            # program actually runs
            core = jax.jit(
                lambda x, dv: self._core_scatter(
                    dv,
                    jnp.zeros((self.nrows, x.shape[1]), jnp.float32),
                    jnp.take(x, dv["core_nodes"], axis=0), jnp.float32,
                )
            )
            out["core_time(ms)"] = device_time(
                core, x, d, iters=iters
            ) * 1e3
        if b == "hybrid" and getattr(self, "has_bcsr", False):
            fn = (
                bcsr_panel_scan_spmm
                if self.bcsr_kind == "panel"
                else bcsr_scan_spmm
            )
            key = "tile_rb" if self.bcsr_kind == "panel" else "vblock_to_rb"
            bc = jax.jit(
                lambda x, pn, t, pi, vb, rn: fn(
                    x, pn, t, pi, vb, rn,
                    jnp.zeros((self.nrows, x.shape[1]), jnp.float32),
                    self.bcsr_step,
                )
            )
            out["bcsr_time(ms)"] = device_time(
                bc, x, d["panel_nodes"], d["tiles"], d["panel_idx"],
                d[key], d["row_nodes"], iters=iters,
            ) * 1e3
        if b == "blocked":
            g = gather_only()  # one step per nnz block
            out["gather_time(ms)"] = (
                device_time(g, x, d["colind"], iters=iters) * 1e3
            )
        return out


class PreparedAggregate:
    """Callable aggregate ``v -> A·v`` bound to (prep, dev tables), for
    threading through a caller's jit; exposes the fused-quantization hook
    the conv layers probe (:func:`pygim_tpu.nn.layers.quantized_aggregate`).
    Works for the single-chip AND mesh preps (the latter fall back to the
    unfused quantize path)."""

    def __init__(self, prep, dev=None):
        self.prep = prep
        self.dev = prep.dev_arrays if dev is None else dev

    def __call__(self, v):
        return self.prep.raw_mul(v, self.dev)

    def quantized(self, v, agg_dtype: str):
        """Fused quantize→aggregate→dequantize, or None when the backend
        can't fuse (caller falls back to the unfused path)."""
        if getattr(self.prep, "supports_fused_quant", False):
            return self.prep.raw_mul_quantized(v, self.dev, agg_dtype)
        return None


def _make_run(backend: str, prep: PreparedSpmm):
    nrows = prep.nrows

    if backend == "oracle":
        chunk = prep.config.oracle_edge_chunk

        def run(x, rows, cols, vals):
            if chunk:
                return spmm_coo_oracle_chunked(
                    rows, cols, vals, x, nrows, chunk
                )
            return spmm_coo_oracle(rows, cols, vals, x, nrows)
        return run

    if backend == "blocked":
        rows_pad = prep.rows_pad

        def run(x, colind, vals, rowloc, row_slot):
            return blocked_spmm(colind, vals, rowloc, row_slot, x, rows_pad)
        return run

    if backend == "ell":
        meta = list(prep.ell_meta)

        def run(x, **dev):
            return _ell_tail_all(x, dev, meta, nrows)
        return run

    if backend == "hybrid":
        meta = list(prep.ell_meta)
        has_core = prep.hybrid_k_eff > 0
        k_eff = prep.hybrid_k_eff
        has_bcsr = getattr(prep, "has_bcsr", False)
        inter = getattr(prep, "interleave", None)
        if has_bcsr:
            b_step, b_n_rb = prep.bcsr_step, prep.bcsr_n_rb
            b_panel = prep.bcsr_kind == "panel"

        def run(x, **dev):
            acc = accum_dtype(jnp.result_type(jnp.float32, x.dtype))
            if has_core and inter is not None:
                # interleaved: each ELL table's scan also chews this
                # table's share of core row slabs (measured 1.29×
                # gather/MXU concurrency — _ell_grouped_scan docstring)
                core_nodes = dev["core_nodes"]
                xc = jnp.take(x, core_nodes, axis=0)
                out, core_out = _ell_tail_core_interleaved(
                    x, dev, meta, nrows, inter,
                    lambda cs: _core_matmul(cs, xc, acc),
                )
                out = out.at[core_nodes].add(core_out.astype(out.dtype))
            else:
                out = _ell_tail_all(x, dev, meta, nrows)
            if has_core and inter is None:
                # layout-dispatching core add (square 2-D core or stair
                # bands — per-band scatter-adds, never a concat of band
                # products: measured 5x pathology, _core_scatter)
                out = prep._core_scatter(
                    dev, out,
                    jnp.take(x, dev["core_nodes"], axis=0), acc,
                )
            if has_bcsr:
                # wide integer x (int16/int32 quantized payloads) exceeds
                # bf16's exact range — compute the tile tier in f32 (the
                # fused path makes the matching choice via q_dtype)
                wide = (
                    jnp.issubdtype(x.dtype, jnp.integer)
                    and x.dtype != jnp.int8
                )
                cd = jnp.float32 if wide else None
                if b_panel:
                    out = bcsr_panel_scan_spmm(
                        x, dev["panel_nodes"], dev["tiles"],
                        dev["panel_idx"], dev["tile_rb"],
                        dev["row_nodes"], out, b_step, compute_dtype=cd,
                    )
                else:
                    out = bcsr_scan_spmm(
                        x, dev["panel_nodes"], dev["tiles"],
                        dev["panel_idx"], dev["vblock_to_rb"],
                        dev["row_nodes"], out, b_step, compute_dtype=cd,
                    )
            return out
        return run

    if backend == "coo":
        def run(x, rows, cols, vals):
            acc = accum_dtype(jnp.result_type(vals.dtype, x.dtype))

            def body(out, chunk):
                r, c, v = chunk
                g = jnp.take(x, c, axis=0).astype(acc) * v.astype(acc)[:, None]
                return out + jax.ops.segment_sum(
                    g, r, num_segments=nrows, indices_are_sorted=True
                ), None

            out0 = jnp.zeros((nrows, x.shape[1]), dtype=acc)
            out, _ = jax.lax.scan(body, out0, (rows, cols, vals))
            return out
        return run


    raise ValueError(backend)


def prepare_spmm(graph, config: Optional[SpmmConfig] = None, **kw) -> PreparedSpmm:
    """Entry point — analog of ``prepare_pim_spmm`` (backend_pim/spmm.py:143)."""
    if config is None:
        config = SpmmConfig(**kw)
    elif kw:
        config = dataclasses.replace(config, **kw)
    return PreparedSpmm(graph, config)
