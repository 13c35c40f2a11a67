"""Partition planning: nnz/row-balanced row blocks with static padded shapes.

TPU-native analog of the reference's two-level load balancing
(backend_pim/spmm_default/support/partition.c):

* DPU-level ``partition_by_row_csr`` (partition.c:14-44) and row-granular
  ``partition_by_nnz_csr`` (partition.c:51-99)  →  :func:`plan_row_blocks`
  with ``balance='row'|'nnz'``.
* Tasklet-level splits incl. mid-row nnz cuts (partition.c:231-261) →
  :meth:`RowBlockPlan.build_ell` pads every block to one static nnz budget,
  and rows that would straddle blocks are reconciled by a segmented
  reduction in the kernel, never by locks (SURVEY.md §5.2).

Where the reference realloc's each matrix to padded per-DPU strides
(spmm_mul_csr.c:152-246), we emit dense ``(n_blocks, ...)`` NumPy tables —
one static shape for the whole grid, which is what XLA/Pallas needs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from pygim_tpu.core.graph import INDEX_DTYPE, CooGraph, CsrGraph, column_split_bounds


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def plan_row_blocks(
    rowptr: np.ndarray, n_blocks: int, balance: str = "nnz"
) -> np.ndarray:
    """Return row boundaries ``bounds`` of shape (n_blocks+1,) so block *b*
    owns rows ``[bounds[b], bounds[b+1])``.

    ``balance='row'``: equal row counts (partition_by_row_csr analog).
    ``balance='nnz'``: row-granular equal-nnz scan — each boundary is placed
    where the running nnz count first reaches ``b * nnz/n_blocks``
    (partition_by_nnz_csr analog, partition.c:51-99), vectorized with
    ``searchsorted`` instead of a serial scan.
    """
    nrows = rowptr.shape[0] - 1
    if n_blocks <= 0:
        raise ValueError("n_blocks must be positive")
    if balance == "row":
        bounds = np.linspace(0, nrows, n_blocks + 1).round().astype(np.int64)
    elif balance == "nnz":
        nnz = int(rowptr[-1])
        targets = (np.arange(1, n_blocks, dtype=np.int64) * nnz) // n_blocks
        cuts = np.searchsorted(rowptr[1:], targets, side="left") + 1
        bounds = np.concatenate(([0], cuts, [nrows])).astype(np.int64)
        bounds = np.maximum.accumulate(np.minimum(bounds, nrows))
    else:
        raise ValueError(f"unknown balance policy {balance!r}")
    return bounds.astype(INDEX_DTYPE)


@dataclasses.dataclass(frozen=True)
class RowBlockPlan:
    """A static row-block partition of one CSR operand.

    ``bounds``        (n_blocks+1,) row boundaries.
    ``rows_pad``      static per-block row capacity (max rows, aligned).
    ``nnz_pad``       static per-block nnz capacity (max nnz, aligned).
    """

    bounds: np.ndarray
    rows_pad: int
    nnz_pad: int
    balance: str

    @property
    def n_blocks(self) -> int:
        return int(self.bounds.shape[0]) - 1

    @property
    def rows_per_block(self) -> np.ndarray:
        return np.diff(self.bounds)


def make_row_block_plan(
    csr: CsrGraph,
    n_blocks: int,
    balance: str = "nnz",
    *,
    row_align: int = 8,
    nnz_align: int = 8,
) -> RowBlockPlan:
    """Plan + compute static paddings. ``row_align`` defaults to the f32
    sublane count (8); the reference's analogous ``granularity = 8/byte_dt``
    8-byte alignment is at partition.c:154-179 / spmm_mul_csr.c:171-189."""
    bounds = plan_row_blocks(csr.rowptr, n_blocks, balance)
    rows_per_block = np.diff(bounds)
    nnz_per_block = csr.rowptr[bounds[1:]] - csr.rowptr[bounds[:-1]]
    rows_pad = round_up(max(int(rows_per_block.max(initial=0)), 1), row_align)
    nnz_pad = round_up(max(int(nnz_per_block.max(initial=0)), 1), nnz_align)
    return RowBlockPlan(
        bounds=bounds, rows_pad=rows_pad, nnz_pad=nnz_pad, balance=balance
    )


def row_slot_table(plan: RowBlockPlan) -> np.ndarray:
    """Map global row r → its slot in the flattened (n_blocks, rows_pad)
    padded output; used to recover the (nrows, H) result with one gather."""
    nrows = int(plan.bounds[-1])
    slot = np.empty(nrows, dtype=INDEX_DTYPE)
    for b in range(plan.n_blocks):
        r0, r1 = int(plan.bounds[b]), int(plan.bounds[b + 1])
        slot[r0:r1] = b * plan.rows_pad + np.arange(r1 - r0)
    return slot


def with_padding(plan: RowBlockPlan, rows_pad: int, nnz_pad: int) -> RowBlockPlan:
    """Raise a plan's static capacities (for cross-part shape unification:
    all sp parts of a 2D prepare must share one padded shape)."""
    if rows_pad < plan.rows_pad or nnz_pad < plan.nnz_pad:
        raise ValueError("padding can only grow")
    return dataclasses.replace(plan, rows_pad=rows_pad, nnz_pad=nnz_pad)


@dataclasses.dataclass(frozen=True)
class EllBlocks:
    """Padded per-block ELL-style tables, all statically shaped.

    ``colind``  (n_blocks, nnz_pad) int32 — padding entries point at col 0.
    ``vals``    (n_blocks, nnz_pad) — padding entries are 0 (harmless FMA).
    ``rowloc``  (n_blocks, nnz_pad) int32 — block-local destination row of
                each nnz; padding targets the last padded row (masked out).
    ``row_start`` (n_blocks,) int32 — global row offset of each block.
    ``rows_pad``, ``nnz_pad`` — the static capacities.
    ``nrows``   logical row count of the full operand.
    """

    colind: np.ndarray
    vals: np.ndarray
    rowloc: np.ndarray
    row_start: np.ndarray
    rows_pad: int
    nnz_pad: int
    nrows: int
    ncols: int


def build_ell_blocks(csr: CsrGraph, plan: RowBlockPlan) -> EllBlocks:
    """Materialize the padded block tables for ``csr`` under ``plan``.

    This is the analog of the reference's prepare step
    (``prepare_pim_csr``, spmm_mul_csr.c:118-258): slice per block, pad to
    the common static capacity. Unlike the reference no per-tasklet split
    tables are needed — the kernel's inner vectorization replaces tasklets.
    """
    nb = plan.n_blocks
    row_start = plan.bounds[:-1].astype(INDEX_DTYPE)
    if csr.vals.dtype == np.float32:
        from pygim_tpu.core import native

        res = native.build_ell_native(
            csr.rowptr, csr.colind, csr.vals, plan.bounds,
            plan.rows_pad, plan.nnz_pad,
        )
        if res is not None:
            c, v, r = res
            return EllBlocks(
                colind=c, vals=v, rowloc=r, row_start=row_start,
                rows_pad=plan.rows_pad, nnz_pad=plan.nnz_pad,
                nrows=csr.nrows, ncols=csr.ncols,
            )
    colind = np.zeros((nb, plan.nnz_pad), dtype=INDEX_DTYPE)
    vals = np.zeros((nb, plan.nnz_pad), dtype=csr.vals.dtype)
    # padding rowloc targets rows_pad-1; combined with val=0 the padded FMA
    # writes 0 into a real accumulator slot — harmless, no masking needed.
    rowloc = np.full((nb, plan.nnz_pad), plan.rows_pad - 1, dtype=INDEX_DTYPE)
    rowptr = csr.rowptr
    rows_of_nnz = np.repeat(
        np.arange(csr.nrows, dtype=np.int64), np.diff(rowptr)
    )
    for b in range(nb):
        r0, r1 = int(plan.bounds[b]), int(plan.bounds[b + 1])
        e0, e1 = int(rowptr[r0]), int(rowptr[r1])
        k = e1 - e0
        colind[b, :k] = csr.colind[e0:e1]
        vals[b, :k] = csr.vals[e0:e1]
        rowloc[b, :k] = rows_of_nnz[e0:e1] - r0
    return EllBlocks(
        colind=colind, vals=vals, rowloc=rowloc, row_start=row_start,
        rows_pad=plan.rows_pad, nnz_pad=plan.nnz_pad,
        nrows=csr.nrows, ncols=csr.ncols,
    )


@dataclasses.dataclass(frozen=True)
class EllRows:
    """Fixed-degree row-ELL with virtual-row splitting.

    Every virtual row holds ≤ D edges of ONE source row; rows with degree
    > D are split into several virtual rows (the TPU answer to the
    reference's hub-row problem that its tasklet nnz-splitting + lock
    schemes address, partition.c:231-261 / spmm_mul_coo_dpu.c:28-42) and
    merged afterwards by one sorted segment-sum over virtual rows.

    ``cols``/``vals``: (n_virtual_pad, D) — padding entries col 0 / val 0.
    ``vrow_to_row``: (n_virtual_pad,) destination row per virtual row
    (padding targets the LAST row, nrows-1, with zero values — harmless,
    and keeps the array non-decreasing so ``indices_are_sorted=True``
    holds in the consuming segment-sum).
    """

    cols: np.ndarray
    vals: np.ndarray
    vrow_to_row: np.ndarray
    degree: int
    n_virtual: int
    nrows: int
    ncols: int


_ELL_DEGREE_CANDIDATES = (
    2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512
)

# Measured ELL cost constants (v5e via tunnel, round-4 calibration):
# per-slot gather issue ~8.7 ns (≤1M-row x tables; the engine is
# issue-rate-bound, CLAUDE.md), and ~56 ns of per-VIRTUAL-ROW overhead at
# H=256 (stacked-partial write + sorted scatter-add + in-scan carry).
# Both anchors fit two independent measurements: products D=8
# (9.55M vrows, 76.4M slots -> 1402 ms, docs/PERF.md E6) and reddit D=4
# (0.72M vrows, 2.88M slots -> 65 ms tail phase). The overhead is
# ISSUE-dominated, so only its 3-HBM-pass byte term scales with H:
# V(H) = 52 + 12*H bytes / 819 GB/s = 52 + H/68 ns.
_ELL_SLOT_NS = 8.7
_ELL_VROW_FIXED_NS = 52.0
_ELL_VROW_NS_PER_H = 1.0 / 68.0


def _ell_vrow_ns(hidden) -> float:
    h = 256 if hidden is None else int(hidden)
    return _ELL_VROW_FIXED_NS + h * _ELL_VROW_NS_PER_H


def ell_issue_seconds(slots: int, n_virtual: int, hidden=None) -> float:
    """Issue-bound ELL tail time under the measured model (the same
    constants :func:`choose_ell_degree` optimizes against): every padded
    slot costs one gather issue (G = 8.7 ns — the engine is issue-rate-
    bound, NOT bandwidth-bound, for rows ≤ ~1 KB) and every virtual row
    costs V(H) ≈ 52 + H/68 ns of merge overhead. The tuner's byte-
    roofline under-priced exactly this (gather_bytes at 30% HBM = 2-4
    ns/slot depending on dtype), which made it shrink the hub core in
    favor of more tail — refuted on-chip three times (results/ tuner-
    argmin A/Bs). predict_spmm_time now takes max(issue, byte-roofline)."""
    return (slots * _ELL_SLOT_NS + n_virtual * _ell_vrow_ns(hidden)) * 1e-9


def choose_ell_degree(
    row_lengths: np.ndarray,
    hidden: Optional[int] = None,
    partial_budget_bytes: int = 2 << 30,  # retained for API compat
) -> int:
    """Auto degree D: argmin over candidates of the measured runtime
    model ``Σ_r ceil(deg_r / D) · (D·G + V(H))`` — padded slots cost one
    issue-bound gather each (G = 8.7 ns) and each virtual row carries a
    fixed overhead V(H) ≈ 56 ns at H=256 (stacked-partial + sorted
    scatter-add; see _ELL_VROW_FIXED_NS calibration note). Round-3's
    model under-priced V ~10× (c(H)·7ns ≈ 5.9 ns) and picked D=4 on the
    reddit tail; the recalibrated model picks D=12, predicted −13 ms of
    the 65 ms tail (validated on-chip, docs/PERF.md round 4).

    The former (n_virtual, hidden) stacked-partial HBM guard is gone:
    grouped accumulation (ops/spmm.py:_ell_grouped_scan) bounds the
    partial at ELL_PARTIAL_BYTES for any D, so the degree choice is
    purely the runtime argmin (on ogbn-products the old guard forced
    D=48 at 53% fill — 1.85× padded-slot blowup)."""
    deg = row_lengths[row_lengths > 0].astype(np.int64)
    if deg.size == 0:
        return 4

    def n_virtual(d):
        return int((-(-deg // d)).sum())

    v_ns = _ell_vrow_ns(hidden)
    best_d, best_cost = 4, float("inf")
    for d in _ELL_DEGREE_CANDIDATES:
        n_vr = n_virtual(d)
        cost = n_vr * (d * _ELL_SLOT_NS + v_ns)
        if cost < best_cost - 1e-9:
            best_d, best_cost = d, cost
    return best_d


def choose_ell_degrees(
    row_lengths: np.ndarray,
    hidden: Optional[int] = None,
    max_tables: int = 3,
) -> "tuple[int, ...]":
    """Multi-degree ELL: split rows across up to ``max_tables`` tables of
    different fixed degrees, each row packed in the table minimizing ITS
    cost under the measured model (choose_ell_degree docstring). A single
    degree over a skewed tail wastes either padding (small D on long
    rows → many virtual rows × V) or slots (large D on short rows);
    reddit-tail model: D=4 64 ms → best single D=12 51 ms → best
    3-table (4,12,32) 41 ms of a 21.6 ms no-overhead floor.

    Exhaustive search over candidate combinations on the degree
    HISTOGRAM (cost arrays over distinct degrees — O(|cands|·max_deg)
    setup, O(C(|cands|, t)·max_deg) scan). Returns degrees sorted
    ascending; may return fewer than max_tables when extra tables stop
    paying (< 2% cost improvement per added table)."""
    import itertools

    deg = row_lengths[row_lengths > 0].astype(np.int64)
    if deg.size == 0:
        return (4,)
    if max_tables <= 1:
        return (choose_ell_degree(row_lengths, hidden),)
    cnt = np.bincount(deg)  # cnt[d] rows of degree d
    ds = np.arange(cnt.size, dtype=np.int64)
    v_ns = _ell_vrow_ns(hidden)
    cands = [d for d in _ELL_DEGREE_CANDIDATES if d <= max(2, deg.max())]
    # cost[D][d] = total ns for all rows of degree d packed at degree D
    cost = {
        D: (-(-ds // D)) * (D * _ELL_SLOT_NS + v_ns) * cnt
        for D in cands
    }
    best: "tuple[float, tuple[int, ...]]" = (float("inf"), (4,))
    for t in range(1, max_tables + 1):
        t_best = (float("inf"), (4,))
        for combo in itertools.combinations(cands, t):
            c = float(np.minimum.reduce([cost[D] for D in combo]).sum())
            if c < t_best[0]:
                t_best = (c, combo)
        # one more table must buy ≥2% or it's compile bloat for noise
        if t_best[0] < best[0] * (1.0 - 0.02 * (t > 1)):
            best = t_best
        else:
            break
    return tuple(sorted(best[1]))


def choose_degrees_for_config(row_lengths: np.ndarray, config) -> "tuple[int, ...]":
    """The single authority for a (graph, config)'s ELL degree set:
    pinned degree, single table, or the multi-table split. Used
    identically by the single-chip prepare (ops/spmm.py:_plan_ell_tables),
    the shared SPMD planner (plan_shared_ell_tables), and the tuner's
    pricing (tune/autotuner.py:plan_statistics) — one copy, so the priced
    tables can never drift from the built ones. The split reads
    ``config.hidden_hint`` because that is what prepare reads; callers
    pricing a different runtime width still price TIME at that width,
    only the table SHAPES come from the hint."""
    if config.ell_degree:
        return (config.ell_degree,)
    if config.ell_tables <= 1:
        return (
            choose_ell_degree(row_lengths, hidden=config.hidden_hint),
        )
    return choose_ell_degrees(
        row_lengths, hidden=config.hidden_hint,
        max_tables=config.ell_tables,
    )


def assign_ell_tables(
    row_lengths: np.ndarray,
    degrees: "tuple[int, ...]",
    hidden: Optional[int] = None,
) -> np.ndarray:
    """Per-row table index (into sorted ``degrees``) minimizing the
    measured per-row cost; -1 for empty rows."""
    deg = row_lengths.astype(np.int64)
    v_ns = _ell_vrow_ns(hidden)
    costs = np.stack(
        [(-(-deg // D)) * (D * _ELL_SLOT_NS + v_ns) for D in degrees]
    )
    pick = np.argmin(costs, axis=0).astype(np.int32)
    pick[deg == 0] = -1
    return pick


def build_ell_rows(
    csr: CsrGraph, degree: Optional[int] = None, *, row_chunk: int = 1
) -> EllRows:
    """Vectorized construction of the fixed-degree tables.

    ``row_chunk`` pads n_virtual to a multiple (scan-step divisibility).
    """
    deg = np.diff(csr.rowptr).astype(np.int64)
    D = degree if degree is not None else choose_ell_degree(deg)
    n_vr_per_row = -(-deg // D)  # 0 for empty rows
    vrow_offset = np.zeros(csr.nrows + 1, dtype=np.int64)
    np.cumsum(n_vr_per_row, out=vrow_offset[1:])
    n_virtual = int(vrow_offset[-1])
    n_virtual_pad = round_up(max(n_virtual, 1), row_chunk)

    cols = np.zeros((n_virtual_pad, D), dtype=INDEX_DTYPE)
    vals = np.zeros((n_virtual_pad, D), dtype=csr.vals.dtype)
    vrow_to_row = np.full(
        n_virtual_pad, max(csr.nrows - 1, 0), dtype=INDEX_DTYPE
    )
    rows_of_nnz = np.repeat(np.arange(csr.nrows, dtype=np.int64), deg)
    pos_in_row = np.arange(csr.nnz, dtype=np.int64) - np.repeat(
        csr.rowptr[:-1].astype(np.int64), deg
    )
    gvr = vrow_offset[rows_of_nnz] + pos_in_row // D
    slot = pos_in_row % D
    flat = gvr * D + slot
    cols.reshape(-1)[flat] = csr.colind
    vals.reshape(-1)[flat] = csr.vals
    nz_rows = np.flatnonzero(n_vr_per_row)
    vrow_to_row[:n_virtual] = np.repeat(nz_rows, n_vr_per_row[nz_rows])
    return EllRows(
        cols=cols, vals=vals, vrow_to_row=vrow_to_row, degree=D,
        n_virtual=n_virtual, nrows=csr.nrows, ncols=csr.ncols,
    )


def build_ell_rows_multi(
    csr: CsrGraph,
    degrees: "tuple[int, ...]",
    hidden: Optional[int] = None,
    row_chunk_for=None,
    keep_empty: bool = False,
) -> "list[EllRows]":
    """Multi-degree ELL tables: each row's edges land in exactly ONE
    table — the degree minimizing its measured cost (assign_ell_tables) —
    so the tables' scatter-adds into the output are disjoint and order-
    free. Returns one EllRows per SURVIVING degree (a degree nobody
    picked is dropped) — unless ``keep_empty``, which materializes every
    degree (possibly with zero virtual rows) so tables align by index
    across SPMD shards that plan against a COMBINED histogram.
    ``row_chunk_for(D)`` supplies each table's scan chunk (defaults
    to 1)."""
    lens = csr.row_lengths
    pick = assign_ell_tables(lens, degrees, hidden)
    deg64 = lens.astype(np.int64)
    edge_pick = np.repeat(pick, deg64)  # per-nnz table index
    out: "list[EllRows]" = []
    for gi, D in enumerate(degrees):
        rmask = pick == gi
        if not rmask.any() and not keep_empty:
            continue
        sub_lens = np.where(rmask, deg64, 0)
        rowptr = np.zeros(csr.nrows + 1, dtype=np.int64)
        np.cumsum(sub_lens, out=rowptr[1:])
        sel = edge_pick == gi
        sub = CsrGraph(
            rowptr=rowptr, colind=csr.colind[sel], vals=csr.vals[sel],
            ncols=csr.ncols,
        )
        chunk = 1 if row_chunk_for is None else row_chunk_for(D)
        out.append(build_ell_rows(sub, D, row_chunk=chunk))
    if not out:  # empty graph: one empty table keeps callers simple
        chunk = 1 if row_chunk_for is None else row_chunk_for(degrees[0])
        out.append(build_ell_rows(csr, degrees[0], row_chunk=chunk))
    return out


@dataclasses.dataclass(frozen=True)
class CooChunks:
    """Exact-nnz COO chunking with mid-row cuts allowed — the analog of
    ``partition_tsklt_by_nnz_coo`` (partition.c:231-261). Rows straddling
    chunk boundaries are merged by the caller's segmented reduction
    (no CG_LOCK/LOCKFREE variants needed under XLA, SURVEY.md §5.2).

    ``rows``/``cols``/``vals``: (n_chunks, chunk_nnz) padded; padding has
    val 0, col 0, and row nrows-1 (keeps the per-chunk row stream sorted
    for ``indices_are_sorted=True``).
    """

    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    n_chunks: int
    chunk_nnz: int
    nrows: int
    ncols: int


def build_coo_chunks(
    coo: CooGraph, n_chunks: int, *, nnz_align: int = 8
) -> CooChunks:
    s = coo.sort_by_row()
    chunk_nnz = round_up(max(-(-coo.nnz // n_chunks), 1), nnz_align)
    total = chunk_nnz * n_chunks
    pad = total - coo.nnz
    rows = np.concatenate(
        [s.rows, np.full(pad, max(coo.nrows - 1, 0), dtype=INDEX_DTYPE)]
    )
    cols = np.concatenate([s.cols, np.zeros(pad, dtype=INDEX_DTYPE)])
    vals = np.concatenate([s.vals, np.zeros(pad, dtype=s.vals.dtype)])
    return CooChunks(
        rows=rows.reshape(n_chunks, chunk_nnz),
        cols=cols.reshape(n_chunks, chunk_nnz),
        vals=vals.reshape(n_chunks, chunk_nnz),
        n_chunks=n_chunks, chunk_nnz=chunk_nnz,
        nrows=coo.nrows, ncols=coo.ncols,
    )


def split_columns(graph, sp_parts: int):
    """Sparse-dim split (``sp_parts``): A by columns; partial products must
    be summed — reference merges on host (memadd_2D, spmm_mul_csr.c:497-506),
    we ``psum`` over the ``sp`` mesh axis instead."""
    return graph.col_split(sp_parts)


def split_features(hidden: int, ds_parts: int) -> list[tuple[int, int]]:
    """Dense/feature-dim split (``ds_parts``): equal widths, remainder in the
    last part — same convention as spmm.py:59-63 ``h_size``."""
    return column_split_bounds(hidden, ds_parts)


def strip_csr(p: CsrGraph, keep: np.ndarray, rows_of=None) -> CsrGraph:
    """Rebuild a CSR keeping only the entries selected by ``keep``
    (a mask over storage order) — the shared idiom for removing
    hub-core / tile-tier edges from the gather tail (single-chip,
    2D-mesh, halo, and the tuner's cut pricing all strip this way)."""
    if rows_of is None:
        rows_of = np.repeat(
            np.arange(p.nrows, dtype=np.int64), np.diff(p.rowptr)
        )
    counts = np.bincount(rows_of[keep], minlength=p.nrows)
    rowptr = np.zeros(p.nrows + 1, dtype=np.int32)
    np.cumsum(counts, out=rowptr[1:])
    return CsrGraph(
        rowptr=rowptr, colind=p.colind[keep], vals=p.vals[keep],
        ncols=p.ncols,
    )


def int_demote_slab(
    slab: np.ndarray, core_dtype: str
) -> tuple[np.ndarray, np.ndarray]:
    """Round a float32 core slab to the exact-integer range of the core
    dtype ([-128, 127] for int8, [-8, 7] for int4 — the two's-complement
    minimum is representable; the nibble sign-extension in
    ops/spmm.py:_nibble_halves handles -8). Non-representable cells
    are ZEROED; their row-major flat indices are returned so the caller
    demotes the matching edges back to the exact gather tail — the rule
    every hub-core builder shares (ops/spmm.py, parallel/spmm_2d.py,
    parallel/halo.py)."""
    hi = 127 if core_dtype == "int8" else 7
    r = np.round(slab)
    bad = (r > hi) | (r < -hi - 1) | (r != slab)
    if not bad.any():
        return r, np.empty(0, dtype=np.int64)
    br, bc = np.nonzero(bad)
    return (
        np.where(bad, 0.0, r),
        br.astype(np.int64) * slab.shape[1] + bc,
    )


def pack_nibbles(slab: np.ndarray) -> np.ndarray:
    """Nibble-pack an integer-valued slab column-pairwise: byte j holds
    cells (2j, 2j+1), low nibble = even column — the packed-int4 core
    layout `_core_matmul` unpacks on the MXU."""
    lo = slab[:, 0::2].astype(np.int8).astype(np.uint8) & 0xF
    hi = slab[:, 1::2].astype(np.int8).astype(np.uint8) & 0xF
    return lo | (hi << 4)
