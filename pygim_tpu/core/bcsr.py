"""BCSR middle tier planning: dense (Tr × 128) tiles in degree-rank space.

The round-1 hybrid backend covers power-law graphs with a dense hub-core
(top-K × top-K after degree ranking) plus an ELL gather tail. On graphs
with a flatter degree distribution (ogbn-products-shaped), the core covers
too few edges and the tail's per-edge gather cost (~7-10 ns/edge,
issue-rate-bound — docs/PERF.md) dominates. This module adds the middle
tier: the rank-permuted adjacency outside the core still has *locally
dense* tiles, and a dense (Tr, 128) tile multiplied against a contiguous
(128, H) panel of rank-permuted x amortizes ONE gather issue over 128
rows (the gather engine moves (128, H) blocks at full HBM bandwidth when
the slice is that big) and runs the FMAs on the MXU.

This is the TPU answer to the reference's skew-robust nnz balancing
(backend_pim/spmm_default/support/partition.c:51-99): instead of balancing
scalar work over DPUs, reshape the mid-degree band into MXU-friendly
dense tiles.

Tile selection is marginal-cost based: a tile of ``c`` edges costs
``Tr·128·itemsize  (tile read) + 128·H·4 (panel read) + Tr·H·4 (partial
write)`` bytes of HBM traffic; it beats the ELL tail when that is below
``c × edge_cost_bytes`` where ``edge_cost_bytes ≈ gather_ns × HBM_BW`` is
the bandwidth-equivalent cost of one issue-bound gather. Qualifying tiles
are taken densest-first until the byte budget is exhausted.

Row blocks owning many tiles are split into virtual row blocks of exactly
``S`` tiles (the ELL virtual-row trick one level up); partial products are
merged by one sorted segment-sum over virtual row blocks.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pygim_tpu.core.graph import INDEX_DTYPE

TILE_COLS = 128  # lane width; panel gather granularity

# bandwidth-equivalent cost of one issue-bound single-row gather:
# ~8 ns/edge (docs/PERF.md) at ~800 GB/s effective = ~6.4 KB per edge
EDGE_COST_BYTES = 6400


@dataclasses.dataclass(frozen=True)
class BcsrTiles:
    """Statically-shaped device tables for the tile tier.

    ``tiles``        (n_vblocks, S, Tr, TILE_COLS) tile values (padding 0).
    ``panel_idx``    (n_vblocks, S) int32 — panel table index per tile.
    ``vblock_to_rb`` (n_vblocks,) int32 — compact row-block id per virtual
                     block, non-decreasing (sorted segment-sum contract);
                     padding targets the last block.
    ``panel_nodes``  (n_panels · TILE_COLS,) int32 — ORIGINAL node ids to
                     gather into the panel table (clamped at n-1 past the
                     rank-space end; the matching tile entries are 0).
    ``row_nodes``    (n_rb · Tr,) int32 — ORIGINAL node ids receiving each
                     partial row (clamped likewise).
    ``n_edges``      edges captured by the tier.
    """

    tiles: np.ndarray
    panel_idx: np.ndarray
    vblock_to_rb: np.ndarray
    panel_nodes: np.ndarray
    row_nodes: np.ndarray
    tile_rows: int
    tiles_per_vblock: int
    n_edges: int


def min_edges_per_tile(
    tile_rows: int, hidden: int, itemsize: int = 2,
    edge_cost_bytes: int = EDGE_COST_BYTES,
) -> int:
    """Marginal-analysis cutoff: smallest tile edge count at which the
    dense tile beats the per-edge gather path."""
    tile_bytes = (
        tile_rows * TILE_COLS * itemsize        # tile read
        + TILE_COLS * hidden * 4                # panel read
        + tile_rows * hidden * 4                # partial write
    )
    return max(2, -(-tile_bytes // edge_cost_bytes))


def _choose_tiles_per_vblock(tiles_per_rb: np.ndarray) -> int:
    """Fixed tiles-per-virtual-block S minimizing padded tile slots
    (same objective as choose_ell_degree, one level up)."""
    best_s, best_cost = 1, float("inf")
    for s in (1, 2, 4, 8, 16, 32):
        cost = int((-(-tiles_per_rb // s)).sum()) * s
        if cost < best_cost:
            best_s, best_cost = s, cost
    return best_s


def build_bcsr_tiles(
    rr: np.ndarray,
    cc: np.ndarray,
    vals: np.ndarray,
    order: np.ndarray,
    *,
    n: int,
    tile_rows: int,
    budget_bytes: int,
    hidden: int,
    dtype: str = "bfloat16",
    min_edges: int = 0,
    col_order: "np.ndarray | None" = None,
    n_cols: "int | None" = None,
) -> tuple["BcsrTiles | None", np.ndarray]:
    """Select + materialize tiles from edges given in RANK coordinates.

    ``rr``/``cc``: degree-rank of each edge's destination/source node;
    ``order``: rank → original node id. Returns ``(tiles, in_tile_mask)``
    — ``tiles`` is None when no tile qualifies.

    ``col_order``/``n_cols``: optional SEPARATE rank space for the
    column (panel) dimension — the 2D mesh path ranks each x-shard's
    own nodes so panels never gather rows the shard doesn't hold
    (parallel/spmm_2d.py); default = the shared row space.
    """
    import ml_dtypes

    if col_order is None:
        col_order = order
    if n_cols is None:
        n_cols = n
    itemsize = 2 if dtype == "bfloat16" else 4
    if budget_bytes <= 0 or rr.size == 0:
        return None, np.zeros(rr.shape[0], dtype=bool)
    tr, tc = tile_rows, TILE_COLS
    if min_edges <= 0:
        min_edges = min_edges_per_tile(tr, hidden, itemsize)

    ncb = -(-n_cols // tc)
    tid = (rr.astype(np.int64) // tr) * ncb + cc.astype(np.int64) // tc
    utid, inv, counts = np.unique(tid, return_inverse=True, return_counts=True)

    tile_bytes = tr * tc * itemsize
    max_tiles = max(0, budget_bytes // tile_bytes)
    qual = np.flatnonzero(counts >= min_edges)
    if qual.size == 0 or max_tiles == 0:
        return None, np.zeros(rr.shape[0], dtype=bool)
    if qual.size > max_tiles:
        # densest-first under the budget
        top = np.argsort(-counts[qual], kind="stable")[:max_tiles]
        qual = qual[top]
    sel_mask_per_utid = np.zeros(utid.shape[0], dtype=bool)
    sel_mask_per_utid[qual] = True
    in_tile = sel_mask_per_utid[inv]

    # ---- group selected tiles by row block, in (rb, cb) order ----
    sel_tids = np.sort(utid[qual])
    rb_all = sel_tids // ncb
    cb_all = sel_tids % ncb
    urb, tiles_per_rb = np.unique(rb_all, return_counts=True)
    s = _choose_tiles_per_vblock(tiles_per_rb)
    vb_per_rb = -(-tiles_per_rb // s)
    n_vb = int(vb_per_rb.sum())

    # tile j (within its rb) → vblock offset + j//s, slot j%s
    vb_offset = np.zeros(urb.shape[0] + 1, dtype=np.int64)
    np.cumsum(vb_per_rb, out=vb_offset[1:])
    rb_of_tile = np.searchsorted(urb, rb_all)
    j_in_rb = np.arange(sel_tids.shape[0]) - np.repeat(
        np.concatenate(([0], np.cumsum(tiles_per_rb)[:-1])), tiles_per_rb
    )
    tile_vb = vb_offset[rb_of_tile] + j_in_rb // s
    tile_slot = j_in_rb % s

    # ---- panel table: unique col blocks ----
    ucb = np.unique(cb_all)
    panel_of_tile = np.searchsorted(ucb, cb_all)
    panel_ranks = (
        ucb[:, None] * tc + np.arange(tc, dtype=np.int64)[None, :]
    ).reshape(-1)
    panel_nodes = col_order[
        np.minimum(panel_ranks, n_cols - 1)
    ].astype(INDEX_DTYPE)

    row_ranks = (
        urb[:, None] * tr + np.arange(tr, dtype=np.int64)[None, :]
    ).reshape(-1)
    row_nodes = order[np.minimum(row_ranks, n - 1)].astype(INDEX_DTYPE)

    # ---- materialize tiles (duplicate edges accumulated) ----
    # map each selected edge to its flat position in the tiles array
    e_tid = tid[in_tile]
    e_pos_in_sel = np.searchsorted(sel_tids, e_tid)
    e_flat = (
        (tile_vb[e_pos_in_sel] * s + tile_slot[e_pos_in_sel]) * (tr * tc)
        + (rr[in_tile].astype(np.int64) % tr) * tc
        + cc[in_tile].astype(np.int64) % tc
    )
    uflat, uinv = np.unique(e_flat, return_inverse=True)
    sums = np.bincount(
        uinv, weights=vals[in_tile].astype(np.float64),
        minlength=uflat.shape[0],
    ).astype(np.float32)
    np_dtype = ml_dtypes.bfloat16 if dtype == "bfloat16" else np.float32
    tiles = np.zeros(n_vb * s * tr * tc, dtype=np_dtype)
    tiles[uflat] = sums.astype(np_dtype)
    tiles = tiles.reshape(n_vb, s, tr, tc)

    panel_idx = np.zeros((n_vb, s), dtype=INDEX_DTYPE)
    panel_idx[tile_vb, tile_slot] = panel_of_tile
    vblock_to_rb = np.repeat(
        np.arange(urb.shape[0], dtype=INDEX_DTYPE), vb_per_rb
    )
    return (
        BcsrTiles(
            tiles=tiles, panel_idx=panel_idx, vblock_to_rb=vblock_to_rb,
            panel_nodes=panel_nodes, row_nodes=row_nodes,
            tile_rows=tr, tiles_per_vblock=s, n_edges=int(in_tile.sum()),
        ),
        in_tile,
    )


def tail_tile_order(
    rows: np.ndarray,
    cols: np.ndarray,
    order: np.ndarray,
    rank: np.ndarray,
    k: int,
    n: int,
    method: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Re-rank the non-core band by the tail subgraph's structure.

    ``rows``/``cols``: the tail edges in ORIGINAL node ids. Returns
    ``(t_order, t_rank)`` — copies of (order, rank) with ranks ``k..``
    permuted by reverse Cuthill-McKee (``"rcm"``, bandwidth-shaped) or
    label propagation (``"lp"``, community-shaped) of the both-tail
    subgraph. Measured capture numbers in docs/PERF.md ("Tile ordering
    on latent-community graphs"). Shared by the single-chip prepare
    (ops/spmm.py) and the 2D mesh tier (parallel/spmm_2d.py).
    """
    import scipy.sparse as sp

    tail_nodes = np.sort(order[k:])
    pos = np.full(n, -1, dtype=np.int64)
    pos[tail_nodes] = np.arange(n - k)
    mm = (pos[rows] >= 0) & (pos[cols] >= 0)
    if method == "rcm":
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        sub = sp.csr_matrix(
            (
                np.ones(int(mm.sum()), np.int8),
                (pos[rows[mm]], pos[cols[mm]]),
            ),
            shape=(n - k, n - k),
        )
        perm = np.asarray(reverse_cuthill_mckee(sub, symmetric_mode=False))
    else:
        from pygim_tpu.core.cluster import locality_order
        from pygim_tpu.core.graph import CooGraph

        perm = locality_order(
            CooGraph(
                rows=pos[rows[mm]].astype(np.int32),
                cols=pos[cols[mm]].astype(np.int32),
                vals=np.ones(int(mm.sum()), np.float32),
                nrows=n - k,
                ncols=n - k,
            ),
            "lp",
        )
    t_order = np.concatenate([order[:k], tail_nodes[perm]]).astype(
        order.dtype
    )
    t_rank = np.empty(n, dtype=rank.dtype)
    t_rank[t_order] = np.arange(n, dtype=rank.dtype)
    return t_order, t_rank


def panel_tile_cutoffs(
    tile_rows: int, hidden: int, itemsize: int = 2,
    edge_cost_bytes: int = EDGE_COST_BYTES,
) -> tuple[int, int]:
    """Marginal cutoffs for PANEL-MAJOR scheduling, where the (128, H)
    panel read is amortized over every tile of the column block:

    * per-tile cost   = tile read + partial write & merge-read
    * per-panel cost  = one (128, H) panel gather

    Returns ``(min_edges_per_tile, min_edges_per_panel)`` — a tile pays
    its own bytes; a panel qualifies when its QUALIFIED tiles' edges
    cover the panel gather. Much lower tile bar than the row-major
    scheme (no per-tile panel charge)."""
    tile_bytes = (
        tile_rows * TILE_COLS * itemsize     # tile read
        + 2 * tile_rows * hidden * 4         # partial write + merge read
    )
    panel_bytes = TILE_COLS * hidden * 4
    return (
        max(2, -(-tile_bytes // edge_cost_bytes)),
        max(2, -(-panel_bytes // edge_cost_bytes)),
    )


@dataclasses.dataclass(frozen=True)
class BcsrPanels:
    """Panel-major device tables.

    ``tiles``       (n_vp, T, Tr, TILE_COLS) tile values (padding 0).
    ``panel_idx``   (n_vp,) int32 — panel table index per virtual panel.
    ``tile_rb``     (n_vp, T) int32 — compact row-block id per tile slot
                    (padding slots target block 0 with zero tiles).
    ``panel_nodes`` (n_panels · TILE_COLS,) original node ids.
    ``row_nodes``   (n_rb · Tr,) original node ids receiving rows.
    """

    tiles: np.ndarray
    panel_idx: np.ndarray
    tile_rb: np.ndarray
    panel_nodes: np.ndarray
    row_nodes: np.ndarray
    tile_rows: int
    tiles_per_vp: int
    n_rb: int
    n_edges: int


def build_bcsr_panels(
    rr: np.ndarray,
    cc: np.ndarray,
    vals: np.ndarray,
    order: np.ndarray,
    *,
    n: int,
    tile_rows: int,
    budget_bytes: int,
    hidden: int,
    dtype: str = "bfloat16",
    min_edges: int = 0,
) -> tuple["BcsrPanels | None", np.ndarray]:
    """Panel-major tile selection + materialization (rank coordinates,
    as :func:`build_bcsr_tiles`). Two-level qualification: tiles pass the
    per-tile cutoff, then column blocks (panels) pass when their
    qualified tiles jointly cover the panel-gather cost; densest panels
    first under the byte budget."""
    import ml_dtypes

    itemsize = 2 if dtype == "bfloat16" else 4
    if budget_bytes <= 0 or rr.size == 0:
        return None, np.zeros(rr.shape[0], dtype=bool)
    tr, tc = tile_rows, TILE_COLS
    t_min, p_min = panel_tile_cutoffs(tr, hidden, itemsize)
    if min_edges > 0:
        t_min = min_edges

    ncb = -(-n // tc)
    tid = (rr.astype(np.int64) // tr) * ncb + cc.astype(np.int64) // tc
    utid, inv, counts = np.unique(tid, return_inverse=True, return_counts=True)
    qual_t = counts >= t_min
    if not qual_t.any():
        return None, np.zeros(rr.shape[0], dtype=bool)

    # panel qualification over qualified tiles
    cb_of_utid = (utid % ncb).astype(np.int64)
    panel_edges = np.bincount(
        cb_of_utid[qual_t], weights=counts[qual_t], minlength=ncb
    )
    qual_p = panel_edges >= p_min
    sel = qual_t & qual_p[cb_of_utid]
    if not sel.any():
        return None, np.zeros(rr.shape[0], dtype=bool)

    # budget: keep densest PANELS first (edges per tile byte)
    tile_bytes = tr * tc * itemsize
    sel_idx = np.flatnonzero(sel)
    tiles_per_panel = np.bincount(cb_of_utid[sel_idx], minlength=ncb)
    max_tiles = max(0, budget_bytes // tile_bytes)
    if sel_idx.size > max_tiles:
        density = np.zeros(ncb)
        np.divide(
            panel_edges, tiles_per_panel, out=density,
            where=tiles_per_panel > 0,
        )
        order_p = np.argsort(-density, kind="stable")
        keep_p = np.zeros(ncb, dtype=bool)
        acc = 0
        for p in order_p:
            tpp = int(tiles_per_panel[p])
            if tpp == 0 or acc + tpp > max_tiles:
                continue
            keep_p[p] = True
            acc += tpp
        sel = sel & keep_p[cb_of_utid]
        sel_idx = np.flatnonzero(sel)
        if sel_idx.size == 0:
            return None, np.zeros(rr.shape[0], dtype=bool)
    in_tile = sel[inv]

    # ---- group selected tiles by panel (cb-major) ----
    sel_tids = utid[sel_idx]
    ord_cb = np.argsort(sel_tids % ncb, kind="stable")
    sel_tids = sel_tids[ord_cb]
    cb_all = sel_tids % ncb
    rb_all = sel_tids // ncb
    ucb, tiles_per_cb = np.unique(cb_all, return_counts=True)

    # fixed tiles-per-virtual-panel T minimizing padded slots
    t_fixed = _choose_tiles_per_vblock(tiles_per_cb)
    vp_per_cb = -(-tiles_per_cb // t_fixed)
    n_vp = int(vp_per_cb.sum())
    vp_off = np.zeros(ucb.shape[0] + 1, dtype=np.int64)
    np.cumsum(vp_per_cb, out=vp_off[1:])
    cb_pos = np.searchsorted(ucb, cb_all)
    j_in_cb = np.arange(sel_tids.shape[0]) - np.repeat(
        np.concatenate(([0], np.cumsum(tiles_per_cb)[:-1])), tiles_per_cb
    )
    tile_vp = vp_off[cb_pos] + j_in_cb // t_fixed
    tile_slot = j_in_cb % t_fixed

    # compact row blocks
    urb = np.unique(rb_all)
    rb_compact = np.searchsorted(urb, rb_all)

    panel_ranks = (
        ucb[:, None] * tc + np.arange(tc, dtype=np.int64)[None, :]
    ).reshape(-1)
    panel_nodes = order[np.minimum(panel_ranks, n - 1)].astype(INDEX_DTYPE)
    row_ranks = (
        urb[:, None] * tr + np.arange(tr, dtype=np.int64)[None, :]
    ).reshape(-1)
    row_nodes = order[np.minimum(row_ranks, n - 1)].astype(INDEX_DTYPE)

    # ---- materialize (duplicates accumulated) ----
    e_tid = tid[in_tile]
    # position of each edge's tile in the cb-sorted selected list:
    # search the tid-sorted view, then map back through the sort perm
    srt = np.argsort(sel_tids, kind="stable")
    e_pos = srt[np.searchsorted(sel_tids[srt], e_tid)]
    e_flat = (
        (tile_vp[e_pos] * t_fixed + tile_slot[e_pos]) * (tr * tc)
        + (rr[in_tile].astype(np.int64) % tr) * tc
        + cc[in_tile].astype(np.int64) % tc
    )
    uflat, uinv = np.unique(e_flat, return_inverse=True)
    sums = np.bincount(
        uinv, weights=vals[in_tile].astype(np.float64),
        minlength=uflat.shape[0],
    ).astype(np.float32)
    np_dtype = ml_dtypes.bfloat16 if dtype == "bfloat16" else np.float32
    tiles = np.zeros(n_vp * t_fixed * tr * tc, dtype=np_dtype)
    tiles[uflat] = sums.astype(np_dtype)
    tiles = tiles.reshape(n_vp, t_fixed, tr, tc)

    panel_idx = np.zeros(n_vp, dtype=INDEX_DTYPE)
    panel_idx[tile_vp] = np.searchsorted(ucb, cb_all)
    tile_rb = np.zeros((n_vp, t_fixed), dtype=INDEX_DTYPE)
    tile_rb[tile_vp, tile_slot] = rb_compact
    return (
        BcsrPanels(
            tiles=tiles, panel_idx=panel_idx, tile_rb=tile_rb,
            panel_nodes=panel_nodes, row_nodes=row_nodes,
            tile_rows=tr, tiles_per_vp=t_fixed, n_rb=int(urb.shape[0]),
            n_edges=int(in_tile.sum()),
        ),
        in_tile,
    )
