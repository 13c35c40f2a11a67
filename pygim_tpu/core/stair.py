"""Staircase (variable-width banded) hub-core planning.

Round-5 finding (tools/core_shape_study.py, reddit-sim merged 78.8M
edges): at the SAME byte budget, the byte-optimal dense-core region in
degree-rank space is not the square [0,k)² — it is the superlevel set of
the rank×rank cell density, a staircase whose top rows span (nearly)
ALL columns and whose width tapers with rank:

    square 12 GiB  cov 96.85%      staircase 12 GiB  cov 99.36%
    square  8 GiB  cov 94.01%      staircase  8 GiB  cov 98.49%

Since the tail sits at its gather-issue floor (8.7 ns/slot — the 51.6 ms
gather phase of the 102 ms round-4 headline), a 5× cut in uncaptured
edges is the single biggest remaining single-chip lever: same core
bytes, same MXU flops, ~2-5× fewer tail gathers.

``plan_staircase`` picks a practical approximation: ≤ ``max_bands``
row bands, each a dense (rows_b × width_b) block multiplied on the MXU
against the rank-permuted activations ``x[order[:width_b]]``. Bands are
independent dots — no monotonicity requirement — chosen by a Lagrangian
threshold on a geometric rank×rank histogram (the superlevel-set
argument: for a density non-increasing in rank, thresholding IS the
byte-optimal region), then merged to the band budget and snapped to
hardware-friendly multiples.
"""

from __future__ import annotations

import numpy as np


def _geom_edges(n: int, count: int, start: int = 64) -> np.ndarray:
    e = np.unique(
        np.concatenate(
            [[0], np.geomspace(start, n, count).astype(np.int64), [n]]
        )
    )
    return e


def stair_grid(
    rank_r: np.ndarray, rank_c: np.ndarray, n: int, grid: int = 192
) -> tuple:
    """Precompute the geometric rank×rank edge histogram — the O(nnz)
    part of staircase planning, reusable across byte budgets (the tuner
    memoizes this once per graph and plans each candidate from it)."""
    redges = _geom_edges(n, grid)
    cedges = _geom_edges(n, grid)
    ri = np.searchsorted(redges, rank_r, side="right") - 1
    ci = np.searchsorted(cedges, rank_c, side="right") - 1
    nb_r, nb_c = len(redges) - 1, len(cedges) - 1
    g = np.zeros((nb_r, nb_c), dtype=np.int64)
    np.add.at(g, (ri, ci), 1)
    return redges, cedges, g


def plan_staircase(
    rank_r: np.ndarray,
    rank_c: np.ndarray,
    n: int,
    budget_cells: int,
    *,
    max_bands: int = 8,
    row_quant: int = 8,
    col_quant: int = 256,
    grid: int = 192,
    _grid_data=None,
) -> "list[tuple[int, int, int]]":
    """Choose ≤ ``max_bands`` row bands ``(row_lo, row_hi, width)`` in
    rank space, total cells ≤ ``budget_cells``, approximately maximizing
    captured edges. ``rank_r``/``rank_c`` are the rank positions of each
    edge's endpoints (row = destination rank, col = source rank).

    Bands tile ``[0, row_hi_last)`` contiguously; an edge is captured
    iff its row rank falls in some band AND its col rank < that band's
    width. Returns [] when no band is worth keeping (tiny budgets).
    ``_grid_data``: a precomputed :func:`stair_grid` result."""
    if budget_cells <= 0 or len(rank_r) == 0:
        return []
    redges, cedges, g = (
        _grid_data
        if _grid_data is not None
        else stair_grid(rank_r, rank_c, n, grid)
    )
    nb_r = len(redges) - 1
    cum = np.cumsum(g, axis=1)  # cum[i, j]: edges with col < cedges[j+1]
    rows_per = np.diff(redges).astype(np.int64)
    col_hi = cedges[1:].astype(np.int64)

    def widths_for(lam: float) -> np.ndarray:
        # per fine band: width maximizing captured − λ·cells (width 0 ok)
        score = cum - lam * rows_per[:, None] * col_hi[None, :]
        best = np.argmax(score, axis=1)
        w = col_hi[best]
        w[score[np.arange(nb_r), best] <= 0] = 0
        return w

    def cells_of(w: np.ndarray) -> int:
        return int((rows_per * w).sum())

    lo, hi = 0.0, 1.0
    while cells_of(widths_for(hi)) > budget_cells:
        hi *= 4
        if hi > 1e9:
            return []
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if cells_of(widths_for(mid)) > budget_cells:
            lo = mid
        else:
            hi = mid
    w = widths_for(hi)

    # merge contiguous fine bands into ≤ max_bands groups. Boundaries at
    # the largest relative width drops (log-space) keeps the merge cost
    # (each group takes its MAX width) small.
    nz = np.flatnonzero(w > 0)
    if len(nz) == 0:
        return []
    last = int(nz.max()) + 1
    w = w[:last].copy()
    w[w == 0] = col_quant  # interior zero-width bands: keep tiling cheap
    if last > max_bands:
        lw = np.log2(np.maximum(w, 1).astype(np.float64))
        drops = np.abs(np.diff(lw))
        cuts = np.sort(np.argsort(-drops)[: max_bands - 1] + 1)
    else:
        cuts = np.arange(1, last)
    bounds = np.concatenate([[0], cuts, [last]])
    bands = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        row_lo = int(redges[a])
        row_hi = int(redges[b])
        width = int(w[a:b].max())
        bands.append([row_lo, row_hi, width])

    # snap: rows to row_quant, widths to col_quant (never below what the
    # merge chose — snapping up first, then trim widths to the budget)
    for band in bands:
        band[1] = min(n, -(-band[1] // row_quant) * row_quant)
        band[2] = min(n, -(-band[2] // col_quant) * col_quant)
    for i in range(1, len(bands)):
        bands[i][0] = bands[i - 1][1]
    bands = [b for b in bands if b[1] > b[0] and b[2] > 0]

    def total_cells(bs):
        return sum((b[1] - b[0]) * b[2] for b in bs)

    # trim the cheapest-coverage widths until the snap overshoot fits
    while total_cells(bands) > budget_cells and bands:
        # shrink the band with the most cells per captured edge at its
        # margin: approximate by largest cells; simple and rare (snap
        # overshoot is ≤ a few % of budget)
        j = int(np.argmax([(b[1] - b[0]) * b[2] for b in bands]))
        # always land on a col_quant multiple — a band capped at n (full
        # width) is n-aligned, and a plain -= col_quant from there left
        # widths like 155653 (round-5 A/B prepare)
        bands[j][2] = (bands[j][2] - 1) // col_quant * col_quant
        if bands[j][2] <= 0:
            # bands must stay contiguous from rank 0 (the run path
            # scatters concat(band products) to core_nodes[:last_hi]):
            # give a popped MIDDLE band's rows to the narrower band
            # below it (cells shrink); a popped LAST band's rows simply
            # return to the tail
            if j + 1 < len(bands):
                bands[j + 1][0] = bands[j][0]
            bands.pop(j)
    return [tuple(b) for b in bands]


def staircase_coverage(
    bands, rank_r: np.ndarray, rank_c: np.ndarray
) -> int:
    """Edges captured by ``bands`` (exact count on the edge list)."""
    if not bands:
        return 0
    los = np.array([b[0] for b in bands], dtype=np.int64)
    his = np.array([b[1] for b in bands], dtype=np.int64)
    ws = np.array([b[2] for b in bands], dtype=np.int64)
    # bands tile contiguously from 0: locate each edge's band by row
    idx = np.searchsorted(his, rank_r, side="right")
    ok = idx < len(bands)
    idx = np.minimum(idx, len(bands) - 1)
    cap = (
        ok
        & (rank_r >= los[idx])
        & (rank_c < ws[idx])
    )
    return int(cap.sum())
