#!/usr/bin/env python3
"""Host-side study: does a NON-SQUARE dense core capture more edges per
byte than the square degree-ranked k x k core?

Motivation (round-5): the reddit tail is at its gather-issue floor
(51.6 ms of pure issue-bound gathers in the 102 ms headline), so the
only remaining tail lever is core COVERAGE PER BYTE. The core region
need not be square: any down-closed region R in rank x rank space works
(cells outside R demote to the tail — the int-core demotion mechanism,
generalized to geometry). For a cell-density d(i, j) that is
non-increasing in both rank coordinates, the byte-budget-optimal region
is the SUPERLEVEL SET {d > lambda} with lambda chosen to meet the
budget — automatically monotone (a staircase). This script:

  1. loads the (duplicate-merged) graph, degree-ranks nodes,
  2. histograms edges on a geometric rank x rank grid,
  3. for each byte budget: compares captured edges of (a) the square
     core, (b) the optimal-threshold staircase, (c) 2-3 band
     rectangles (practical staircase approximations),
  4. prints the projected headline: core MXU ms (flop-bound, area
     x 2H flops at bf16) + tail ms (8.7 ns/slot on uncaptured edges
     + measured vrow overhead) vs the measured 102 ms baseline.

Pure host/numpy — safe to run beside a TPU client.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pygim_tpu.core.graph import merge_duplicate_edges
    from pygim_tpu.data import load_dataset

    dataset = os.environ.get("PYGIM_STUDY_DATASET", "reddit")
    t0 = time.time()
    ds = load_dataset(dataset)
    g, _ = merge_duplicate_edges(ds.graph)
    n, e = g.nrows, g.nnz
    log(f"{dataset}: N={n} E={e} (merged) [{time.time()-t0:.0f}s]")

    deg = np.bincount(g.rows, minlength=n).astype(np.int64)
    deg += np.bincount(g.cols, minlength=n)
    order = np.argsort(-deg)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)

    # geometric rank grid (fine near the top where density concentrates)
    edges_1d = np.unique(
        np.concatenate([
            [0],
            np.geomspace(64, n, 160).astype(np.int64),
            [n],
        ])
    )
    nb = len(edges_1d) - 1
    ri = np.searchsorted(edges_1d, rank[g.rows], side="right") - 1
    ci = np.searchsorted(edges_1d, rank[g.cols], side="right") - 1
    grid = np.zeros((nb, nb), dtype=np.int64)
    np.add.at(grid, (ri, ci), 1)
    cell_w = np.diff(edges_1d).astype(np.float64)
    area = cell_w[:, None] * cell_w[None, :]
    density = grid / area  # edges per rank-cell

    ns_per_slot = 8.7e-9
    core_ms_per_cell = 2 * 256 * 1e3 / 197e12  # bf16 flops at MXU peak

    def report(name, captured, cells):
        tail_edges = e - captured
        core_ms = cells * core_ms_per_cell
        tail_ms = tail_edges * ns_per_slot * 1e3 + 9.0  # vrow overhead
        log(
            f"  {name:28s} cov={captured/e:7.4f} cells={cells/1e9:6.2f}e9 "
            f"core~{core_ms:5.1f}ms tail~{tail_ms:5.1f}ms "
            f"total~{core_ms+tail_ms:6.1f}ms"
        )
        return core_ms + tail_ms

    for budget_gib in (8, 12):
        budget_cells = budget_gib * (1 << 30)  # int8: 1 B/cell
        log(f"budget {budget_gib} GiB (int8):")
        # (a) square k x k
        k = int(np.sqrt(budget_cells)) // 256 * 256
        cap = int(((rank[g.rows] < k) & (rank[g.cols] < k)).sum())
        report(f"square k={k}", cap, k * k)

        # (b) optimal staircase: threshold the density grid
        flat = np.argsort(-density.ravel())
        a_sorted = area.ravel()[flat]
        g_sorted = grid.ravel()[flat]
        cum_area = np.cumsum(a_sorted)
        cum_edges = np.cumsum(g_sorted)
        idx = int(np.searchsorted(cum_area, budget_cells))
        cap_stair = int(cum_edges[min(idx, len(cum_edges) - 1)])
        report("optimal staircase", cap_stair, budget_cells)

        # staircase shape summary: per row-band column extent
        chosen = np.zeros(nb * nb, dtype=bool)
        chosen[flat[:idx]] = True
        chosen = chosen.reshape(nb, nb)
        widths = [
            int(edges_1d[1:][chosen[i]].max()) if chosen[i].any() else 0
            for i in range(nb)
        ]
        rows_ext = int(
            edges_1d[1:][np.array(widths) > 0].max()
        ) if any(widths) else 0
        log(f"    staircase extent: rows to {rows_ext}, "
            f"widths head={widths[:6]} ...")

        # (c) two-band L-shape grid search (k1 full width k2; k2 narrow)
        best = None
        for k1 in range(8192, 131072, 8192):
            # band A: [0,k1) x [0,k2); band B: [k1,k2) x [0,k1)
            k2 = (budget_cells // k1 - k1) // 256 * 256 + k1
            if k2 <= k1 or k2 > n:
                continue
            rr, cc = rank[g.rows], rank[g.cols]
            capL = int(
                (((rr < k1) & (cc < k2))
                 | ((rr >= k1) & (rr < k2) & (cc < k1))).sum()
            )
            cells = k1 * k2 + (k2 - k1) * k1
            t = (
                cells * core_ms_per_cell
                + (e - capL) * ns_per_slot * 1e3 + 9.0
            )
            if best is None or t < best[0]:
                best = (t, k1, k2, capL, cells)
        if best:
            t, k1, k2, capL, cells = best
            report(f"L-shape k1={k1} k2={k2}", capL, cells)

        # (d) the PRACTICAL plan: plan_staircase with a band budget
        from pygim_tpu.core.stair import plan_staircase, staircase_coverage

        rr, cc = rank[g.rows], rank[g.cols]
        for mb in (4, 8, 12):
            t0 = time.time()
            bands = plan_staircase(rr, cc, n, budget_cells, max_bands=mb)
            capB = staircase_coverage(bands, rr, cc)
            cells = sum((b[1] - b[0]) * b[2] for b in bands)
            report(f"plan_staircase bands={len(bands)}", capB, cells)
            log(f"    bands: {bands}  [{time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
