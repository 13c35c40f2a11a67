#!/usr/bin/env python3
"""Host-side study: which k-node selection captures the most edges in the
dense hub-core?

The hybrid backend's tail time is linear in the stored (merged) edges NOT
captured by the k x k core (docs/PERF.md: 65 ms of the 107.5 ms headline
at 12 GiB int8, ~12.4 ns/edge). The core build ranks nodes by total
degree (ops/spmm.py:750-752); this script counts captured cells for that
and for cheap alternatives, entirely on host (no TPU):

  degree      total in+out distinct-neighbor degree (the current rank)
  swap[p]     degree rank refined by local-search swaps (p passes):
              move in the nodes whose core-degree exceeds the marginal
              members' core-degree — the classic densest-k-subgraph
              refinement.

A selection only graduates to an on-chip A/B if it cuts tail cells
enough to beat the swap in core time (tail ns/edge ~12.4 vs core
~38.6 ms fixed at the same k).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def captured(rank, rows, cols, k):
    return int(((rank[rows] < k) & (rank[cols] < k)).sum())


def rank_of(order, n):
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    return rank


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pygim_tpu.core.graph import merge_duplicate_edges
    from pygim_tpu.data import load_dataset

    dataset = os.environ.get("PYGIM_STUDY_DATASET", "reddit")
    k = int(os.environ.get("PYGIM_STUDY_K", 113408))  # int8 12 GiB
    t0 = time.time()
    ds = load_dataset(dataset)
    g, _ = merge_duplicate_edges(ds.graph)
    rows, cols = g.rows, g.cols
    n, e = g.nrows, g.nnz
    print(f"{dataset}: N={n} merged-E={e} k={k}  [{time.time()-t0:.0f}s]")

    deg = np.bincount(rows, minlength=n).astype(np.int64)
    deg += np.bincount(cols, minlength=n)
    order = np.argsort(-deg)
    rank = rank_of(order, n)
    base = captured(rank, rows, cols, k)
    print(f"degree     : captured {base} ({base/e:.4f})  tail {e-base}")

    # local-search swap passes: recompute each node's core-degree (edges
    # whose OTHER endpoint is in the core), then re-rank by it among the
    # current core's marginal zone. One pass is O(E).
    in_core = rank < k
    for p in range(1, int(os.environ.get("PYGIM_STUDY_PASSES", 4)) + 1):
        t1 = time.time()
        core_deg = np.bincount(rows, weights=in_core[cols], minlength=n)
        core_deg += np.bincount(cols, weights=in_core[rows], minlength=n)
        # choose the k nodes with the highest core-degree (ties broken by
        # total degree so isolated-from-core hubs still make it in)
        score = core_deg * (deg.max() + 1) + deg
        new_order = np.argsort(-score)
        new_rank = rank_of(new_order, n)
        new_cap = captured(new_rank, rows, cols, k)
        moved = int((in_core != (new_rank < k)).sum())
        print(
            f"swap pass {p}: captured {new_cap} ({new_cap/e:.4f})  "
            f"tail {e-new_cap}  moved {moved}  [{time.time()-t1:.0f}s]"
        )
        if new_cap > base:
            # adopt only improvements: iterating from a worse selection
            # mixes baselines and can end the loop on a regression with
            # the best selection discarded (round-4 review finding)
            base, rank, in_core = new_cap, new_rank, new_rank < k
        else:
            break
    print(f"best       : captured {base} ({base/e:.4f})  tail {e-base}")


if __name__ == "__main__":
    main()
