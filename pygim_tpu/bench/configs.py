"""Named experiment sets — utils/configs.py analog, extended with the
BASELINE.md tracked configurations."""

from __future__ import annotations

from pygim_tpu.bench.experiment import Experiment
from pygim_tpu.tune.space import For

# reference sets (utils/configs.py:3-14)
NR_BLOCK_BUDGETS = {"set_1": [1 << 14, 1 << 15, 1 << 16, 1 << 17, 1 << 19]}
DATASETS = {
    "set_1": ["pubmed", "ogbn-arxiv", "reddit", "ogbn-products"],
    "small": ["tiny", "small"],
}

# BASELINE.md §3 tracked configs
BASELINE_EXPERIMENTS = [
    # (1) single SpMM Reddit CSR FLT32 h=256 (with the per-phase timer
    # breakdown the reference emitted per multiply); 12 GiB INT8 core +
    # multi-degree ELL tail = the round-4 measured best (101.4 ms /
    # 1168.9 GB/s, vs_baseline 2.03; round-3 single-table was 107.5 ms;
    # bf16 12 GiB kept as the float-valued-graph canonical point —
    # docs/PERF.md round 4). Budget sweep settled: the model prefers
    # ~10 GiB but under-prices the tail — measured uniq 10 vs 12 GiB
    # (158 vs 138 ms) says bigger core wins; 13+ GiB is break-even at
    # best and risks HBM beside the dataset residency.
    # round-5 measured best: the STAIRCASE core region — 75.9 ms /
    # 1562.0 GB/s verified (coverage 99.1% vs the square's 96.9% at the
    # same 12 GiB; core/stair.py, docs/PERF.md round 5)
    Experiment(dataset="reddit", kind="spmm", sp_format="csr",
               dtype="float32", hidden=256, backend="hybrid", phases=True,
               hybrid_core_bytes=12 << 30, hybrid_dtype="int8",
               hybrid_shape="stair"),
    Experiment(dataset="reddit", kind="spmm", sp_format="csr",
               dtype="float32", hidden=256, backend="hybrid", phases=True,
               hybrid_core_bytes=12 << 30, hybrid_dtype="int8"),
    Experiment(dataset="reddit", kind="spmm", sp_format="csr",
               dtype="float32", hidden=256, backend="hybrid", phases=True,
               hybrid_core_bytes=12 << 30, hybrid_dtype="bfloat16"),
    # (1b) generator-fidelity sibling: reddit-uniq is the SIMPLE-graph
    # stand-in (114.6M edges, all unique, like real Reddit) — prepare
    # merging cannot shrink its stored workload, so this is the honest
    # number for real-graph expectations (docs/PERF.md "stand-in
    # fidelity"; ROADMAP generator fidelity)
    Experiment(dataset="reddit-uniq", kind="spmm", sp_format="csr",
               dtype="float32", hidden=256, backend="hybrid", phases=True,
               hybrid_core_bytes=12 << 30, hybrid_dtype="int8",
               hybrid_shape="stair"),  # round 5: 81.6 ms verified
    Experiment(dataset="reddit-uniq", kind="spmm", sp_format="csr",
               dtype="float32", hidden=256, backend="hybrid", phases=True,
               hybrid_core_bytes=12 << 30, hybrid_dtype="int8"),
    Experiment(dataset="reddit-uniq", kind="spmm", sp_format="csr",
               dtype="float32", hidden=256, backend="hybrid", phases=True,
               hybrid_core_bytes=10 << 30, hybrid_dtype="int8"),
    # (2) 2-layer GCN Reddit FLT32 (with the per-layer activation check
    # the BASELINE validation clause requires) — round 4: 220.5 ms
    # end-to-end, validated (int8 core, multi-degree tail)
    Experiment(dataset="reddit", kind="inference", model="gcn",
               num_layers=2, dtype="float32", hidden=256, backend="hybrid",
               hybrid_core_bytes=12 << 30, hybrid_dtype="int8",
               hybrid_shape="stair",
               validate=True),  # round 5: 154.5 ms validated
    Experiment(dataset="reddit", kind="inference", model="gcn",
               num_layers=2, dtype="float32", hidden=256, backend="hybrid",
               hybrid_core_bytes=12 << 30, hybrid_dtype="int8",
               validate=True),
    Experiment(dataset="reddit", kind="inference", model="gcn",
               num_layers=2, dtype="float32", hidden=256, backend="hybrid",
               hybrid_core_bytes=12 << 30, hybrid_dtype="bfloat16",
               validate=True),
    # (3) GIN + SAGE on ogbn-arxiv, COO vs CSR, autotuned
    Experiment(dataset="ogbn-arxiv", kind="inference", model="gin",
               sp_format="coo", tune=True),
    Experiment(dataset="ogbn-arxiv", kind="inference", model="sage",
               sp_format="csr", tune=True),
    # (4) INT8-quantized GCN on ogbn-products — max-size NIBBLE-PACKED
    # int4 hub-core, no middle tier: the measured coverage curve
    # (docs/PERF.md round-2) shows 1 GiB of core streams in ~1.2 ms/mul
    # but removes ≥5 ms of issue-bound tail gather at EVERY k that fits
    # HBM, and beats BCSR tiles ~3× in coverage per byte; int4 packing
    # (0.5 B/cell, >99% of cells are small duplicate-merge counts)
    # doubles k² at the same budget — round 4: 1.888 s validated with the
    # multi-degree tail (round-3 single-table 2.2386 s; the int8 core at
    # the same 6 GiB was 2.52 s — E8, docs/PERF.md).
    # The budget coexists with products' device residency (2.45M-node
    # hidden activations ≈ 2.5 GB/layer f32 + tail tables).
    Experiment(dataset="ogbn-products", kind="inference", model="gcn",
               dtype="int8", backend="hybrid", hybrid_dtype="int4",
               hybrid_core_bytes=6 << 30, validate=True),
    # (5) ogbn-papers100M GCN edge-partitioned multi-host with ICI halo
    # exchange — rehearsal scale: an R-MAT with papers100M's density
    # (~14.5 edges/node) sized so one shard fits the virtual-mesh hosts;
    # the real dataset needs the multi-host fleet this environment lacks
    Experiment(dataset="rmat-1048576-15728640", kind="scaling",
               backend="ell", hidden=128, exchange="all_to_all", repeat=2),
    Experiment(dataset="rmat-1048576-15728640", kind="scaling",
               backend="ell", hidden=128, exchange="ring", repeat=2),
    # + the row-sharded hub-core on the halo layout (hybrid): per-device
    # budget buys a √nd-larger hub rank; core edges leave the exchange.
    # Budget kept small so the virtual-mesh (CPU) rehearsal stays cheap;
    # real-chip runs raise it to the HBM headroom.
    Experiment(dataset="rmat-1048576-15728640", kind="scaling",
               backend="hybrid", hybrid_core_bytes=8 << 20, hidden=128,
               exchange="ring", repeat=2),
    # the literal config-5 clause: FULL GCN inference over the
    # edge-partitioned mesh (model forward per device count, int32
    # quantized aggregation like the reference defaults)
    Experiment(dataset="rmat-1048576-15728640", kind="scaling",
               backend="ell", hidden=128, exchange="ring", repeat=2,
               scale_model=True, model="gcn", dtype="int32"),
]


def sweep_space(datasets: str = "small"):
    """A default sweep: datasets × backends × balance."""
    return (
        For("dataset", DATASETS[datasets])
        * For("backend", ["blocked", "ell"])
        * For("balance", ["nnz", "row"])
    )
