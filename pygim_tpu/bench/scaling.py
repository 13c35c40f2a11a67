"""Scaling-efficiency benchmark: edges/s at 1 device vs N devices.

The BASELINE.md target: ≥80% edges/s scaling efficiency from 1 chip →
1 host → N hosts. ``run_scaling_benchmark`` measures the halo-exchange
SpMM at each device count and reports
``scaling_efficiency(N) = edges_per_s(N) / (N · edges_per_s(1))``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pygim_tpu.data import GraphDataset
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm
from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo
from pygim_tpu.utils.metrics import DataReporter
from pygim_tpu.utils.timers import device_time


def run_scaling_benchmark(
    ds: GraphDataset,
    device_counts: Optional[Sequence[int]] = None,
    *,
    hidden: int = 256,
    exchange: str = "all_to_all",
    config: Optional[SpmmConfig] = None,
    repeat: int = 3,
    reporter: Optional[DataReporter] = None,
    model: Optional[str] = None,
    num_layers: int = 2,
    agg_dtype: Optional[str] = None,
    order: Optional[str] = None,
) -> dict:
    """``model=None`` times the raw SpMM at each device count (the
    per-multiply scaling curve); ``model="gcn"|"sage"|"gin"`` times the
    FULL inference forward instead — the literal BASELINE config 5
    clause ("ogbn-papers100M GCN edge-partitioned multi-host"), with the
    per-count prep's tables threaded through one jitted program."""
    rep = reporter or DataReporter()
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    # a forced-CPU "mesh" is N virtual devices sharing one host's cores:
    # it validates the sharded programs but CANNOT show real speedup —
    # mark the ledger entry so efficiency numbers are read accordingly
    rep.report("virtual_mesh", jax.devices()[0].platform == "cpu")
    rng = np.random.default_rng(0)
    graph = ds.graph
    if model is None:
        x = jnp.asarray(
            rng.standard_normal((graph.nrows, hidden)), dtype=jnp.float32
        )
    else:
        x = jnp.asarray(ds.x, dtype=jnp.float32)
    base_eps = None
    for n in device_counts:
        if n == 1:
            prep = prepare_spmm(graph, config or SpmmConfig(backend="ell"))
        else:
            prep = prepare_spmm_halo(
                graph, make_node_mesh(n), config, exchange=exchange,
                order=order,
            )
            # exchange volume: the partition's cut (unique remote rows,
            # pre-padding) and the padded per-device halo buffer — what
            # a locality/metis order shrinks (core/cluster.py)
            rep.report(f"halo_request_rows_n{n}", prep.request_rows)
            rep.report(f"halo_buffer_rows_n{n}", prep.halo_k)
        if model is None:
            dt = device_time(prep.mul, x, iters=repeat)
            eps = graph.nnz / dt
        else:
            from pygim_tpu.nn.models import make_gnn
            from pygim_tpu.ops.spmm import PreparedAggregate

            gnn = make_gnn(
                jax.random.key(0), model, ds.x.shape[1], hidden,
                ds.num_classes, num_layers=num_layers,
                agg_dtype=agg_dtype,
            )
            dev = prep.dev_arrays
            fwd_j = jax.jit(
                lambda x, dev, prep=prep, gnn=gnn: gnn.apply(
                    x, PreparedAggregate(prep, dev)
                )
            )
            dt = device_time(lambda a: fwd_j(a, dev), x, iters=repeat)
            eps = graph.nnz * num_layers / dt
        rep.report(f"edges_per_s_n{n}", eps)
        if n == 1:
            base_eps = eps
        elif base_eps:
            rep.report(f"scaling_efficiency_n{n}", eps / (n * base_eps))
        # rehearsal hygiene: at papers100M-density scale each count's
        # tables are multi-GB of host "device" buffers — free them (and
        # every jit/program cache that pins them) before the next count
        # (same lesson as run_experiments' OOM hygiene, round 3)
        del prep
        import gc

        gc.collect()
        jax.clear_caches()
    return rep.means()
