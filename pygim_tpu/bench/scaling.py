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
) -> dict:
    rep = reporter or DataReporter()
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    # a forced-CPU "mesh" is N virtual devices sharing one host's cores:
    # it validates the sharded programs but CANNOT show real speedup —
    # mark the ledger entry so efficiency numbers are read accordingly
    rep.report("virtual_mesh", jax.devices()[0].platform == "cpu")
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((ds.graph.nrows, hidden)), dtype=jnp.float32
    )
    graph = ds.graph
    base_eps = None
    for n in device_counts:
        if n == 1:
            prep = prepare_spmm(graph, config or SpmmConfig(backend="ell"))
        else:
            prep = prepare_spmm_halo(
                graph, make_node_mesh(n), config, exchange=exchange
            )
        dt = device_time(prep.mul, x, iters=repeat)
        eps = graph.nnz / dt
        rep.report(f"edges_per_s_n{n}", eps)
        if n == 1:
            base_eps = eps
        elif base_eps:
            rep.report(f"scaling_efficiency_n{n}", eps / (n * base_eps))
    return rep.means()
