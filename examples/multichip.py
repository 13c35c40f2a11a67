#!/usr/bin/env python3
"""Multi-chip quickstart: the same prepared-SpMM contract over a device
mesh. Run with real chips, or rehearse on one host:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py      # (CPU forced in-code below)

Three layouts (docs/SCALING.md):
* 2D sp×ds rank grid  — A column-split over ``sp`` (psum merge), features
  over ``ds``; PyGim's rank grid with the host memadd replaced by ICI.
* halo                — 1-D edge partition with exact per-pair feature
  exchange; the BASELINE config-5 (papers100M-scale) layout.
* either + hybrid     — the dense hub-core rides the mesh too (column-
  sharded on 2D, row-sharded slabs on halo).
"""

import numpy as np

import jax

if jax.default_backend() == "cpu" or not jax.devices():
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pygim_tpu.data import load_dataset
from pygim_tpu.nn.models import make_gnn
from pygim_tpu.ops.spmm import PreparedAggregate, SpmmConfig
from pygim_tpu.parallel import make_mesh, prepare_spmm_2d
from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo
from pygim_tpu.tune import autotune, prepare_tuned

nd = len(jax.devices())
print(f"devices: {nd} × {jax.devices()[0].platform}")
ds = load_dataset("tiny")
x = jnp.asarray(ds.x)

# --- layout 1: 2D sp×ds grid with the hybrid core + tile tier ---------
sp = max(1, nd // 2)
mesh = make_mesh(sp, min(2, nd))
prep2d = prepare_spmm_2d(
    ds.graph, mesh,
    SpmmConfig(backend="hybrid", hybrid_k=64, bcsr_bytes=4 << 20,
               bcsr_tile=8, bcsr_min_edges=2),
)
out = prep2d.mul(x)
print(f"2d sp={sp}: out {out.shape}, tile tier: {prep2d.has_bcsr}")

# --- layout 2: halo exchange with the row-sharded hub-core ------------
halo = prepare_spmm_halo(
    ds.graph, make_node_mesh(nd),
    SpmmConfig(backend="hybrid", hybrid_k=64),
    exchange="ring", order="lp",   # locality-clustered partition
)
out = halo.mul(x)
print(f"halo nd={nd}: out {out.shape}, hub core k={halo.hybrid_k_eff}")

# --- a whole model forward compiles to ONE program --------------------
gnn = make_gnn(jax.random.key(0), "gcn", ds.x.shape[1], 32,
               ds.num_classes, agg_dtype="int8")
dev = halo.dev_arrays
fwd = jax.jit(lambda x, dev: gnn.apply(x, PreparedAggregate(halo, dev)))
logits = fwd(x, dev)
print(f"GCN over the halo mesh: logits {logits.shape}")

# --- or let the autotuner pick (config × distribution) ----------------
res = autotune(ds.graph, hidden=32, n_devices=nd)
print(f"tuned: {res.plan.describe()} backend={res.config.backend} "
      f"({res.predicted_s * 1e3:.2f} ms/mul predicted)")
prep = prepare_tuned(ds.graph, res)
print(f"tuned mul: {np.asarray(prep.mul(x)).shape}")
