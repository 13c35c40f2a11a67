#!/usr/bin/env python3
"""Quickstart: load a graph, prepare the sparse operand once, run GNN
inference and training. Runs on CPU or TPU unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pygim_tpu.core.transforms import gcn_norm, to_undirected
from pygim_tpu.data import load_dataset
from pygim_tpu.nn.models import make_gnn
from pygim_tpu.nn.train import make_train_step
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

# 1. data (synthetic stand-in when PyG/OGB data is unavailable)
ds = load_dataset("tiny")
adj = gcn_norm(to_undirected(ds.graph))        # Â = D^-1/2 (A+I) D^-1/2

# 2. prepare once — the autotuner can pick the backend per graph:
#    from pygim_tpu.tune import autotune; cfg = autotune(adj, 64).config
prep = prepare_spmm(adj, SpmmConfig(backend="ell"))

# 3. inference with int8-quantized aggregation
model = make_gnn(
    jax.random.key(0), "gcn", ds.x.shape[1], 64, ds.num_classes,
    agg_dtype="int8",
)
x = jnp.asarray(ds.x)
logits = model.apply(x, prep.mul)
print("logits:", logits.shape)

# 4. a few training steps
opt = optax.adam(1e-3)
step = jax.jit(make_train_step(model, prep.mul, opt))
params, opt_state = model.params, opt.init(model.params)
labels = jnp.asarray(ds.y.astype(np.int32))
mask = jnp.asarray(ds.train_mask.astype(np.float32))
for epoch in range(3):
    params, opt_state, loss = step(
        params, opt_state, x, labels, mask, jax.random.key(epoch)
    )
    print(f"epoch {epoch}: loss {float(loss):.3f}")
