"""GNN conv layers as parameter pytrees + pure apply functions.

Semantics track the reference's forked PyG layers:

* GCNConv forward = ``lin(x)`` → quantized aggregate → ``+bias``
  (models/pyg_gcn_conv.py:116-125; note: like the reference, no self-loops
  or degree normalization are applied despite the layer's name).
* GINConv forward = aggregate → ``+ (1+eps)·x`` → ``mlp``
  (models/pyg_gin_conv.py:74-88).
* SAGEConv forward = aggregate → ``lin_l`` → ``+ lin_r(x)`` → optional L2
  normalize (models/pyg_sage_conv.py:122-142); ``aggr='add'`` as in the
  reference (pyg_sage_conv.py:72).

All three share the quantize → ``adj.mul`` → dequantize aggregate hook
(pyg_gcn_conv.py:130-137), here :func:`quantized_aggregate`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pygim_tpu.quant import (
    _SCALE_EXP,
    symmetric_dequantize,
    symmetric_quantize,
)

Aggregate = Callable[[jnp.ndarray], jnp.ndarray]  # x -> A @ x


# ---------------------------------------------------------------- primitives

def glorot(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def linear_init(key, din: int, dout: int, bias: bool = True):
    p = {"w": glorot(key, (din, dout))}
    if bias:
        p["b"] = jnp.zeros((dout,))
    return p


def linear_apply(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def batchnorm_init(d: int):
    return {
        "scale": jnp.ones((d,)),
        "bias": jnp.zeros((d,)),
        "mean": jnp.zeros((d,)),
        "var": jnp.ones((d,)),
    }


def batchnorm_apply(p, x, eps: float = 1e-5):
    """Inference-mode BatchNorm1d using running stats (the reference runs
    untrained models under no_grad, inference.py:21-24)."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def batchnorm_train_apply(p, x, eps: float = 1e-5, momentum: float = 0.1):
    """Training-mode BatchNorm: batch stats for the forward value, and the
    updated running stats returned alongside (caller merges them back into
    the parameter pytree — pure-functional torch BatchNorm1d semantics)."""
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * p["scale"] + p["bias"]
    n = x.shape[0]
    unbiased = var * (n / max(1, n - 1))
    new_stats = {
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return y, new_stats


def dropout(key, x, rate: float, training: bool):
    if not training or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ----------------------------------------------------------- aggregate hook

def quantized_aggregate(aggregate: Aggregate, x, agg_dtype=None):
    """quantize → A·x → dequantize (pyg_gcn_conv.py:130-137).

    ``agg_dtype`` plays the role of ``adj_t.dtype`` in the reference: the
    aggregation runs in this dtype (int8/int16/int32 quantized, bfloat16
    cast, or None = run in x's own dtype). ``scale_edge`` is fixed at 1.0
    as in all three reference conv layers.

    When the aggregate exposes the fused hook
    (:class:`pygim_tpu.ops.spmm.PreparedAggregate`), the quantize
    round-trip folds into the scan body — bit-identical, no (N, H)
    quantized copy of x materialized."""
    if agg_dtype is not None:
        name = jnp.dtype(agg_dtype).name
        fused = getattr(aggregate, "quantized", None)
        if fused is not None and name in _SCALE_EXP:
            out = fused(x, name)
            if out is not None:
                return out.astype(x.dtype)
    scale, x_q = symmetric_quantize(x, agg_dtype)
    out_q = aggregate(x_q)
    out = symmetric_dequantize(out_q, 1.0, scale)
    return out.astype(x.dtype)


# ------------------------------------------------------------------- layers

def gcn_conv_init(key, din: int, dout: int, bias: bool = True):
    k1, _ = jax.random.split(key)
    p = {"lin": linear_init(k1, din, dout, bias=False)}
    if bias:
        p["bias"] = jnp.zeros((dout,))
    return p


def gcn_conv_apply(p, x, aggregate: Aggregate, agg_dtype=None):
    x = linear_apply(p["lin"], x)
    out = quantized_aggregate(aggregate, x, agg_dtype)
    if "bias" in p:
        out = out + p["bias"]
    return out


def gin_conv_init(key, d: int, eps: float = 0.0):
    """GIN with the reference's MLP([d, d, d]) — Linear → BN → ReLU →
    Linear (models/models.py:105, torch_geometric MLP default)."""
    k1, k2 = jax.random.split(key)
    return {
        "eps": jnp.asarray(eps, dtype=jnp.float32),
        "mlp": {
            "lin1": linear_init(k1, d, d),
            "bn": batchnorm_init(d),
            "lin2": linear_init(k2, d, d),
        },
    }


def gin_conv_apply(p, x, aggregate: Aggregate, agg_dtype=None):
    out = quantized_aggregate(aggregate, x, agg_dtype)
    out = out + (1.0 + p["eps"]) * x
    m = p["mlp"]
    h = jax.nn.relu(batchnorm_apply(m["bn"], linear_apply(m["lin1"], out)))
    return linear_apply(m["lin2"], h)


def sage_conv_init(key, din: int, dout: int, root_weight: bool = True):
    k1, k2 = jax.random.split(key)
    p = {"lin_l": linear_init(k1, din, dout)}
    if root_weight:
        p["lin_r"] = linear_init(k2, din, dout, bias=False)
    return p


def sage_conv_apply(
    p, x, aggregate: Aggregate, agg_dtype=None, normalize: bool = False
):
    out = quantized_aggregate(aggregate, x, agg_dtype)
    out = linear_apply(p["lin_l"], out)
    if "lin_r" in p:
        out = out + linear_apply(p["lin_r"], x)
    if normalize:
        out = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
        )
    return out
