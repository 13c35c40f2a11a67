"""GCN / SAGE / GIN models — the shared skeleton of models/models.py.

All three reference models are: ``Linear(in,hidden)`` → ``BatchNorm`` →
ReLU → dropout(0.5), then ``num_layers`` × (conv → BN → ReLU → dropout),
then ``Linear(hidden,out)`` (models/models.py:39-50, 79-90, 120-131). We
express that once, parameterized by the conv type.

The aggregate callable abstracts the sparse backend exactly like the
reference's ``adj_t`` duck-typing (plain SparseTensor vs PIM tensor,
pyg_gcn_conv.py:132-136): pass any ``x -> A@x`` — the oracle, a
PreparedSpmm.mul, or a sharded 2D mesh product.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from pygim_tpu.nn import layers as L


@dataclasses.dataclass(frozen=True)
class GNN:
    """Model = static config + parameter pytree. ``apply`` is pure."""

    conv: str                 # gcn | sage | gin
    num_layers: int
    dropout: float
    agg_dtype: Optional[str]  # aggregation dtype (None = no quantization)
    params: dict

    def apply(self, x, aggregate, *, training=False, rng=None):
        return gnn_apply(
            self.params, x, aggregate, conv=self.conv,
            num_layers=self.num_layers, dropout_rate=self.dropout,
            agg_dtype=self.agg_dtype, training=training, rng=rng,
        )


def make_gnn(
    key,
    conv: str,
    in_channels: int,
    hidden_channels: int,
    out_channels: int,
    num_layers: int = 2,
    dropout: float = 0.5,
    agg_dtype: Optional[str] = None,
) -> GNN:
    keys = jax.random.split(key, num_layers + 2)
    params = {
        "ln1": L.linear_init(keys[0], in_channels, hidden_channels),
        "bn0": L.batchnorm_init(hidden_channels),
        "ln2": L.linear_init(keys[1], hidden_channels, out_channels),
        "convs": [],
        "bns": [],
    }
    for i in range(num_layers):
        k = keys[2 + i]
        if conv == "gcn":
            params["convs"].append(
                L.gcn_conv_init(k, hidden_channels, hidden_channels)
            )
        elif conv == "sage":
            params["convs"].append(
                L.sage_conv_init(k, hidden_channels, hidden_channels)
            )
        elif conv == "gin":
            params["convs"].append(L.gin_conv_init(k, hidden_channels))
        else:
            raise ValueError(f"unknown conv {conv!r}")
        params["bns"].append(L.batchnorm_init(hidden_channels))
    return GNN(
        conv=conv, num_layers=num_layers, dropout=dropout,
        agg_dtype=agg_dtype, params=params,
    )


_CONV_APPLY = {
    "gcn": L.gcn_conv_apply,
    "sage": L.sage_conv_apply,
    "gin": L.gin_conv_apply,
}


def gnn_apply(
    params, x, aggregate, *, conv: str, num_layers: int,
    dropout_rate: float, agg_dtype, training: bool = False, rng=None,
    return_bn_stats: bool = False,
):
    """Forward pass. Under training, BatchNorm uses batch statistics; with
    ``return_bn_stats=True`` the updated running stats are returned as a
    second output ``{"bn0": .., "bns": [..]}`` for the caller to merge."""
    conv_apply = _CONV_APPLY[conv]
    n_drops = num_layers + 1
    if training:
        if rng is None:
            raise ValueError("training=True requires rng")
        drop_keys = list(jax.random.split(rng, n_drops))
    else:
        drop_keys = [None] * n_drops

    def bn(p, h):
        if training:
            y, stats = L.batchnorm_train_apply(p, h)
            return y, jax.lax.stop_gradient(stats)
        return L.batchnorm_apply(p, h), None

    bn_stats = {"bns": []}
    x = L.linear_apply(params["ln1"], x)
    x, bn_stats["bn0"] = bn(params["bn0"], x)
    x = jax.nn.relu(x)
    x = L.dropout(drop_keys[0], x, dropout_rate, training)
    for i in range(num_layers):
        x = conv_apply(params["convs"][i], x, aggregate, agg_dtype=agg_dtype)
        x, s = bn(params["bns"][i], x)
        bn_stats["bns"].append(s)
        x = jax.nn.relu(x)
        x = L.dropout(drop_keys[1 + i], x, dropout_rate, training)
    out = L.linear_apply(params["ln2"], x)
    if return_bn_stats:
        return out, bn_stats
    return out


def merge_bn_stats(params, bn_stats):
    """Merge running-stat updates from :func:`gnn_apply` back into the
    parameter pytree (pure: returns a new pytree)."""
    import copy

    new = copy.copy(params)
    if bn_stats.get("bn0") is not None:
        new["bn0"] = {**params["bn0"], **bn_stats["bn0"]}
    new["bns"] = [
        {**p, **(s or {})} for p, s in zip(params["bns"], bn_stats["bns"])
    ]
    return new
