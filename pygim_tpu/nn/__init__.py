"""GNN layers and models (pure-functional JAX).

Analog of the reference's ``models/`` (models.py, pyg_{gcn,gin,sage}_conv.py)
re-designed as parameter-pytree + pure-function pairs so the whole forward
jits, shards, and differentiates cleanly.
"""

from pygim_tpu.nn.layers import (  # noqa: F401
    batchnorm_apply,
    batchnorm_init,
    gcn_conv_apply,
    gcn_conv_init,
    gin_conv_apply,
    gin_conv_init,
    linear_apply,
    linear_init,
    quantized_aggregate,
    sage_conv_apply,
    sage_conv_init,
)
from pygim_tpu.nn.models import GNN, make_gnn  # noqa: F401
