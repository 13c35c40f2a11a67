"""Core graph containers and partition planning (host-side, NumPy).

TPU-native analog of the reference's ``support/matrix.h`` structs and
``support/partition.c`` planners (SURVEY.md §2.2): instead of realloc'ing
padded per-DPU arrays, we emit *static block tables* that give every Pallas
grid step an identical, padded shape — which is exactly what XLA requires.
"""

from pygim_tpu.core.graph import CooGraph, CsrGraph, coo_to_csr  # noqa: F401
from pygim_tpu.core.partition import (  # noqa: F401
    RowBlockPlan,
    plan_row_blocks,
    split_columns,
    split_features,
)
