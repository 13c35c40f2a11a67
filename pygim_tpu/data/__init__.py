"""Dataset loading: real graph datasets when available, spec-matched
synthetic stand-ins otherwise (this environment has no network egress and
no PyG/OGB), plus MatrixMarket support for the SuiteSparse sets the
reference harness uses (utils/configs.py:7-14)."""

from pygim_tpu.data.datasets import (  # noqa: F401
    DATASET_SPECS,
    GraphDataset,
    cluster_partition,
    load_dataset,
    load_mtx,
    rmat_edges,
)
