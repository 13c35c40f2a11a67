"""pygim_tpu — a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CMU-SAFARI/PyGim
(SIGMETRICS'25): sparse neighborhood aggregation (SpMM over CSR/COO) as the
memory-intensive half of GNN layers, fused with the compute-intensive dense
transforms under XLA; quantized aggregation; 2D sp×ds tiling expressed as a
device mesh with on-device reduction; nnz-balanced partition planning; a
per-graph autotuner; and an experiment harness speaking PyGim's ``[DATA]``
metric protocol.

Layer map (TPU-native analog of reference SURVEY.md §1):

=========  =============================  =====================================
Layer      Module                         Reference analog
=========  =============================  =====================================
harness    ``pygim_tpu.bench``            utils/experiment.py, utils/helpers.py
tuner      ``pygim_tpu.tune``             utils/autotuner.py, utils/space.py
models     ``pygim_tpu.nn``               models/*.py
quant      ``pygim_tpu.quant``            models/quantize.py
adapters   ``pygim_tpu.ops``              backend_pim/{spmm,grande,spmv}.py
runtime    ``pygim_tpu.parallel``         backend_pim/*/spmm_mul_*.c (host C)
kernels    ``pygim_tpu.ops`` scan/MXU formulations  backend_pim/*/dpu_kernels/*.c
planner    ``pygim_tpu.core``             backend_pim/*/support/partition.c
data       ``pygim_tpu.data``             inference.py:44-91 dataset loading
=========  =============================  =====================================
"""

__version__ = "0.1.0"

from pygim_tpu.core.graph import CooGraph, CsrGraph  # noqa: F401
