"""Sparse ops: reference (oracle) SpMM/SDDMM and TPU backends.

Analog of the reference's kernel + adapter layers: the ``jnp`` reference
here plays the role of ``spmm_host_csr``/``spmm_host_coo``
(backend_pim/spmm_default/spmm_mul_csr.c:100-113, ops.hpp:42-62) — the
correctness oracle every fast path is checked against.
"""

from pygim_tpu.ops.reference import spmm_coo_oracle, spmm_csr_oracle  # noqa: F401
from pygim_tpu.ops.spmm import PreparedSpmm, prepare_spmm  # noqa: F401
