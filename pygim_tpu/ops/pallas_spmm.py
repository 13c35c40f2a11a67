"""Pallas SpMM kernel — the hand-written device-kernel layer (the analog of
the reference's DPU kernels, backend_pim/*/dpu_kernels/*.c).

Hardware facts measured on v5e that shape this design (CLAUDE.md):

* HBM is (8,128)-tile granular — a random single-row gather fetches a full
  4 KB tile, so XLA's ~10 ns/row dynamic gather is already at the
  hardware's random-access speed-of-light; single-row DMA from a tiled
  ref is rejected by Mosaic outright.
* ``fori_loop`` supports ``unroll=1`` only; big scalar-prefetch arrays
  must be blocked into SMEM; in-kernel ``take``/``take_along_axis`` over
  the sublane dim is not lowerable.

Consequently the profitable kernel regime is **x resident in VMEM**: the
per-edge inner loop reads rows from VMEM (no HBM latency), the analog of
the reference's hot loop (spmm_mul_csr_dpu.c:108-126) with WRAM→VMEM. The
kernel processes one nnz-balanced ELL block per grid step: scalar edge
streams (rowloc, colind in SMEM; vals in SMEM as float bits), a VMEM
accumulator, one store per finished block.

For graphs whose feature panel exceeds the VMEM budget the prepare path
refuses and callers fall back to the ``ell``/``blocked`` XLA formulations
(the autotuner's cost model never selects ``pallas`` there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# leave headroom for double buffering of edge blocks + accumulator
VMEM_X_BUDGET_BYTES = 8 * 1024 * 1024


def make_pallas_spmm_run(prep):
    """Build the run function for ``backend='pallas'`` on a PreparedSpmm.

    Validates the VMEM residency budget at prepare time.
    """
    rows_pad = prep.rows_pad
    interpret = prep.config.interpret
    ncols = prep.ncols

    def run(x, colind, vals, rowloc, row_slot):
        x_bytes = ncols * x.shape[1] * x.dtype.itemsize
        if x_bytes > VMEM_X_BUDGET_BYTES:
            raise ValueError(
                f"pallas backend requires the dense operand in VMEM "
                f"({x_bytes} B > {VMEM_X_BUDGET_BYTES} B); use the 'ell' "
                f"or 'blocked' backend for this size"
            )
        out_blocks = _pallas_spmm_jit(
            colind, vals, rowloc, x, rows_pad, interpret
        )
        flat = out_blocks.reshape(-1, x.shape[1])
        return jnp.take(flat, row_slot, axis=0)

    return run


@functools.partial(jax.jit, static_argnums=(4, 5))
def _pallas_spmm_jit(colind, vals, rowloc, x, rows_pad, interpret):
    nb, nnz_pad = colind.shape
    h = x.shape[1]
    acc_dtype = jnp.float32 if not jnp.issubdtype(
        x.dtype, jnp.integer
    ) else jnp.int32
    xw = x.astype(acc_dtype)
    vw = vals.astype(acc_dtype)

    def kernel(colind_ref, rowloc_ref, vals_ref, x_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(k, _):
            c = colind_ref[0, k]
            r = rowloc_ref[0, k]
            v = vals_ref[0, k]
            out_ref[0, r, :] = out_ref[0, r, :] + v * x_ref[c, :]
            return 0

        jax.lax.fori_loop(0, nnz_pad, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, rows_pad, h), acc_dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nnz_pad), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nnz_pad), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nnz_pad), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_pad, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(colind, rowloc, vw, xw)
