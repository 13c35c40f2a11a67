"""Pallas dequantizing hub-core matmul (int8 core × bf16 payload).

The hybrid backend's int8 core with a FLOAT payload needs the core
widened to bf16 for the MXU (`ops/spmm.py _core_matmul`). XLA *should*
fuse the ``astype`` into the dot's operand reads; if it instead
materializes the 2× bf16 copy in HBM, the 12.9 GB core pays ~64 GB of
traffic. This kernel makes the fusion explicit: stream int8 tiles
HBM→VMEM, widen in VMEM, feed the MXU — the weight-only-quantization
matmul pattern (pallas_guide.md "Quantization Kernels").

A/B MEASURED on the v5e (round 3, reddit-sim int8-12GiB core, f32
payload): XLA path 108.0 ms/iter, this kernel 114.1 ms/iter — XLA
already fuses the ``astype`` into the dot's operand reads (no bf16
materialization in HBM) and its schedule beats the fixed (1024, 256)
tiling here. The kernel stays, gated OFF by ``PYGIM_CORE_PALLAS=1``,
as the measured-basis record (docs/PERF.md round 3) and a template for
future hardware where the fusion question reopens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 1024  # output row tile (partial last block: OOB rows discarded)
_TK = 256   # contraction tile — must divide k exactly (zeros matter)


def _kernel(core_ref, x_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(
        core_ref[:].astype(jnp.bfloat16),
        x_ref[:],
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=())
def dequant_core_dot(core, x):
    # compiled on TPU; interpret-mode on CPU (tests/virtual mesh)
    interpret = jax.devices()[0].platform == "cpu"
    return _dequant_core_dot(core, x, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dequant_core_dot(core, x, interpret: bool = False):
    """``core.astype(bf16) @ x`` with the widen fused in VMEM.

    core: (k, k) int8. x: (k, h) bfloat16 (h a multiple of 128 is
    fastest; any h works). Returns (k, h) float32.
    """
    k = core.shape[0]
    if k % _TK:
        raise ValueError(f"k={k} must be a multiple of {_TK}")
    h = x.shape[1]
    grid = (-(-k // _TM), k // _TK)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, _TK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TK, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, h), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(core, x.astype(jnp.bfloat16))
