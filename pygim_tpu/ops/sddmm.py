"""SDDMM: sampled dense-dense matmul — out[k] = <a[rows[k]], b[cols[k]]>.

The structural sibling of SpMM (BASELINE north-star op): where SpMM
gathers rows of one dense operand and segment-sums, SDDMM gathers rows of
two dense operands and reduces along the feature axis. Used for
attention-style edge scoring (e.g. GAT logits, graph transformers).

``blocked`` keeps memory bounded: edge chunks under ``lax.scan``, each
step two gathers + a fused rowwise dot.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pygim_tpu.core.graph import CooGraph
from pygim_tpu.core.partition import round_up
from pygim_tpu.ops.reference import accum_dtype


@dataclasses.dataclass(frozen=True)
class SddmmConfig:
    edge_chunk: int = 1 << 17


class PreparedSddmm:
    """Prepare-once/run-many over the edge list; ``run(a, b)`` returns the
    per-edge scores in the graph's canonical (row-sorted) edge order."""

    def __init__(self, graph: CooGraph, config: Optional[SddmmConfig] = None):
        config = config or SddmmConfig()
        s = graph.sort_by_row()
        self.nnz = graph.nnz
        chunk = min(config.edge_chunk, max(8, round_up(self.nnz, 8)))
        self.chunk = chunk
        pad = round_up(max(self.nnz, 1), chunk)
        rows = np.zeros(pad, dtype=np.int32)
        cols = np.zeros(pad, dtype=np.int32)
        rows[: self.nnz] = s.rows
        cols[: self.nnz] = s.cols
        self._rows = jnp.asarray(rows.reshape(-1, chunk))
        self._cols = jnp.asarray(cols.reshape(-1, chunk))
        self._run = self._build()

    def _build(self):
        nnz = self.nnz

        @jax.jit
        def run(a, b, rows, cols):
            acc = accum_dtype(jnp.result_type(a.dtype, b.dtype))

            def body(_, blk):
                r, c = blk
                ga = jnp.take(a, r, axis=0).astype(acc)
                gb = jnp.take(b, c, axis=0).astype(acc)
                return None, jnp.sum(ga * gb, axis=-1)

            _, out = jax.lax.scan(body, None, (rows, cols))
            return out.reshape(-1)[:nnz]

        return run

    def run(self, a, b):
        return self._run(a, b, self._rows, self._cols)


def prepare_sddmm(graph: CooGraph, config: Optional[SddmmConfig] = None):
    return PreparedSddmm(graph, config)
