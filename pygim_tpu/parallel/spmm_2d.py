"""2D sp×ds distributed SpMM under ``shard_map``.

The reference's 2D parallelization (SURVEY.md §2.3):

* ``sp_parts`` — A split by columns (= x rows); partial results summed.
  Reference merges per-rank staging buffers on the host with memadd_2D
  (spmm_mul_csr.c:497-506); here the merge is ``psum`` over the ``sp``
  mesh axis, on device, riding ICI.
* ``ds_parts`` — x and the output split by feature columns; no reduction
  (memcpy_2D concatenation, spmm_mul_csr.c:492-496 → pure ``ds`` sharding).

Each (sp, ds) shard runs the same nnz-balanced blocked product as the
single-chip backend (:func:`pygim_tpu.ops.spmm.blocked_spmm`) on its
A column-part × feature-slice tile. x is sharded 2D — rows over ``sp``,
features over ``ds`` — so the dense operand never exists replicated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pygim_tpu.core.graph import CsrGraph
from pygim_tpu.core.partition import (
    build_ell_blocks,
    make_row_block_plan,
    round_up,
    row_slot_table,
    with_padding,
)
from pygim_tpu.ops.spmm import SpmmConfig, blocked_spmm


class PreparedSpmm2D:
    """Prepare-once/run-many over a 2D mesh.

    Analog of ``spmm_csr_to_device_group`` + ``spmm_csr_run_group``
    (pytorch_api.cpp:204-280) with the group = the device mesh. The sparse
    tables are laid out (sp, n_blocks, nnz_pad) and sharded on ``sp``
    (replicated over ``ds``); x is sharded (rows→sp, features→ds).
    """

    def __init__(self, graph, mesh: Mesh, config: Optional[SpmmConfig] = None):
        config = config or SpmmConfig()
        self.mesh = mesh
        self.config = config
        sp = mesh.shape["sp"]
        self.sp, self.ds = sp, mesh.shape["ds"]

        csr = graph if isinstance(graph, CsrGraph) else graph.to_csr()
        self.nrows, self.ncols = csr.nrows, csr.ncols
        # pad A's column count so x rows shard equally over sp
        self.ncols_pad = round_up(csr.ncols, sp)
        padded = CsrGraph(
            rowptr=csr.rowptr, colind=csr.colind, vals=csr.vals,
            ncols=self.ncols_pad,
        )
        parts = padded.col_split(sp)

        # one static shape across all sp parts
        nb = config.resolve_n_blocks(max(1, csr.nnz // sp))
        plans = [
            make_row_block_plan(p, nb, balance=config.balance) for p in parts
        ]
        rows_pad = max(pl.rows_pad for pl in plans)
        nnz_pad = max(pl.nnz_pad for pl in plans)
        plans = [with_padding(pl, rows_pad, nnz_pad) for pl in plans]
        ells = [build_ell_blocks(p, pl) for p, pl in zip(parts, plans)]
        self.rows_pad, self.nnz_pad, self.n_blocks = rows_pad, nnz_pad, nb

        sharded = NamedSharding(mesh, P("sp"))
        self._dev = {
            "colind": jax.device_put(
                np.stack([e.colind for e in ells]), sharded
            ),
            "vals": jax.device_put(np.stack([e.vals for e in ells]), sharded),
            "rowloc": jax.device_put(
                np.stack([e.rowloc for e in ells]), sharded
            ),
            "row_slot": jax.device_put(
                np.stack([row_slot_table(pl) for pl in plans]), sharded
            ),
        }
        self._x_sharding = NamedSharding(mesh, P("sp", "ds"))
        self._run = self._build_run()

    def _build_run(self):
        mesh, rows_pad = self.mesh, self.rows_pad

        def local_fn(colind, vals, rowloc, row_slot, x_local):
            # leading sp dim arrives as size-1 block; squeeze it
            out = blocked_spmm(
                colind[0], vals[0], rowloc[0], row_slot[0], x_local, rows_pad
            )
            return jax.lax.psum(out, "sp")

        shard_fn = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P("sp"), P("sp"), P("sp"), P("sp"), P("sp", "ds")),
            out_specs=P(None, "ds"),
        )
        return jax.jit(shard_fn)

    def mul(self, x) -> jax.Array:
        """out = A @ x. Pads x to the sharded shape, runs, trims."""
        if x.shape[0] != self.ncols:
            raise ValueError(f"x rows {x.shape[0]} != A cols {self.ncols}")
        h = x.shape[1]
        h_pad = round_up(h, self.ds)
        xp = x
        if self.ncols_pad != self.ncols or h_pad != h:
            xp = jnp.zeros((self.ncols_pad, h_pad), dtype=x.dtype)
            xp = xp.at[: self.ncols, :h].set(x)
        xp = jax.device_put(xp, self._x_sharding)
        out = self._run(
            self._dev["colind"], self._dev["vals"], self._dev["rowloc"],
            self._dev["row_slot"], xp,
        )
        return out[:, :h] if h_pad != h else out


def prepare_spmm_2d(
    graph, mesh: Mesh, config: Optional[SpmmConfig] = None, **kw
) -> PreparedSpmm2D:
    """Entry point — the distributed analog of ``prepare_pim_spmm``."""
    if config is None:
        config = SpmmConfig(**kw)
    elif kw:
        config = dataclasses.replace(config, **kw)
    return PreparedSpmm2D(graph, mesh, config)
