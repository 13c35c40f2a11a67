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
    build_ell_rows,
    choose_ell_degree,
    round_up,
)
from pygim_tpu.ops.spmm import SpmmConfig, ell_scan_spmm


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

        # per-shard fixed-degree ELL tables (the ell backend's formulation,
        # the fastest gather-engine path measured — docs/PERF.md), with one
        # static shape across all sp parts: shared degree D and chunk,
        # virtual-row dim padded to the max over parts (pad rows have
        # val 0 / vrow 0 — harmless additions to row 0).
        degree = config.ell_degree or choose_ell_degree(
            csr.row_lengths, hidden=config.hidden_hint
        )
        chunk = max(8, round_up(
            max(1, config.block_nnz_budget // degree), 8
        ))
        ells = [build_ell_rows(p, degree, row_chunk=chunk) for p in parts]
        nvr_pad = max(e.cols.shape[0] for e in ells)
        nvr_pad = round_up(nvr_pad, chunk)

        def pad_part(a, fill=0):
            out = np.full((nvr_pad,) + a.shape[1:], fill, dtype=a.dtype)
            out[: a.shape[0]] = a
            return out

        self.ell_degree, self.row_chunk = degree, chunk
        self.n_virtual_pad = nvr_pad
        sharded = NamedSharding(mesh, P("sp"))
        self._dev = {
            "cols2d": jax.device_put(
                np.stack([pad_part(e.cols) for e in ells]), sharded
            ),
            "vals2d": jax.device_put(
                np.stack([pad_part(e.vals) for e in ells]), sharded
            ),
            "vrow_to_row": jax.device_put(
                np.stack([pad_part(e.vrow_to_row) for e in ells]), sharded
            ),
        }
        self._x_sharding = NamedSharding(mesh, P("sp", "ds"))
        self._run = self._build_run()

    def _build_run(self):
        mesh = self.mesh
        chunk, degree, nrows = self.row_chunk, self.ell_degree, self.nrows

        def local_fn(cols2d, vals2d, vrow_to_row, x_local):
            # leading sp dim arrives as size-1 block; squeeze it
            out = ell_scan_spmm(
                x_local, cols2d[0], vals2d[0], vrow_to_row[0],
                chunk, degree, nrows,
            )
            return jax.lax.psum(out, "sp")

        shard_fn = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P("sp"), P("sp"), P("sp"), P("sp", "ds")),
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
            self._dev["cols2d"], self._dev["vals2d"],
            self._dev["vrow_to_row"], xp,
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
