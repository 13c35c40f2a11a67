"""Reference-compatible API surface.

Users of the reference import ``prepare_pim_spmm`` / ``prepare_pim_spmm_grande``
/ ``prepare_pim_spmv`` (backend_pim/spmm.py:143, grande.py:124, spmv.py:113)
and get back an object whose ``.mul(x)`` multiplies against the prepared
sparse operand. These wrappers give the same names and call shapes on top
of the TPU backends, mapping each reference backend to its mesh/config
analog (SURVEY.md §2.3):

* spmm  → single-chip blocked/ell, or an (sp × ds) mesh when available.
* grande → replicate-sparse/shard-features: mesh (1, ds_parts).
* spmv  → per-column SpMV fleet: the degenerate ds = hidden config.
"""

from __future__ import annotations

from typing import Optional

import jax

from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm


def _mesh_or_none(sp_parts: int, ds_parts: int):
    n = sp_parts * ds_parts
    if n <= 1 or n > len(jax.devices()):
        return None
    from pygim_tpu.parallel import make_mesh

    return make_mesh(sp_parts, ds_parts)


def _prepare(graph, sp_parts, ds_parts, config):
    mesh = _mesh_or_none(sp_parts, ds_parts)
    if mesh is None:
        return prepare_spmm(graph, config)
    from pygim_tpu.parallel import prepare_spmm_2d

    return prepare_spmm_2d(graph, mesh, config)


def prepare_pim_spmm(
    adj, hidden_size: int = 256, sp_parts: int = 1, ds_parts: int = 1,
    sp_format: str = "csr", backend: str = "ell",
    config: Optional[SpmmConfig] = None,
):
    """backend_pim/spmm.py:143 analog. ``adj``: CooGraph/CsrGraph."""
    cfg = config or SpmmConfig(format=sp_format, backend=backend)
    return _prepare(adj, sp_parts, ds_parts, cfg)


def prepare_pim_spmm_grande(
    adj, hidden_size: int = 256, sp_parts: int = 2,
    config: Optional[SpmmConfig] = None,
):
    """grande.py:124 analog — replicate the sparse operand, shard the dense
    columns. On TPU: a (1, sp_parts)-shaped mesh (the graph is replicated
    across the feature shards; there is nothing to re-copy per run since
    the operand lives in HBM — the reference's per-run sparse reload is an
    explicit non-goal, SURVEY.md §7)."""
    cfg = config or SpmmConfig(format="csr", backend="ell")
    return _prepare(adj, 1, sp_parts, cfg)


def prepare_pim_spmv(
    adj, hidden_size: int, sp_parts: int = 1,
    config: Optional[SpmmConfig] = None,
):
    """spmv.py:113 analog — every dense column an independent SpMV
    (SparseP). Degenerate ds = hidden config point; kept for API parity,
    not worth a separate kernel on TPU (SURVEY.md §2.3)."""
    cfg = config or SpmmConfig(format="coo", backend="ell")
    ds = min(hidden_size, max(1, len(jax.devices()) // max(1, sp_parts)))
    return _prepare(adj, sp_parts, ds, cfg)


__all__ = [
    "prepare_pim_spmm",
    "prepare_pim_spmm_grande",
    "prepare_pim_spmv",
]
