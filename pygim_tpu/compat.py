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


_DTYPE_ALIASES = {"flt32": "float32", "dbl64": "float64"}
_KNOWN_DTYPES = (
    "int8", "int16", "int32", "int64", "float32", "float64", "bfloat16"
)


def normalize_data_type(s: str) -> str:
    """Accept the reference's uppercase dtype tokens (INT32 / FLT32 /
    DBL64 — spmm_test.py:90) alongside the numpy-style names."""
    t = _DTYPE_ALIASES.get(s.lower(), s.lower())
    if t not in _KNOWN_DTYPES:
        raise ValueError(
            f"unknown data type {s!r}; accepted: {_KNOWN_DTYPES} "
            "(case-insensitive; FLT32/DBL64 aliases supported)"
        )
    return t


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
    cfg = config or SpmmConfig(
        format=sp_format, backend=backend, hidden_hint=hidden_size
    )
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
    cfg = config or SpmmConfig(
        format="csr", backend="ell", hidden_hint=hidden_size
    )
    return _prepare(adj, 1, sp_parts, cfg)


def prepare_pim_spmv(
    adj, hidden_size: int, sp_parts: int = 1,
    config: Optional[SpmmConfig] = None,
):
    """spmv.py:113 analog — every dense column an independent SpMV
    (SparseP). Degenerate ds = hidden config point; kept for API parity,
    not worth a separate kernel on TPU (SURVEY.md §2.3)."""
    cfg = config or SpmmConfig(
        format="coo", backend="ell", hidden_hint=hidden_size
    )
    ds = min(hidden_size, max(1, len(jax.devices()) // max(1, sp_parts)))
    return _prepare(adj, sp_parts, ds, cfg)


def prepare_for_version(
    version: str,
    adj,
    *,
    hidden_size: int = 256,
    sp_parts: int = 1,
    ds_parts: int = 1,
    sp_format: str = "csr",
    backend: str = "ell",
    config: Optional[SpmmConfig] = None,
    warn=print,
):
    """Route an entry-script ``--version`` flag to the matching prepared
    operand (the reference dispatched to backend_pim/{spmm,grande,spmv}.py
    by the same flag). Each version genuinely changes the distribution:

    * ``spmm``  — (sp_parts × ds_parts) rank grid.
    * ``grande``— sparse operand REPLICATED, features sharded over every
      requested rank: mesh (1, sp_parts·ds_parts).
    * ``spmv``  — per-column fleet: ds as close to hidden as devices allow.
    * ``cpu``   — the jnp oracle formulation.
    """
    if version == "cpu":
        return prepare_spmm(
            adj, SpmmConfig(backend="oracle", format=sp_format)
        )
    n = sp_parts * ds_parts
    if n > 1 and n > len(jax.devices()):
        warn(
            f"[WARN] sp×ds={n} exceeds {len(jax.devices())} devices; "
            "running single-chip"
        )
    if version == "grande":
        return prepare_pim_spmm_grande(
            adj, hidden_size, sp_parts=n, config=config
        )
    if version == "spmv":
        return prepare_pim_spmv(
            adj, hidden_size, sp_parts=sp_parts, config=config
        )
    return prepare_pim_spmm(
        adj, hidden_size, sp_parts=sp_parts, ds_parts=ds_parts,
        sp_format=sp_format, backend=backend, config=config,
    )


def dpu_init_ranks(nr_ranks: int = 1, groups_per_rank: int = 1) -> list:
    """Reference-parity shim for ``torch.ops.pim_ops.dpu_init_ranks``
    (spmm_default/pytorch_api.cpp:154-164): the JAX runtime owns the
    device pool, so allocation is a no-op. Returns the per-"rank" device
    count list the grande scripts consume (grande.py:63-72) — here every
    "rank" sees the whole mesh."""
    import jax

    return [len(jax.devices())] * max(1, int(nr_ranks))


def dpu_init_dpus(nr_dpus: "int | None" = None) -> list:
    """Shim for ``dpu_init_dpus`` — see :func:`dpu_init_ranks`."""
    return dpu_init_ranks(1)


def dpu_release() -> None:
    """Shim for ``dpu_release`` — nothing to free (HBM arrays are
    garbage-collected; the reference's explicit pool teardown,
    pytorch_api.cpp:154-164, has no analog)."""
    return None


def describe_layout(prep) -> str:
    """Human/ledger-readable distribution of a prepared operand."""
    mesh = getattr(prep, "mesh", None)
    if mesh is None:
        return "single-chip"
    shape = dict(mesh.shape)
    if "nodes" in shape:
        return f"halo nd={shape['nodes']}"
    return f"mesh sp={shape.get('sp', 1)} ds={shape.get('ds', 1)}"


__all__ = [
    "prepare_pim_spmm",
    "prepare_pim_spmm_grande",
    "prepare_pim_spmv",
    "prepare_for_version",
    "describe_layout",
    "dpu_init_ranks",
    "dpu_init_dpus",
    "dpu_release",
]
