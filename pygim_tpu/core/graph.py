"""Host-side sparse graph containers (NumPy).

Equivalent in role to the reference's ``COOMatrix`` / ``CSRMatrix``
(backend_pim/spmm_default/support/matrix.h:10-33) and the Python wrapper
``SparseTensorCOO`` (backend_pim/spmm.py:15-136), redesigned for a JAX
pipeline: containers are immutable NumPy views; all padding/partitioning is
done by the planner (:mod:`pygim_tpu.core.partition`) which emits static
block tables instead of realloc'd per-DPU buffers.

Values default to ones when absent — matching ``build_coo``/``build_csr``
(backend_pim/spmm.py:31-55).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

# Supported aggregation value dtypes. The reference supports
# INT8/INT16/INT32/INT64/FLT32/DBL64 via -D flags (support/common.h:38-60);
# on TPU these are runtime dtypes. float64 is kept for host-side reference
# math but demoted to float32 on device; bfloat16 added as the TPU-native
# reduced-precision type.
VAL_DTYPES = {
    "int8": np.int8,
    "int16": np.int16,
    "int32": np.int32,
    "int64": np.int64,
    "float32": np.float32,
    "float64": np.float64,
    "bfloat16": np.float32,  # host container keeps f32; device casts to bf16
}

INDEX_DTYPE = np.int32


def _as_index(a) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype != INDEX_DTYPE:
        a = a.astype(INDEX_DTYPE)
    return np.ascontiguousarray(a)


@dataclasses.dataclass(frozen=True)
class CooGraph:
    """COO sparse matrix A of shape (nrows, ncols) with ``nnz`` entries.

    ``rows``/``cols`` are int32; ``vals`` is any dtype in :data:`VAL_DTYPES`
    (defaults to ones). Entries need not be sorted; :meth:`sort_by_row`
    canonicalizes (row-major, col-minor) which is what planners assume.
    """

    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    nrows: int
    ncols: int

    @property
    def nnz(self) -> int:
        return int(self.rows.shape[0])

    @classmethod
    def from_edges(
        cls,
        rows: Sequence[int],
        cols: Sequence[int],
        vals: Optional[Sequence[float]] = None,
        *,
        nrows: Optional[int] = None,
        ncols: Optional[int] = None,
        dtype: str = "float32",
    ) -> "CooGraph":
        rows = _as_index(rows)
        cols = _as_index(cols)
        if rows.shape != cols.shape or rows.ndim != 1:
            raise ValueError("rows/cols must be equal-length 1-D arrays")
        np_dtype = VAL_DTYPES[dtype]
        if vals is None:
            # values-default-ones: backend_pim/spmm.py:36-38,50-52
            vals = np.ones(rows.shape[0], dtype=np_dtype)
        else:
            vals = np.ascontiguousarray(np.asarray(vals), dtype=np_dtype)
        if nrows is None:
            nrows = int(rows.max()) + 1 if rows.size else 0
        if ncols is None:
            ncols = int(cols.max()) + 1 if cols.size else 0
        return cls(rows=rows, cols=cols, vals=vals, nrows=int(nrows), ncols=int(ncols))

    @classmethod
    def from_scipy(cls, mat, dtype: str = "float32") -> "CooGraph":
        coo = mat.tocoo()
        return cls.from_edges(
            coo.row, coo.col, coo.data, nrows=coo.shape[0], ncols=coo.shape[1],
            dtype=dtype,
        )

    def sort_by_row(self) -> "CooGraph":
        """Canonical (row, col) lexicographic order — stable."""
        order = np.lexsort((self.cols, self.rows))
        return CooGraph(
            rows=self.rows[order], cols=self.cols[order], vals=self.vals[order],
            nrows=self.nrows, ncols=self.ncols,
        )

    def to_csr(self) -> "CsrGraph":
        return coo_to_csr(self)

    def col_split(self, nparts: int) -> list["CooGraph"]:
        """Slice A into ``nparts`` contiguous column ranges (the ``sp_parts``
        split of backend_pim/spmm.py:128-136). Part i owns columns
        ``[i*w, (i+1)*w)`` with the remainder absorbed by the last part.
        Column indices are rebased to each part's local range."""
        if nparts <= 0:
            raise ValueError("nparts must be positive")
        bounds = column_split_bounds(self.ncols, nparts)
        parts = []
        for lo, hi in bounds:
            mask = (self.cols >= lo) & (self.cols < hi)
            parts.append(
                CooGraph(
                    rows=self.rows[mask],
                    cols=self.cols[mask] - lo,
                    vals=self.vals[mask],
                    nrows=self.nrows,
                    ncols=hi - lo,
                )
            )
        return parts

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.nrows, self.ncols), dtype=np.float64)
        np.add.at(out, (self.rows, self.cols), self.vals.astype(np.float64))
        return out.astype(self.vals.dtype if self.vals.dtype != np.int8 else np.int32)


@dataclasses.dataclass(frozen=True)
class CsrGraph:
    """CSR sparse matrix: ``rowptr`` (nrows+1), ``colind``/``vals`` (nnz)."""

    rowptr: np.ndarray
    colind: np.ndarray
    vals: np.ndarray
    ncols: int

    @property
    def nrows(self) -> int:
        return int(self.rowptr.shape[0]) - 1

    @property
    def nnz(self) -> int:
        return int(self.colind.shape[0])

    @property
    def row_lengths(self) -> np.ndarray:
        return np.diff(self.rowptr)

    @classmethod
    def from_scipy(cls, mat, dtype: str = "float32") -> "CsrGraph":
        csr = mat.tocsr()
        return cls(
            rowptr=_as_index(csr.indptr),
            colind=_as_index(csr.indices),
            vals=np.ascontiguousarray(csr.data, dtype=VAL_DTYPES[dtype]),
            ncols=int(mat.shape[1]),
        )

    def to_coo(self) -> CooGraph:
        rows = np.repeat(
            np.arange(self.nrows, dtype=INDEX_DTYPE), self.row_lengths
        )
        return CooGraph(
            rows=rows, cols=self.colind.copy(), vals=self.vals.copy(),
            nrows=self.nrows, ncols=self.ncols,
        )

    def col_split(self, nparts: int) -> list["CsrGraph"]:
        """Column split, CSR-native (no COO round trip)."""
        bounds = column_split_bounds(self.ncols, nparts)
        parts = []
        for lo, hi in bounds:
            mask = (self.colind >= lo) & (self.colind < hi)
            # per-row counts of surviving nnz -> new rowptr
            rows = np.repeat(np.arange(self.nrows, dtype=np.int64), self.row_lengths)
            keep_rows = rows[mask]
            counts = np.bincount(keep_rows, minlength=self.nrows)
            rowptr = np.zeros(self.nrows + 1, dtype=INDEX_DTYPE)
            np.cumsum(counts, out=rowptr[1:])
            parts.append(
                CsrGraph(
                    rowptr=rowptr,
                    colind=(self.colind[mask] - lo).astype(INDEX_DTYPE),
                    vals=self.vals[mask],
                    ncols=hi - lo,
                )
            )
        return parts

    def to_dense(self) -> np.ndarray:
        return self.to_coo().to_dense()


def column_split_bounds(ncols: int, nparts: int) -> list[tuple[int, int]]:
    """Equal column ranges; remainder absorbed by the LAST part — the same
    convention as the reference's dense/h_size splits (spmm.py:59-63) and
    ``col_split`` (spmm.py:128-136)."""
    w = ncols // nparts
    if w == 0:
        raise ValueError(f"cannot split {ncols} columns into {nparts} parts")
    bounds = []
    for i in range(nparts):
        lo = i * w
        hi = (i + 1) * w if i < nparts - 1 else ncols
        bounds.append((lo, hi))
    return bounds


def coo_to_csr(coo: CooGraph) -> CsrGraph:
    """COO→CSR conversion (analog of utils.hpp:87-127 ``coo2csr``).

    Uses the native C++ single-pass counting sort when available (float32
    values), which is row-stable; NumPy lexsort fallback otherwise."""
    from pygim_tpu.core import native

    if coo.vals.dtype == np.float32:
        res = native.coo_to_csr_native(coo.rows, coo.cols, coo.vals, coo.nrows)
        if res is not None:
            rowptr, colind, vals = res
            return CsrGraph(
                rowptr=rowptr, colind=colind, vals=vals, ncols=coo.ncols
            )
    s = coo.sort_by_row()
    counts = np.bincount(s.rows, minlength=coo.nrows)
    rowptr = np.zeros(coo.nrows + 1, dtype=INDEX_DTYPE)
    np.cumsum(counts, out=rowptr[1:])
    return CsrGraph(rowptr=rowptr, colind=s.cols, vals=s.vals, ncols=coo.ncols)


def merge_duplicate_edges(graph) -> "tuple[CooGraph, bool]":
    """Sum duplicate ``(row, col)`` entries into single edges — a
    semantic no-op for SpMM (the result accumulates them anyway) that
    every formulation benefits from: fewer gather slots in the ELL tail,
    and integer-core demotions shrink from per-duplicate-edge to
    per-cell (ops/spmm.py ``_demote_edges``). The hybrid dense core
    already merges by construction; this extends the same credit to the
    gather tiers. Returns ``(graph, merged?)``; the input is returned
    unchanged when it is already a simple graph, or when the merged
    integer values would overflow every storage dtype up to int32.

    Integer values accumulate in int64 and cast back to the narrowest
    safe dtype (original, else int32) — matching the ≥int32 accumulation
    the unmerged formulation uses (ops/reference.py ``accum_dtype``).
    Float values accumulate in float64 and return to the original dtype.
    """
    coo = graph if isinstance(graph, CooGraph) else graph.to_coo()
    key = coo.rows.astype(np.int64) * np.int64(coo.ncols) + coo.cols
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.ones(ks.size, dtype=bool)
    if ks.size:
        first[1:] = ks[1:] != ks[:-1]
    if first.all():
        return coo, False
    idx = np.flatnonzero(first)
    if np.issubdtype(coo.vals.dtype, np.integer):
        acc = np.add.reduceat(coo.vals[order].astype(np.int64), idx)
        info = np.iinfo(coo.vals.dtype)
        if acc.max(initial=0) <= info.max and acc.min(initial=0) >= info.min:
            vals = acc.astype(coo.vals.dtype)
        elif (acc.max(initial=0) <= np.iinfo(np.int32).max
              and acc.min(initial=0) >= np.iinfo(np.int32).min):
            vals = acc.astype(np.int32)
        else:
            return coo, False
    else:
        vals = np.add.reduceat(
            coo.vals[order].astype(np.float64), idx
        ).astype(coo.vals.dtype)
    return (
        CooGraph(
            rows=(ks[idx] // coo.ncols).astype(coo.rows.dtype),
            cols=(ks[idx] % coo.ncols).astype(coo.cols.dtype),
            vals=vals,
            nrows=coo.nrows,
            ncols=coo.ncols,
        ),
        True,
    )
