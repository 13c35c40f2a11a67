"""ctypes bindings for the native C++ planner (native/planner.cpp).

The role the reference's C host runtime plays at prepare time —
partitioning + padded table materialization (partition.c,
spmm_mul_csr.c:118-258) — implemented as a C++ shared library. Every entry
point has a NumPy fallback (the pure-Python planner in
:mod:`pygim_tpu.core.partition`), so the framework works without a
compiler; the native path is auto-built on first use when ``make`` and a
C++ toolchain are present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_NAME = "libpygim_planner.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> Optional[Path]:
    so = _NATIVE_DIR / _LIB_NAME
    if so.exists() and all(
        so.stat().st_mtime >= (_NATIVE_DIR / src).stat().st_mtime
        for src in ("planner.cpp", "partition_ml.cpp")
    ):
        return so
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return so if so.exists() else None
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native planner; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("PYGIM_TPU_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.coo_rowptr.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int32, _i32p]
    lib.coo_rowptr.restype = ctypes.c_int
    lib.coo_to_csr_f32.argtypes = [
        _i32p, _i32p, _f32p, ctypes.c_int64, ctypes.c_int32, _i32p, _i32p,
        _f32p,
    ]
    lib.coo_to_csr_f32.restype = ctypes.c_int
    lib.plan_row_blocks_nnz.argtypes = [
        _i32p, ctypes.c_int32, ctypes.c_int32, _i32p
    ]
    lib.plan_row_blocks_nnz.restype = ctypes.c_int
    lib.build_ell_blocks_f32.argtypes = [
        _i32p, _i32p, _f32p, ctypes.c_int32, _i32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, _i32p, _f32p, _i32p,
    ]
    lib.build_ell_blocks_f32.restype = ctypes.c_int
    lib.block_nnz_counters.argtypes = [
        _i32p, _i32p, ctypes.c_int32, _i64p,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.block_nnz_counters.restype = ctypes.c_int
    _u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.core_fill_f32.argtypes = [
        _i32p, _i32p, _f32p, ctypes.c_int64, _i32p, ctypes.c_int32, _f32p
    ]
    lib.core_fill_f32.restype = ctypes.c_int
    lib.core_tail_mask.argtypes = [
        _i32p, _i32p, ctypes.c_int64, _i32p, ctypes.c_int32, _u8p
    ]
    lib.core_tail_mask.restype = ctypes.c_int
    lib.csr_to_dense_f32.argtypes = [
        _i32p, _i32p, _f32p, ctypes.c_int32, _f32p
    ]
    lib.csr_to_dense_f32.restype = ctypes.c_int
    lib.planner_threads.argtypes = []
    lib.planner_threads.restype = ctypes.c_int
    lib.core_build_bands.argtypes = [
        _i32p, _i32p, _f32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_void_p,
        _i64p, ctypes.c_int64,
    ]
    lib.core_build_bands.restype = ctypes.c_int64
    lib.partition_kway.argtypes = [
        ctypes.c_int32, _i32p, _i32p, ctypes.c_int32, ctypes.c_float,
        ctypes.c_int32, _i32p,
    ]
    lib.partition_kway.restype = ctypes.c_int64
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


# ------------------------- high-level wrappers ---------------------------

def coo_to_csr_native(rows, cols, vals, nrows: int):
    """(rowptr, colind, vals) via the native single-pass counting sort;
    None if the library is unavailable or dtype unsupported."""
    lib = get_lib()
    if lib is None or vals.dtype != np.float32:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    nnz = rows.shape[0]
    rowptr = np.empty(nrows + 1, dtype=np.int32)
    if lib.coo_rowptr(rows, nnz, nrows, rowptr) != 0:
        return None
    colind = np.empty(nnz, dtype=np.int32)
    out_vals = np.empty(nnz, dtype=np.float32)
    lib.coo_to_csr_f32(rows, cols, vals, nnz, nrows, rowptr, colind, out_vals)
    return rowptr, colind, out_vals


def core_fill_native(rows, cols, vals, rank, k: int):
    """(dense core f32 (k,k), tail_mask bool). Random scatter into a
    multi-GB dense array is TLB-bound (~2.6 µs/edge measured at 16 GB);
    instead: counting-sort the in-core edges into rank-space CSR (two
    sequential passes) then fill row-major (sequential writes)."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    rank = np.ascontiguousarray(rank, np.int32)
    nnz = rows.shape[0]
    mask = np.empty(nnz, dtype=np.uint8)
    lib.core_tail_mask(rows, cols, nnz, rank, k, mask)
    tail_mask = mask.astype(bool)
    in_core = ~tail_mask
    rr = np.ascontiguousarray(rank[rows[in_core]])
    cc = np.ascontiguousarray(rank[cols[in_core]])
    vv = np.ascontiguousarray(vals[in_core])
    m = rr.shape[0]
    rowptr = np.empty(k + 1, dtype=np.int32)
    out = np.zeros((k, k), dtype=np.float32)
    if m and lib.coo_rowptr(rr, m, k, rowptr) == 0:
        colind = np.empty(m, dtype=np.int32)
        sv = np.empty(m, dtype=np.float32)
        lib.coo_to_csr_f32(rr, cc, vv, m, k, rowptr, colind, sv)
        lib.csr_to_dense_f32(rowptr, colind, sv, k, out)
    elif m:
        # fallback: direct scatter (slow but correct)
        lib.core_fill_f32(rows, cols, vals, nnz, rank, k, out)
    return out, tail_mask


def core_build_banded(rows, cols, vals, rank, k: int, core_dtype: str,
                      band_bytes: int = 512 << 20):
    """Build the hybrid hub-core directly in its STORED dtype
    (bfloat16 (k,k) / int8 (k,k) / nibble-packed int4 uint8 (k,k/2))
    without ever materializing the (k,k) float32 intermediate — the
    full-dense fill + NumPy convert costs ~4k² bytes of fresh pages and
    a second full pass (measured 870 s at k=113k, docs/PERF.md prepare
    notes). Fills a reused f32 row band from the rank-space CSR and
    converts/packs each band in one native pass, OpenMP-parallel over
    bands (disjoint output rows — bit-deterministic; ``band_bytes`` is
    the TOTAL f32 band budget, split across threads).

    Returns ``(core, tail_mask, bad_flat)`` — ``bad_flat`` the sorted
    global row-major flat indices of cells demoted by the exact-integer
    range check (always empty for bfloat16) — or None when the native
    library is unavailable.
    """
    lib = get_lib()
    if lib is None or core_dtype not in ("bfloat16", "int8", "int4"):
        return None
    if core_dtype == "int4" and k % 2:
        return None  # caller pairs columns before packing
    import ml_dtypes

    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    rank = np.ascontiguousarray(rank, np.int32)
    nnz = rows.shape[0]
    mask = np.empty(nnz, dtype=np.uint8)
    lib.core_tail_mask(rows, cols, nnz, rank, k, mask)
    tail_mask = mask.astype(bool)
    in_core = ~tail_mask

    if core_dtype == "bfloat16":
        core = np.zeros((k, k), dtype=ml_dtypes.bfloat16)
    elif core_dtype == "int8":
        core = np.zeros((k, k), dtype=np.int8)
    else:
        core = np.zeros((k, k // 2), dtype=np.uint8)

    rr = np.ascontiguousarray(rank[rows[in_core]])
    cc = np.ascontiguousarray(rank[cols[in_core]])
    vv = np.ascontiguousarray(vals[in_core])
    m = rr.shape[0]
    if m == 0:
        return core, tail_mask, np.empty(0, dtype=np.int64)
    rowptr = np.empty(k + 1, dtype=np.int32)
    if lib.coo_rowptr(rr, m, k, rowptr) != 0:
        return None
    colind = np.empty(m, dtype=np.int32)
    sv = np.empty(m, dtype=np.float32)
    lib.coo_to_csr_f32(rr, cc, vv, m, k, rowptr, colind, sv)

    mode = {"bfloat16": 0, "int8": 1, "int4": 2}[core_dtype]
    nthreads = max(1, int(lib.planner_threads()))
    band_rows = max(1, min(k, band_bytes // (4 * k * nthreads)))
    hi, lo = (127.0, -128.0) if core_dtype == "int8" else (7.0, -8.0)
    cap = 1 << 20
    bad_buf = np.empty(cap, dtype=np.int64)
    out_ptr = ctypes.c_void_p(core.ctypes.data)
    total = lib.core_build_bands(
        rowptr, colind, sv, k, band_rows, mode, hi, lo, out_ptr,
        bad_buf, cap,
    )
    if total < 0:
        return None
    if total > cap:
        # capacity overflow (pathological): one more pass with an
        # exactly-sized buffer
        bad_buf = np.empty(int(total), dtype=np.int64)
        total = lib.core_build_bands(
            rowptr, colind, sv, k, band_rows, mode, hi, lo, out_ptr,
            bad_buf, int(total),
        )
    # thread append order is non-deterministic — sort for a stable result
    bad_flat = np.sort(bad_buf[: int(total)].copy())
    return core, tail_mask, bad_flat


def partition_kway_native(rowptr, colind, nparts: int, tol: float = 0.03,
                          seed: int = 0):
    """Multilevel k-way partition (native/partition_ml.cpp — the METIS
    capability the reference uses via ClusterData, reference
    inference.py:64-73). Returns ``(part, edge_cut)`` where ``part`` is
    the int32 membership array over the SYMMETRIZED simple graph and
    ``edge_cut`` its achieved undirected cut; None if the library is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    colind = np.ascontiguousarray(colind, np.int32)
    n = rowptr.shape[0] - 1
    part = np.empty(n, dtype=np.int32)
    cut = lib.partition_kway(
        n, rowptr, colind, int(nparts), float(tol), int(seed), part
    )
    if cut < 0:
        return None
    return part, int(cut)


def f32_to_bf16_bits(a: np.ndarray) -> np.ndarray:
    """float32 → bfloat16 array (ml_dtypes' astype is SIMD-vectorized)."""
    import ml_dtypes

    return a.astype(ml_dtypes.bfloat16)


def build_ell_native(rowptr, colind, vals, bounds, rows_pad, nnz_pad):
    """Padded ELL tables via native code; None on unavailability."""
    lib = get_lib()
    if lib is None or vals.dtype != np.float32:
        return None
    nb = bounds.shape[0] - 1
    nrows = rowptr.shape[0] - 1
    out_c = np.empty((nb, nnz_pad), dtype=np.int32)
    out_v = np.empty((nb, nnz_pad), dtype=np.float32)
    out_r = np.empty((nb, nnz_pad), dtype=np.int32)
    rc = lib.build_ell_blocks_f32(
        np.ascontiguousarray(rowptr, np.int32),
        np.ascontiguousarray(colind, np.int32),
        np.ascontiguousarray(vals, np.float32),
        nrows, np.ascontiguousarray(bounds, np.int32), nb,
        rows_pad, nnz_pad, out_c, out_v, out_r,
    )
    if rc != 0:
        return None
    return out_c, out_v, out_r
