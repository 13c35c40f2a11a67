// pygim_tpu native planner — C++ equivalents of the reference's C host
// runtime's data-preparation layer (backend_pim/*/support/partition.c and
// the prepare step of spmm_mul_csr.c:118-258), built as a shared library
// and bound via ctypes (pygim_tpu/core/native.py).
//
// The heavy host-side operations during prepare are:
//   * COO -> CSR conversion (sort + bucket) of 100M+ edge graphs,
//   * nnz-balanced row-block boundary search,
//   * padded ELL block-table materialization (colind/vals/rowloc),
// which in NumPy cost multiple passes and peak 3x memory. These kernels
// are single-pass and cache-friendly. The banded core build is
// OpenMP-parallel over bands (disjoint output rows, so results stay
// bit-deterministic; the demoted-cell index list is sorted by the caller).
//
// All exported symbols use a flat C ABI: int32/int64/float arrays
// preallocated by the caller (NumPy), sizes passed explicitly.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Histogram rows and produce rowptr (size nrows+1). Returns 0 on success.
int coo_rowptr(const int32_t* rows, int64_t nnz, int32_t nrows,
               int32_t* rowptr /* nrows+1 */) {
  std::vector<int64_t> counts(nrows, 0);
  for (int64_t i = 0; i < nnz; ++i) {
    int32_t r = rows[i];
    if (r < 0 || r >= nrows) return -1;
    counts[r]++;
  }
  int64_t acc = 0;
  rowptr[0] = 0;
  for (int32_t r = 0; r < nrows; ++r) {
    acc += counts[r];
    rowptr[r + 1] = static_cast<int32_t>(acc);
  }
  return acc == nnz ? 0 : -2;
}

// Stable counting-sort COO by row into CSR order, emitting permuted colind
// and values (float32). rowptr must already be filled by coo_rowptr.
// (The analog of utils.hpp:87-127 coo2csr, minus the mtx parsing.)
int coo_to_csr_f32(const int32_t* rows, const int32_t* cols,
                   const float* vals, int64_t nnz, int32_t nrows,
                   const int32_t* rowptr, int32_t* out_colind,
                   float* out_vals) {
  std::vector<int64_t> cursor(nrows);
  for (int32_t r = 0; r < nrows; ++r) cursor[r] = rowptr[r];
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t p = cursor[rows[i]]++;
    out_colind[p] = cols[i];
    out_vals[p] = vals ? vals[i] : 1.0f;
  }
  return 0;
}

// nnz-balanced row-granular block boundaries (partition_by_nnz_csr analog,
// partition.c:51-99): bounds has n_blocks+1 entries.
int plan_row_blocks_nnz(const int32_t* rowptr, int32_t nrows,
                        int32_t n_blocks, int32_t* bounds) {
  int64_t nnz = rowptr[nrows];
  bounds[0] = 0;
  int32_t r = 0;
  for (int32_t b = 1; b < n_blocks; ++b) {
    int64_t target = (nnz * b) / n_blocks;
    while (r < nrows && rowptr[r + 1] < target) ++r;
    // first row whose cumulative nnz reaches target ends the block
    int32_t cut = (r < nrows) ? r + 1 : nrows;
    if (cut < bounds[b - 1]) cut = bounds[b - 1];
    bounds[b] = cut;
  }
  bounds[n_blocks] = nrows;
  return 0;
}

// Materialize padded ELL block tables (build_ell_blocks analog — the
// prepare_pim_csr padding step, spmm_mul_csr.c:152-246). Caller allocates
// colind/vals/rowloc of shape (n_blocks, nnz_pad); padding convention:
// colind 0, vals 0, rowloc rows_pad-1.
int build_ell_blocks_f32(const int32_t* rowptr, const int32_t* colind,
                         const float* vals, int32_t nrows,
                         const int32_t* bounds, int32_t n_blocks,
                         int32_t rows_pad, int32_t nnz_pad,
                         int32_t* out_colind, float* out_vals,
                         int32_t* out_rowloc) {
  for (int32_t b = 0; b < n_blocks; ++b) {
    int64_t base = static_cast<int64_t>(b) * nnz_pad;
    int32_t r0 = bounds[b], r1 = bounds[b + 1];
    int64_t e0 = rowptr[r0], e1 = rowptr[r1];
    if (e1 - e0 > nnz_pad) return -1;  // capacity violated
    int64_t k = 0;
    for (int32_t r = r0; r < r1; ++r) {
      int32_t rl = r - r0;
      for (int64_t e = rowptr[r]; e < rowptr[r + 1]; ++e, ++k) {
        out_colind[base + k] = colind[e];
        out_vals[base + k] = vals[e];
        out_rowloc[base + k] = rl;
      }
    }
    for (; k < nnz_pad; ++k) {
      out_colind[base + k] = 0;
      out_vals[base + k] = 0.0f;
      out_rowloc[base + k] = rows_pad - 1;
    }
  }
  return 0;
}

// Per-block nnz counters for the autotuner's plan statistics
// (the reference's lost prepare_tune_csr measurement op, SURVEY.md §2.1).
int block_nnz_counters(const int32_t* rowptr, const int32_t* bounds,
                       int32_t n_blocks, int64_t* out_nnz_per_block,
                       int64_t* out_max_nnz) {
  int64_t mx = 0;
  for (int32_t b = 0; b < n_blocks; ++b) {
    int64_t v = rowptr[bounds[b + 1]] - rowptr[bounds[b]];
    out_nnz_per_block[b] = v;
    mx = std::max(mx, v);
  }
  *out_max_nnz = mx;
  return 0;
}

// Column-range split of a CSR operand: count per-row nnz within
// [col_lo, col_hi) producing the part's rowptr; second call materializes.
int csr_col_slice_count(const int32_t* rowptr, const int32_t* colind,
                        int32_t nrows, int32_t col_lo, int32_t col_hi,
                        int32_t* out_rowptr) {
  int64_t acc = 0;
  out_rowptr[0] = 0;
  for (int32_t r = 0; r < nrows; ++r) {
    for (int64_t e = rowptr[r]; e < rowptr[r + 1]; ++e) {
      int32_t c = colind[e];
      if (c >= col_lo && c < col_hi) ++acc;
    }
    out_rowptr[r + 1] = static_cast<int32_t>(acc);
  }
  return 0;
}

int csr_col_slice_fill_f32(const int32_t* rowptr, const int32_t* colind,
                           const float* vals, int32_t nrows, int32_t col_lo,
                           int32_t col_hi, int32_t* out_colind,
                           float* out_vals) {
  int64_t k = 0;
  for (int32_t r = 0; r < nrows; ++r) {
    for (int64_t e = rowptr[r]; e < rowptr[r + 1]; ++e) {
      int32_t c = colind[e];
      if (c >= col_lo && c < col_hi) {
        out_colind[k] = c - col_lo;
        out_vals[k] = vals[e];
        ++k;
      }
    }
  }
  return 0;
}

// Dense hub-core fill for the hybrid SpMM backend: out (k×k, zeroed by
// caller) accumulates vals of edges whose BOTH endpoints rank below k.
// Single pass over the edge list — replaces a scipy coo->dense round trip
// that costs minutes at 100M edges.
int core_fill_f32(const int32_t* rows, const int32_t* cols,
                  const float* vals, int64_t nnz, const int32_t* rank,
                  int32_t k, float* out) {
  for (int64_t i = 0; i < nnz; ++i) {
    int32_t r = rank[rows[i]];
    int32_t c = rank[cols[i]];
    if (r < k && c < k) out[static_cast<int64_t>(r) * k + c] += vals[i];
  }
  return 0;
}

// Row-major dense fill from a CSR operand already in rank space: writes
// stream through each 4·k-byte row in order — TLB/cache friendly, ~10×
// faster than random scatter over a multi-GB core.
int csr_to_dense_f32(const int32_t* rowptr, const int32_t* colind,
                     const float* vals, int32_t k, float* out) {
  for (int32_t r = 0; r < k; ++r) {
    float* row = out + static_cast<int64_t>(r) * k;
    for (int64_t e = rowptr[r]; e < rowptr[r + 1]; ++e) {
      row[colind[e]] += vals[e];
    }
  }
  return 0;
}

// Tail extraction companion: writes a 0/1 mask of edges OUTSIDE the core.
int core_tail_mask(const int32_t* rows, const int32_t* cols, int64_t nnz,
                   const int32_t* rank, int32_t k, uint8_t* tail_mask) {
  for (int64_t i = 0; i < nnz; ++i) {
    tail_mask[i] =
        (rank[rows[i]] >= k || rank[cols[i]] >= k) ? 1 : 0;
  }
  return 0;
}

// ---- banded core build ----------------------------------------------------
// Materializing the full (k, k) float32 core before converting it to the
// stored dtype costs ~4·k² bytes of fresh pages (51 GB at k=113k) plus a
// second full conversion pass in NumPy — measured 870 s of the products
// int4 prepare. The banded path fills a REUSED f32 row band from the
// rank-space CSR, then converts/packs it in one C pass directly into the
// final array, so only the output (0.5–2 B/cell) is ever materialized.

// Zero + fill rows [r0, r1) of the rank-space CSR into a caller-provided
// f32 band of shape (r1-r0, k).
int csr_band_fill_f32(const int32_t* rowptr, const int32_t* colind,
                      const float* vals, int32_t r0, int32_t r1, int32_t k,
                      float* band) {
  std::memset(band, 0, sizeof(float) * static_cast<size_t>(r1 - r0) * k);
  for (int32_t r = r0; r < r1; ++r) {
    float* row = band + static_cast<int64_t>(r - r0) * k;
    for (int64_t e = rowptr[r]; e < rowptr[r + 1]; ++e) {
      row[colind[e]] += vals[e];
    }
  }
  return 0;
}

// Convert an f32 band (n cells) to int8 with the exact-integer range
// check: a cell rides the core only if it equals an integer in
// [lo, hi]; offenders are zeroed and their band-relative flat indices
// appended to bad (capacity cap). Returns the TOTAL bad count (which may
// exceed cap — caller rescans the band on overflow).
int64_t band_f32_to_int8(const float* band, int64_t n, float hi, float lo,
                         int8_t* out, int64_t* bad, int64_t cap) {
  int64_t nb = 0;
  for (int64_t i = 0; i < n; ++i) {
    float v = band[i];
    // range first (the cast below would be UB out of int8 range), then
    // integrality; NaN fails all three tests and lands in bad.
    if (!(v >= lo) || !(v <= hi) || std::nearbyint(v) != v) {
      if (nb < cap) bad[nb] = i;
      ++nb;
      out[i] = 0;
    } else {
      out[i] = static_cast<int8_t>(v);
    }
  }
  return nb;
}

// Nibble-pack an int8 band of shape (rows, k): byte j of a packed row
// holds cells (2j, 2j+1) — low nibble = even column, high = odd.
int band_int8_pack_nibbles(const int8_t* band, int64_t rows, int32_t k,
                           uint8_t* out) {
  int32_t kh = k / 2;
  for (int64_t r = 0; r < rows; ++r) {
    const int8_t* src = band + r * k;
    uint8_t* dst = out + r * kh;
    for (int32_t j = 0; j < kh; ++j) {
      dst[j] = static_cast<uint8_t>(
          (static_cast<uint8_t>(src[2 * j]) & 0xF) |
          ((static_cast<uint8_t>(src[2 * j + 1]) & 0xF) << 4));
    }
  }
  return 0;
}

// float32 -> bfloat16 with round-to-nearest-even (the rounding ml_dtypes'
// astype uses), so the native bf16 core is bit-identical to the NumPy path.
static inline uint16_t f32_to_bf16_rne(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  if ((x & 0x7fffffffu) > 0x7f800000u) {
    return static_cast<uint16_t>((x >> 16) | 0x0040u);  // quiet the NaN
  }
  x += 0x7fffu + ((x >> 16) & 1u);
  return static_cast<uint16_t>(x >> 16);
}

int planner_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// Whole-core banded build, parallel over bands. The rank-space CSR
// (rowptr/colind/vals over k rows) is read-only; each band writes a
// disjoint row range of `out`, so the core is bit-deterministic under any
// thread schedule. mode: 0 = bfloat16 (uint16, k cols), 1 = int8 (k cols),
// 2 = nibble-packed int4 (k/2 bytes per row). `bad` receives GLOBAL
// row-major flat indices of cells demoted by the exact-integer range check
// (unsorted — caller sorts); returns the total bad count, which may exceed
// `cap` (caller re-invokes with a larger buffer).
int64_t core_build_bands(const int32_t* rowptr, const int32_t* colind,
                         const float* vals, int32_t k, int32_t band_rows,
                         int32_t mode, float hi, float lo, void* out,
                         int64_t* bad, int64_t cap) {
  if (band_rows < 1) return -1;
  int32_t n_bands = (k + band_rows - 1) / band_rows;
  int64_t cursor = 0;  // total bad count; entries past `cap` are counted,
                       // not stored
#pragma omp parallel
  {
    std::vector<float> band(static_cast<size_t>(band_rows) * k);
    std::vector<int8_t> stage;
    if (mode == 2) stage.resize(static_cast<size_t>(band_rows) * k);
    std::vector<int64_t> local_bad;
#pragma omp for schedule(dynamic)
    for (int32_t b = 0; b < n_bands; ++b) {
      int32_t r0 = b * band_rows;
      int32_t r1 = std::min(k, r0 + band_rows);
      csr_band_fill_f32(rowptr, colind, vals, r0, r1, k, band.data());
      int64_t n_cells = static_cast<int64_t>(r1 - r0) * k;
      if (mode == 0) {
        uint16_t* dst = static_cast<uint16_t*>(out) +
                        static_cast<int64_t>(r0) * k;
        for (int64_t i = 0; i < n_cells; ++i) dst[i] = f32_to_bf16_rne(band[i]);
        continue;
      }
      int8_t* dst8 = (mode == 1)
                         ? static_cast<int8_t*>(out) +
                               static_cast<int64_t>(r0) * k
                         : stage.data();
      local_bad.clear();
      for (int64_t i = 0; i < n_cells; ++i) {
        float v = band[i];
        if (!(v >= lo) || !(v <= hi) || std::nearbyint(v) != v) {
          local_bad.push_back(static_cast<int64_t>(r0) * k + i);
          dst8[i] = 0;
        } else {
          dst8[i] = static_cast<int8_t>(v);
        }
      }
      if (mode == 2) {
        uint8_t* dstp = static_cast<uint8_t*>(out) +
                        static_cast<int64_t>(r0) * (k / 2);
        band_int8_pack_nibbles(stage.data(), r1 - r0, k, dstp);
      }
      if (!local_bad.empty()) {
        int64_t pos;
#pragma omp critical(pygim_bad_append)
        {
          pos = cursor;
          cursor += static_cast<int64_t>(local_bad.size());
        }
        for (size_t i = 0; i < local_bad.size(); ++i) {
          int64_t at = pos + static_cast<int64_t>(i);
          if (at < cap) bad[at] = local_bad[i];
        }
      }
    }
  }
  return cursor;
}

}  // extern "C"
