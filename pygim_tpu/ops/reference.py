"""Reference (oracle) sparse ops in plain jnp — the ``spmm_host_*`` analog.

The reference keeps a CPU implementation compilable next to every PIM path
(spmm_host_csr, backend_pim/spmm_default/spmm_mul_csr.c:100-113;
spmm_host_{csr,coo}_group, ops.hpp:42-62/97-118) as its A/B harness. These
functions are our equivalent: simple, obviously-correct gather+segment-sum,
used as the allclose target for every Pallas/blocked backend.

Accumulation dtype rules (overflow headroom): integer inputs accumulate in
int32 (int64 stays int64); bf16 accumulates in f32. The reference caps the
quantized range instead (2^5 for int8, models/quantize.py:22-23) — we keep
both safeguards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def accum_dtype(val_dtype) -> jnp.dtype:
    d = jnp.dtype(val_dtype)
    if d == jnp.int64:
        return jnp.int64
    if jnp.issubdtype(d, jnp.integer):
        return jnp.int32
    if d == jnp.bfloat16:
        return jnp.float32
    return d


def spmm_coo_oracle(rows, cols, vals, x, nrows: int):
    """out[r] = sum_k vals[k] * x[cols[k]]  for rows[k]==r.

    Plain take + segment_sum; materializes the (nnz, H) gather so only for
    graphs that fit. ``indices_are_sorted`` is not assumed.
    """
    acc = accum_dtype(jnp.result_type(vals.dtype, x.dtype))
    gathered = jnp.take(x, cols, axis=0).astype(acc)
    contrib = gathered * vals.astype(acc)[:, None]
    out = jax.ops.segment_sum(contrib, rows, num_segments=nrows)
    return out


def spmm_coo_oracle_chunked(rows, cols, vals, x, nrows: int, chunk: int):
    """Memory-bounded oracle: the same per-edge math as
    :func:`spmm_coo_oracle`, but edges stream through a ``lax.scan`` in
    fixed ``chunk``-size slices, so the (nnz, H) gather never
    materializes. Crucially this bounds the AUTODIFF transpose too: with
    ``vals`` held constant (the training case — edge weights are not
    trained), the per-step residuals are just the index/value slices, so
    the backward is O(chunk·H + N·H) instead of the plain oracle's
    ~2×(nnz, H) (measured 117 GB OOM at reddit scale — VERDICT r4 item
    4). This is what lets the oracle ARM of trained-parity run at
    flagship scale on a 16 GB chip. Pad edges carry val 0 on row 0 —
    exact zero contributions in any dtype."""
    acc = accum_dtype(jnp.result_type(vals.dtype, x.dtype))
    nnz = int(rows.shape[0])
    chunk = max(1, min(chunk, nnz)) if nnz else 1
    n_steps = -(-nnz // chunk)
    pad = n_steps * chunk - nnz
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])

    def body(out, xs):
        r, c, v = xs
        g = jnp.take(x, c, axis=0).astype(acc)
        return out.at[r].add(g * v.astype(acc)[:, None]), None

    out0 = jnp.zeros((nrows, x.shape[1]), acc)
    out, _ = jax.lax.scan(
        body, out0,
        (
            rows.reshape(n_steps, chunk),
            cols.reshape(n_steps, chunk),
            vals.reshape(n_steps, chunk),
        ),
    )
    return out


def spmm_csr_oracle(rowptr, colind, vals, x, nrows: int):
    """CSR oracle — expands rowids then defers to the COO oracle."""
    rowids = jnp.repeat(
        jnp.arange(nrows, dtype=colind.dtype),
        jnp.diff(rowptr),
        total_repeat_length=colind.shape[0],
    )
    return spmm_coo_oracle(rowids, colind, vals, x, nrows)


def spmm_dense_oracle(dense_a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """NumPy float64 ground truth for tiny cases."""
    return dense_a.astype(np.float64) @ x.astype(np.float64)


def sddmm_coo_oracle(rows, cols, a, b):
    """Sampled dense-dense matmul: out[k] = <a[rows[k]], b[cols[k]]>.

    The SpMM's transpose-structured sibling (BASELINE north-star op);
    used for attention-style edge scoring.
    """
    acc = accum_dtype(jnp.result_type(a.dtype, b.dtype))
    return jnp.sum(
        jnp.take(a, rows, axis=0).astype(acc) * jnp.take(b, cols, axis=0).astype(acc),
        axis=-1,
    )
