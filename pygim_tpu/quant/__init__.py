"""Symmetric scale quantization for the aggregate path.

Bit-compatible with the reference (models/quantize.py:20-42):

    scale = 2 * max|v| / 2**k,  k = 5 (int8), 10 (int16), 20 (int32),
                                 20 (float passthrough — still scaled+rounded)
    v_q   = round(v / scale)  cast to target dtype
    dequantize(out, scale_edge, scale_x) = out * (scale_edge * scale_x)

The small exponents leave integer-accumulation headroom: int8 payload is
±2^4, so int32 accumulation is safe up to ~2^26 summed terms — the same
overflow guard the reference relies on (SURVEY.md §7 hard parts).

TPU extension: ``dtype='bfloat16'`` casts directly (scale 1.0) — the native
reduced-precision aggregation mode the reference hardware lacked.
"""

from __future__ import annotations

import jax.numpy as jnp

_SCALE_EXP = {"int8": 5, "int16": 10, "int32": 20}


def symmetric_quantize(v, dtype="int32"):
    """Returns ``(scale, v_q)``. ``dtype`` may be a string or jnp dtype;
    non-integer dtypes take the float passthrough path (k=20, kept float),
    matching quantize.py:28-31. ``dtype=None`` disables quantization."""
    if dtype is None:
        return jnp.ones((), dtype=v.dtype), v
    name = jnp.dtype(dtype).name
    if name == "bfloat16":
        return jnp.ones((), dtype=jnp.float32), v.astype(jnp.bfloat16)
    abs_max = jnp.max(jnp.abs(v))
    k = _SCALE_EXP.get(name, 20)
    scale = abs_max * 2.0 / (2.0 ** k)
    # guard scale==0 (all-zero input): reference would produce nan/inf;
    # we define q(v)=0 there, which dequantizes to the correct zeros.
    safe = jnp.where(scale == 0, jnp.ones_like(scale), scale)
    v_q = jnp.round(v / safe)
    if name in _SCALE_EXP or name == "int64":
        v_q = v_q.astype(name)
    return scale, v_q


def symmetric_dequantize(out, scale_edge, scale_x):
    """out * (scale_edge * scale_x) — quantize.py:40-42. Integer ``out`` is
    promoted to the scale's float dtype."""
    return out * (scale_edge * scale_x)
