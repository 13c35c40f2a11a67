"""Pallas dequantizing hub-core matmul (ops/pallas_core.py) — interpret
mode on CPU; the compiled path is A/B'd on the real chip."""

import os

import numpy as np
import pytest

from pygim_tpu.core.graph import CooGraph
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm


def test_dequant_core_dot_matches_bf16_reference():
    import jax.numpy as jnp

    from pygim_tpu.ops.pallas_core import dequant_core_dot

    rng = np.random.default_rng(0)
    for k in (512, 768):  # exact and partial-TM-block cases
        core = rng.integers(-128, 128, (k, k)).astype(np.int8)
        x = rng.standard_normal((k, 128)).astype(np.float32)
        ref = core.astype(np.float32) @ np.asarray(
            jnp.asarray(x).astype(jnp.bfloat16)
        ).astype(np.float32)
        out = np.asarray(dequant_core_dot(jnp.asarray(core), jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=1e-2)


def test_core_pallas_gate_end_to_end(monkeypatch):
    import jax.numpy as jnp

    from pygim_tpu.ops.reference import spmm_coo_oracle

    rng = np.random.default_rng(1)
    n, m = 600, 8000
    rows = (rng.pareto(1.3, m) * 20).astype(np.int64) % n
    cols = (rng.pareto(1.3, m) * 20).astype(np.int64) % n
    g = CooGraph.from_edges(rows, cols, np.ones(m, np.float32),
                            nrows=n, ncols=n)
    x = rng.standard_normal((n, 32)).astype(np.float32)
    ref = np.asarray(
        spmm_coo_oracle(g.rows, g.cols, g.vals, jnp.asarray(x), n)
    )
    cfg = SpmmConfig(backend="hybrid", hybrid_k=256, hybrid_dtype="int8")
    monkeypatch.setenv("PYGIM_CORE_PALLAS", "0")
    base = np.asarray(prepare_spmm(g, cfg).mul(jnp.asarray(x)))
    monkeypatch.setenv("PYGIM_CORE_PALLAS", "1")
    out = np.asarray(prepare_spmm(g, cfg).mul(jnp.asarray(x)))
    # the kernel must be numerically identical to the XLA astype path
    np.testing.assert_array_equal(out, base)
    # and both sit at bf16-core accuracy vs the raw oracle (merged cells
    # up to ~hundreds x bf16-rounded payload => ~4e-3 relative per cell)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-2)
