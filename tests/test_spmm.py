"""SpMM backends vs the float64 NumPy ground truth and vs each other."""

import numpy as np
import pytest

from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm
from tests.conftest import random_coo


def _dense_ref(coo, x):
    return coo.to_dense().astype(np.float64) @ x.astype(np.float64)


@pytest.mark.parametrize("backend", ["oracle", "blocked", "ell", "coo"])
@pytest.mark.parametrize("dtype", ["float32", "int32"])
def test_backend_matches_dense(rng, backend, dtype):
    coo = random_coo(rng, nrows=150, ncols=120, nnz=900, dtype=dtype)
    x = (
        rng.integers(-3, 4, size=(120, 48))
        if dtype == "int32"
        else rng.standard_normal((120, 48))
    ).astype(np.dtype(dtype if dtype != "int32" else np.int32))
    prep = prepare_spmm(coo, SpmmConfig(backend=backend, n_blocks=4))
    out = np.asarray(prep.mul(x))
    ref = _dense_ref(coo, x)
    assert out.shape == (150, 48)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ell_zero_edge_zero_col_shard(rng):
    """An empty shard with nrows>0 and ncols==0 (x has ZERO rows) must
    return exact zeros in the accumulation dtype — the old fallback read
    x[0, 0], which indexes out of bounds on a 0-size axis (JAX clamping
    there yields garbage, not zeros; round-2 advisor finding)."""
    from pygim_tpu.core.graph import CooGraph

    coo = CooGraph.from_edges(
        np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
        np.empty(0), nrows=7, ncols=0, dtype="float32",
    )
    for backend in ["ell", "blocked"]:
        prep = prepare_spmm(coo, SpmmConfig(backend=backend))
        out = np.asarray(prep.mul(np.zeros((0, 8), dtype=np.float32)))
        assert out.shape == (7, 8)
        assert (out == 0).all()


def test_blocked_many_blocks_edge_cases(rng):
    # more blocks than needed; empty rows; single block
    coo = random_coo(rng, nrows=37, ncols=29, nnz=60)
    x = rng.standard_normal((29, 8)).astype(np.float32)
    ref = _dense_ref(coo, x)
    for nb in [1, 3, 16]:
        prep = prepare_spmm(coo, SpmmConfig(backend="blocked", n_blocks=nb))
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), ref, rtol=1e-5, atol=1e-5
        )


def test_row_balance_matches(rng):
    coo = random_coo(rng, nrows=90, ncols=90, nnz=500)
    x = rng.standard_normal((90, 16)).astype(np.float32)
    prep = prepare_spmm(
        coo, SpmmConfig(backend="blocked", n_blocks=5, balance="row")
    )
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)), _dense_ref(coo, x), rtol=1e-5, atol=1e-5
    )


def test_prepare_once_run_many(rng):
    coo = random_coo(rng, nrows=64, ncols=64, nnz=300)
    prep = prepare_spmm(coo, SpmmConfig(backend="blocked", n_blocks=2))
    for _ in range(3):
        x = rng.standard_normal((64, 12)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), _dense_ref(coo, x), rtol=1e-5, atol=1e-5
        )


def test_int8_accumulates_in_int32(rng):
    coo = random_coo(rng, nrows=40, ncols=40, nnz=400, dtype="int8")
    x = rng.integers(-4, 5, size=(40, 8)).astype(np.int8)
    prep = prepare_spmm(coo, SpmmConfig(backend="blocked", n_blocks=2))
    out = np.asarray(prep.mul(x))
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, _dense_ref(coo, x).astype(np.int64))


def test_shape_mismatch_raises(rng):
    coo = random_coo(rng, nrows=10, ncols=12, nnz=20)
    prep = prepare_spmm(coo, SpmmConfig(backend="oracle"))
    with pytest.raises(ValueError):
        prep.mul(np.zeros((11, 4), dtype=np.float32))


def test_sddmm_oracle(rng):
    from pygim_tpu.ops.reference import sddmm_coo_oracle

    coo = random_coo(rng, nrows=30, ncols=25, nnz=100)
    a = rng.standard_normal((30, 16)).astype(np.float32)
    b = rng.standard_normal((25, 16)).astype(np.float32)
    out = np.asarray(sddmm_coo_oracle(coo.rows, coo.cols, a, b))
    ref = np.einsum(
        "kd,kd->k", a[coo.rows].astype(np.float64), b[coo.cols].astype(np.float64)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ell_hub_row_splitting(rng):
    """A hub row with degree >> D must split into virtual rows and merge."""
    import numpy as np

    from pygim_tpu.core.graph import CooGraph

    n = 64
    hub_cols = rng.integers(0, n, 500)
    other = rng.integers(1, n, (200, 2))
    rows = np.concatenate([np.zeros(500, dtype=int), other[:, 0]])
    cols = np.concatenate([hub_cols, other[:, 1]])
    coo = CooGraph.from_edges(rows, cols, nrows=n, ncols=n)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    prep = prepare_spmm(coo, SpmmConfig(backend="ell", ell_degree=8))
    assert prep.ell_degree == 8
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)), _dense_ref(coo, x), rtol=1e-4, atol=1e-4
    )


def test_ell_auto_degree(rng):
    coo = random_coo(rng, nrows=200, ncols=200, nnz=3000)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    prep = prepare_spmm(coo, SpmmConfig(backend="ell"))
    assert 2 <= prep.ell_degree <= 128
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)), _dense_ref(coo, x), rtol=1e-4, atol=1e-4
    )


def _zipf_coo(rng, n=800, about_nnz=12000):
    """Power-law degree graph: exercises the multi-degree split (short
    rows AND >degree hub rows in one tail)."""
    from pygim_tpu.core.graph import CooGraph

    deg = np.minimum(rng.zipf(1.4, n), 400)
    deg = (deg * (about_nnz / deg.sum())).astype(np.int64) + 1
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    return CooGraph.from_edges(rows, cols, nrows=n, ncols=n)


class TestMultiDegreeEll:
    """Multi-degree ELL tables (round 4): rows split across per-degree
    tables by the measured padding-vs-virtual-row cost model."""

    def test_ell_multi_tables_match_oracle(self, rng):
        coo = _zipf_coo(rng)
        x = rng.standard_normal((coo.ncols, 16)).astype(np.float32)
        prep = prepare_spmm(
            coo, SpmmConfig(backend="ell", block_nnz_budget=512)
        )
        assert len(prep.ell_meta) >= 2, "zipf tail should pick >1 table"
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_single_table_pin_matches_multi(self, rng):
        coo = _zipf_coo(rng)
        x = rng.standard_normal((coo.ncols, 8)).astype(np.float32)
        multi = prepare_spmm(coo, SpmmConfig(backend="ell"))
        single = prepare_spmm(
            coo, SpmmConfig(backend="ell", ell_tables=1)
        )
        assert len(single.ell_meta) == 1
        np.testing.assert_allclose(
            np.asarray(multi.mul(x)), np.asarray(single.mul(x)),
            rtol=1e-4, atol=1e-4,
        )

    def test_hybrid_multi_tail_matches_oracle(self):
        rng = np.random.default_rng(1234)
        coo = _zipf_coo(rng)
        x = rng.standard_normal((coo.ncols, 16)).astype(np.float32)
        # f32 core: isolates the multi-table tail under test from core
        # rounding (the dtype'd cores have their own tests)
        prep = prepare_spmm(
            coo,
            SpmmConfig(
                backend="hybrid", hybrid_k=128, block_nnz_budget=512,
            ),
        )
        got = np.asarray(prep.mul(x))
        np.testing.assert_allclose(
            got, _dense_ref(coo, x), rtol=1e-4, atol=1e-4
        )

    def test_hybrid_multi_fused_quant(self, rng):
        from pygim_tpu.quant import symmetric_dequantize, symmetric_quantize

        coo = _zipf_coo(rng)
        x = rng.standard_normal((coo.ncols, 8)).astype(np.float32)
        prep = prepare_spmm(
            coo,
            SpmmConfig(backend="hybrid", hybrid_k=128, hybrid_dtype="int8"),
        )
        got = np.asarray(prep.mul_quantized(x, "int8"))
        scale, xq = symmetric_quantize(x, "int8")
        ref = np.asarray(
            symmetric_dequantize(prep.mul(xq), 1.0, scale)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sddmm_blocked_matches_oracle(rng):
    from pygim_tpu.ops.reference import sddmm_coo_oracle
    from pygim_tpu.ops.sddmm import SddmmConfig, prepare_sddmm

    coo = random_coo(rng, nrows=120, ncols=90, nnz=700)
    a = rng.standard_normal((120, 32)).astype(np.float32)
    b = rng.standard_normal((90, 32)).astype(np.float32)
    prep = prepare_sddmm(coo, SddmmConfig(edge_chunk=128))
    got = np.asarray(prep.run(a, b))
    s = coo.sort_by_row()
    ref = np.asarray(sddmm_coo_oracle(s.rows, s.cols, a, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)




def test_hybrid_backend_matches_dense(rng):
    coo = random_coo(rng, nrows=200, ncols=200, nnz=3000)
    x = rng.standard_normal((200, 24)).astype(np.float32)
    prep = prepare_spmm(coo, SpmmConfig(backend="hybrid", hybrid_k=64))
    assert prep.hybrid_k_eff == 64
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)), _dense_ref(coo, x), rtol=1e-4, atol=1e-4
    )


def test_hybrid_core_covers_hubs(rng):
    """Hub-heavy graph: most edges should land in the dense core."""
    import numpy as np

    from pygim_tpu.core.graph import CooGraph

    n, hubs = 256, 16
    hub_r = rng.integers(0, hubs, 2000)
    hub_c = rng.integers(0, hubs, 2000)
    tail_r = rng.integers(0, n, 200)
    tail_c = rng.integers(0, n, 200)
    coo = CooGraph.from_edges(
        np.concatenate([hub_r, tail_r]), np.concatenate([hub_c, tail_c]),
        rng.standard_normal(2200), nrows=n, ncols=n,
    )
    x = rng.standard_normal((n, 16)).astype(np.float32)
    prep = prepare_spmm(coo, SpmmConfig(backend="hybrid", hybrid_k=32))
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)), _dense_ref(coo, x), rtol=1e-4, atol=1e-4
    )


def test_hybrid_auto_k_and_bf16(rng):
    coo = random_coo(rng, nrows=300, ncols=300, nnz=4000)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    prep = prepare_spmm(
        coo,
        SpmmConfig(backend="hybrid", hybrid_core_bytes=64 * 1024,
                   hybrid_dtype="bfloat16"),
    )
    assert prep.hybrid_k_eff <= 300
    out = np.asarray(prep.mul(x))
    ref = _dense_ref(coo, x)
    # bf16 core: looser tolerance
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=1e-1)


def test_hybrid_int_rides_bf16_core(rng):
    """Integer aggregation goes through a bf16 core — exact for the small
    quantized payloads; result matches the exact ell path."""
    coo = random_coo(rng, nrows=100, ncols=100, nnz=1200, dtype="int8")
    x = rng.integers(-8, 9, size=(100, 16)).astype(np.int8)
    hyb = prepare_spmm(coo, SpmmConfig(backend="hybrid", hybrid_k=32))
    assert hyb.config.hybrid_dtype == "bfloat16"
    out = np.asarray(hyb.mul(x))
    ref = _dense_ref(coo, x)
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)  # exact

    # explicit f32 core request with ints is rejected
    with pytest.raises(ValueError):
        prepare_spmm(
            coo, SpmmConfig(backend="hybrid", hybrid_dtype="float32")
        )


def test_hybrid_bf16_core_wide_int_exact(rng):
    """WIDE integer payloads (int16/int32 quantization, |q| well above
    bf16's 2^8 exact-integer ceiling) through the DEFAULT bf16 core must
    stay exact: the core dot promotes both operands to f32 (core cells
    ≤127 and |q| ≤ 2^19 are both f32-exact) instead of degrading the
    dominant tier to ~2^-9 relative precision (round-2 advisor repro:
    max abs err 120 under the bf16 cast)."""
    coo = random_coo(rng, nrows=100, ncols=100, nnz=1200, dtype="int32")
    hyb = prepare_spmm(coo, SpmmConfig(backend="hybrid", hybrid_k=32))
    assert hyb.config.hybrid_dtype == "bfloat16"
    for dt, hi in ((np.int16, 1 << 10), (np.int32, 1 << 19)):
        x = rng.integers(-hi, hi, size=(100, 16)).astype(dt)
        np.testing.assert_allclose(
            np.asarray(hyb.mul(x)), _dense_ref(coo, x), rtol=0, atol=0
        )


def test_hybrid_int8_core_exact(rng):
    """int8 hub-core (s8×s8→s32 MXU path): exact integer aggregation at
    half the core bytes of bf16 — k grows √2 at a fixed HBM budget."""
    import jax.numpy as jnp

    coo = random_coo(rng, nrows=100, ncols=100, nnz=1200, dtype="int8")
    hyb = prepare_spmm(
        coo, SpmmConfig(backend="hybrid", hybrid_k=32, hybrid_dtype="int8")
    )
    assert hyb._dev["core"].dtype == jnp.int8

    x = rng.integers(-8, 9, size=(100, 16)).astype(np.int8)
    np.testing.assert_allclose(
        np.asarray(hyb.mul(x)), _dense_ref(coo, x), rtol=0, atol=0
    )

    # wider integer payloads (not int8-representable) promote to int32
    x32 = rng.integers(-500, 501, size=(100, 16)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(hyb.mul(x32)), _dense_ref(coo, x32), rtol=0, atol=0
    )

    # float payloads ride bf16 (core cells ≤127 are bf16-exact; x is not)
    xf = rng.standard_normal((100, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(hyb.mul(xf)), _dense_ref(coo, xf), rtol=3e-2, atol=3e-1
    )


def test_hybrid_int8_core_demotes_out_of_range_cells(rng):
    """Core cells outside the int8 integer range (e.g. >127 merged
    parallel edges between two hubs) are zeroed in the core and their
    edges demoted to the exact ELL tail — never silently wrapped."""
    import dataclasses

    coo = random_coo(rng, nrows=60, ncols=60, nnz=400, dtype="int32")
    # every cell lands at ±200 — all demote; result stays exact
    big = dataclasses.replace(
        coo, vals=np.full(coo.nnz, 200, dtype=np.int32)
    )
    prep = prepare_spmm(
        big, SpmmConfig(backend="hybrid", hybrid_k=32, hybrid_dtype="int8")
    )
    assert int(np.abs(np.asarray(prep._dev["core"])).max()) == 0
    x = rng.integers(-3, 4, size=(60, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)), _dense_ref(big, x), rtol=0, atol=0
    )

    # mixed case: only some cells exceed the range — exactness holds
    # with a partially-populated core
    v = coo.vals.astype(np.int32).copy()
    v[: v.size // 2] = 150
    mixed = dataclasses.replace(coo, vals=v)
    prep2 = prepare_spmm(
        mixed,
        SpmmConfig(backend="hybrid", hybrid_k=32, hybrid_dtype="int8"),
    )
    ref = mixed.to_dense().astype(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(prep2.mul(x)), ref, rtol=0, atol=0
    )


def test_hybrid_int8_core_fused_quant():
    """Fused quantize→aggregate→dequantize through the int8 core matches
    the unfused round-trip for int8 AND wider quantization dtypes."""
    rng = np.random.default_rng(99)
    import jax.numpy as jnp

    from pygim_tpu.quant import symmetric_dequantize, symmetric_quantize

    coo = random_coo(rng, nrows=300, ncols=300, nnz=4000, dtype="int8")
    cfg = SpmmConfig(
        backend="hybrid", hybrid_k=64, hybrid_dtype="int8",
        bcsr_bytes=4 << 20, bcsr_tile=8, bcsr_min_edges=3, hidden_hint=16,
    )
    prep = prepare_spmm(coo, cfg)
    x = jnp.asarray(rng.standard_normal((300, 16)), dtype=jnp.float32)
    for dtype in ("int8", "int16"):
        scale, x_q = symmetric_quantize(x, dtype)
        unfused = symmetric_dequantize(prep.mul(x_q), 1.0, scale)
        fused = prep.mul_quantized(x, dtype)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(unfused), rtol=1e-5, atol=1e-5
        )


def test_hybrid_int4_core_exact(rng):
    """Nibble-packed int4 hub-core (0.5 B/cell in HBM — k grows √2 over
    int8 at the same budget): exact for cells in [-8, 7]; the packed
    uint8 planes unpack inline into the even/odd dot pair (E8 study)."""
    import jax.numpy as jnp

    coo = random_coo(rng, nrows=100, ncols=100, nnz=1200, dtype="int8")
    hyb = prepare_spmm(
        coo, SpmmConfig(backend="hybrid", hybrid_k=32, hybrid_dtype="int4")
    )
    assert hyb._dev["core"].dtype == jnp.uint8
    assert hyb._dev["core"].shape == (32, 16)

    x = rng.integers(-8, 9, size=(100, 16)).astype(np.int8)
    np.testing.assert_allclose(
        np.asarray(hyb.mul(x)), _dense_ref(coo, x), rtol=0, atol=0
    )

    # wider integer payloads promote to int32 (exact)
    x32 = rng.integers(-500, 501, size=(100, 16)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(hyb.mul(x32)), _dense_ref(coo, x32), rtol=0, atol=0
    )

    # float payloads ride bf16
    xf = rng.standard_normal((100, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(hyb.mul(xf)), _dense_ref(coo, xf), rtol=3e-2, atol=3e-1
    )


def test_hybrid_int4_core_demotes_out_of_range_cells(rng):
    """Cells outside [-8, 7] (merged duplicate edges or wide values)
    demote to the exact ELL tail; -8 itself is representable."""
    import dataclasses

    coo = random_coo(rng, nrows=60, ncols=60, nnz=400, dtype="int32")
    v = coo.vals.astype(np.int32).copy()
    v[: v.size // 3] = 100    # demoted
    v[v.size // 3:] = -8      # kept (int4 min)
    mixed = dataclasses.replace(coo, vals=v)
    prep = prepare_spmm(
        mixed,
        SpmmConfig(backend="hybrid", hybrid_k=32, hybrid_dtype="int4"),
    )
    x = rng.integers(-3, 4, size=(60, 8)).astype(np.int32)
    ref = mixed.to_dense().astype(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)), ref, rtol=0, atol=0
    )


def test_hybrid_int4_core_fused_quant():
    """Fused quantize→aggregate→dequantize through the packed int4 core
    matches the unfused round-trip."""
    rng = np.random.default_rng(99)
    import jax.numpy as jnp

    from pygim_tpu.quant import symmetric_dequantize, symmetric_quantize

    coo = random_coo(rng, nrows=300, ncols=300, nnz=4000, dtype="int8")
    cfg = SpmmConfig(backend="hybrid", hybrid_k=64, hybrid_dtype="int4")
    prep = prepare_spmm(coo, cfg)
    x = jnp.asarray(rng.standard_normal((300, 16)), dtype=jnp.float32)
    for dtype in ("int8", "int16"):
        scale, x_q = symmetric_quantize(x, dtype)
        unfused = symmetric_dequantize(prep.mul(x_q), 1.0, scale)
        fused = prep.mul_quantized(x, dtype)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(unfused), rtol=1e-5, atol=1e-5
        )


def test_hybrid_prepare_cache(rng, tmp_path, monkeypatch):
    monkeypatch.setenv("PYGIM_TPU_DATA", str(tmp_path))
    coo = random_coo(rng, nrows=150, ncols=150, nnz=2000)
    x = rng.standard_normal((150, 16)).astype(np.float32)
    p1 = prepare_spmm(coo, SpmmConfig(backend="hybrid", hybrid_k=48))
    out1 = np.asarray(p1.mul(x))
    assert list(tmp_path.glob("hybrid-*.npz"))
    p2 = prepare_spmm(coo, SpmmConfig(backend="hybrid", hybrid_k=48))
    out2 = np.asarray(p2.mul(x))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)
    np.testing.assert_allclose(out2, _dense_ref(coo, x), rtol=1e-4, atol=1e-4)


def test_hybrid_cache_distinguishes_values(rng, tmp_path, monkeypatch):
    """Same sparsity, different edge values → different hybrid prepare
    (regression: the disk-cache fingerprint once hashed structure only)."""
    monkeypatch.setenv("PYGIM_TPU_DATA", str(tmp_path))
    coo = random_coo(rng, nrows=200, ncols=200, nnz=3000)
    import dataclasses

    coo2 = dataclasses.replace(coo, vals=(coo.vals * 3.0).astype(np.float32))
    x = rng.standard_normal((200, 16)).astype(np.float32)
    cfg = SpmmConfig(backend="hybrid", hybrid_k=64)
    out1 = np.asarray(prepare_spmm(coo, cfg).mul(x))
    out2 = np.asarray(prepare_spmm(coo2, cfg).mul(x))
    np.testing.assert_allclose(out1, _dense_ref(coo, x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out2, _dense_ref(coo2, x), rtol=1e-4, atol=1e-4)


class TestBcsrTier:
    """Hybrid BCSR middle tier (core/bcsr.py): dense (Tr,128) rank-space
    tiles between the hub core and the ELL tail.

    Graphs come from a LOCAL fixed-seed generator: the session-scoped
    ``rng`` fixture draws order-dependent graphs, and these tests assert
    structure-sensitive properties (tile qualification, bf16 tolerance)."""

    def _mid_degree_coo(self, rng, n=512, deg=24):
        rng = np.random.default_rng(1234)
        # flat-ish degree distribution: every node has ~deg neighbors
        # drawn from a small locality window → dense rank-space tiles.
        rows = np.repeat(np.arange(n), deg)
        cols = (rows + rng.integers(0, 64, size=rows.size)) % n
        vals = rng.standard_normal(rows.size).astype(np.float32)
        from pygim_tpu.core.graph import CooGraph

        return CooGraph(
            rows=rows.astype(np.int32), cols=cols.astype(np.int32),
            vals=vals, nrows=n, ncols=n,
        )

    def test_bcsr_matches_dense(self, rng):
        coo = self._mid_degree_coo(rng)
        x = rng.standard_normal((coo.ncols, 16)).astype(np.float32)
        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=0, bcsr_bytes=64 << 20,
            bcsr_tile=8, bcsr_min_edges=4, hidden_hint=16,
        )
        prep = prepare_spmm(coo, cfg)
        assert prep.has_bcsr and prep.bcsr_edges > 0
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_bcsr_with_core_and_tail(self, rng):
        # all three tiers live: hubs → core, mid band → tiles, rest → ell
        coo = self._mid_degree_coo(rng, n=400, deg=12)
        # add heavy hubs
        hub_rows = np.repeat(np.arange(8), 200)
        hub_cols = rng.integers(0, 400, size=hub_rows.size)
        import dataclasses

        from pygim_tpu.core.graph import CooGraph

        coo = CooGraph(
            rows=np.concatenate([coo.rows, hub_rows.astype(np.int32)]),
            cols=np.concatenate([coo.cols, hub_cols.astype(np.int32)]),
            vals=np.concatenate(
                [coo.vals,
                 rng.standard_normal(hub_rows.size).astype(np.float32)]
            ),
            nrows=400, ncols=400,
        )
        x = rng.standard_normal((400, 16)).astype(np.float32)
        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=64, bcsr_bytes=16 << 20,
            bcsr_tile=8, bcsr_min_edges=3, hidden_hint=16,
        )
        prep = prepare_spmm(coo, cfg)
        assert prep.hybrid_k_eff == 64 and prep.has_bcsr
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_bcsr_bf16_tiles(self, rng):
        coo = self._mid_degree_coo(rng, n=256, deg=16)
        # local fixed seed: bf16 tolerance is sensitive to the draw, and
        # the session rng's stream shifts as tests are added
        x = np.random.default_rng(7).standard_normal((256, 8)).astype(
            np.float32
        )
        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=0, hybrid_dtype="bfloat16",
            bcsr_bytes=32 << 20, bcsr_tile=8, bcsr_min_edges=4,
            hidden_hint=8,
        )
        prep = prepare_spmm(coo, cfg)
        assert prep.has_bcsr
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), _dense_ref(coo, x),
            rtol=3e-2, atol=1e-1,
        )

    def test_bcsr_off_when_no_tile_qualifies(self, rng):
        # ultra-sparse scatter: no tile reaches min_edges
        coo = random_coo(rng, nrows=300, ncols=300, nnz=400)
        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=32, bcsr_bytes=1 << 20,
            bcsr_tile=8, bcsr_min_edges=50, hidden_hint=8,
        )
        prep = prepare_spmm(coo, cfg)
        assert not prep.has_bcsr
        x = rng.standard_normal((300, 8)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_min_edges_per_tile_model(self):
        from pygim_tpu.core.bcsr import min_edges_per_tile

        # bigger hidden → pricier panel read → higher cutoff
        assert min_edges_per_tile(8, 256) > min_edges_per_tile(8, 32)
        # bf16 tiles cheaper than f32
        assert min_edges_per_tile(32, 256, 2) <= min_edges_per_tile(32, 256, 4)


class TestFusedQuant:
    """Fused quantize→aggregate→dequantize (raw_mul_quantized): the
    integer quantization is bit-exact vs the unfused round-trip (same
    round(x/scale), same integer values); the dequantized float output
    matches to f32 summation-order ulp (different XLA programs may
    vectorize the reduction differently). No (N,H) quantized copy."""

    @pytest.mark.parametrize("dtype", ["int8", "int16", "int32"])
    def test_ell_bit_identical(self, rng, dtype):
        rng = np.random.default_rng(1234)
        import jax.numpy as jnp

        from pygim_tpu.quant import symmetric_dequantize, symmetric_quantize

        coo = random_coo(rng, nrows=300, ncols=300, nnz=4000)
        prep = prepare_spmm(coo, SpmmConfig(backend="ell", hidden_hint=16))
        x = jnp.asarray(
            rng.standard_normal((300, 16)), dtype=jnp.float32
        )
        scale, x_q = symmetric_quantize(x, dtype)
        unfused = symmetric_dequantize(prep.mul(x_q), 1.0, scale)
        fused = prep.mul_quantized(x, dtype)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(unfused), rtol=1e-5, atol=1e-5
        )

    def test_hybrid_three_tier_bit_identical(self, rng):
        rng = np.random.default_rng(1234)
        import jax.numpy as jnp

        from pygim_tpu.quant import symmetric_dequantize, symmetric_quantize

        # all three tiers active (mirror of TestBcsrTier setup)
        n = 400
        rows = np.concatenate([
            np.repeat(np.arange(n), 10),
            np.repeat(np.arange(8), 150),
        ]).astype(np.int32)
        cols = np.concatenate([
            (np.repeat(np.arange(n), 10)
             + rng.integers(0, 48, n * 10)) % n,
            rng.integers(0, n, 8 * 150),
        ]).astype(np.int32)
        from pygim_tpu.core.graph import CooGraph

        coo = CooGraph(
            rows=rows, cols=cols,
            vals=rng.standard_normal(rows.size).astype(np.float32),
            nrows=n, ncols=n,
        )
        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=64, bcsr_bytes=16 << 20,
            bcsr_tile=8, bcsr_min_edges=3, hidden_hint=16,
        )
        prep = prepare_spmm(coo, cfg)
        assert prep.has_bcsr and prep.hybrid_k_eff == 64
        x = jnp.asarray(rng.standard_normal((n, 16)), dtype=jnp.float32)
        scale, x_q = symmetric_quantize(x, "int8")
        unfused = symmetric_dequantize(prep.mul(x_q), 1.0, scale)
        fused = prep.mul_quantized(x, "int8")
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(unfused), rtol=1e-5, atol=1e-5
        )

    def test_bcsr_wide_quant_computes_f32(self):
        """int16/int32 payloads (|q| up to 2^19) exceed bf16's exact
        integer range — the tile tier must compute in f32 to keep the
        fused path exact vs the true integer aggregation."""
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        n, deg = 512, 24
        rows = np.repeat(np.arange(n), deg)
        cols = (rows + rng.integers(0, 64, size=rows.size)) % n
        from pygim_tpu.core.graph import CooGraph

        coo = CooGraph(
            rows=rows.astype(np.int32), cols=cols.astype(np.int32),
            vals=np.ones(rows.size, dtype=np.int32), nrows=n, ncols=n,
        )
        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=0, bcsr_bytes=64 << 20,
            bcsr_tile=8, bcsr_min_edges=4, hidden_hint=16,
        )
        prep = prepare_spmm(coo, cfg)
        assert prep.has_bcsr
        x = rng.standard_normal((n, 16)).astype(np.float32)
        for dt, k in (("int16", 10), ("int32", 20)):
            scale = np.abs(x).max() * 2.0 / 2.0 ** k
            q = np.round(x / scale).astype(np.float64)
            ref = (coo.to_dense().astype(np.float64) @ q) * scale
            fused = np.asarray(prep.mul_quantized(jnp.asarray(x), dt))
            np.testing.assert_allclose(fused, ref, rtol=1e-6, atol=1e-6)

    def test_layer_hook_uses_fused(self, rng):
        """quantized_aggregate routes through the fused hook when the
        aggregate is a PreparedAggregate, same numbers as the plain
        callable path."""
        import jax.numpy as jnp

        from pygim_tpu.nn.layers import quantized_aggregate
        from pygim_tpu.ops.spmm import PreparedAggregate

        coo = random_coo(rng, nrows=200, ncols=200, nnz=2000)
        prep = prepare_spmm(coo, SpmmConfig(backend="ell", hidden_hint=8))
        x = jnp.asarray(rng.standard_normal((200, 8)), dtype=jnp.float32)
        agg = PreparedAggregate(prep)
        out_fused = quantized_aggregate(agg, x, "int16")
        out_plain = quantized_aggregate(lambda v: prep.mul(v), x, "int16")
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_plain),
            rtol=1e-5, atol=1e-5,
        )


def test_bcsr_rcm_order_matches_dense(rng):
    """bcsr_order='rcm' (tail locality ordering) — same numerics,
    different tile layout."""
    import jax.numpy as jnp

    n = 512
    rows = np.repeat(np.arange(n), 12)
    cols = (rows + rng.integers(0, 40, rows.size)) % n
    from pygim_tpu.core.graph import CooGraph

    coo = CooGraph(
        rows=rows.astype(np.int32), cols=cols.astype(np.int32),
        vals=rng.standard_normal(rows.size).astype(np.float32),
        nrows=n, ncols=n,
    )
    cfg = SpmmConfig(
        backend="hybrid", hybrid_k=64, bcsr_bytes=32 << 20,
        bcsr_tile=8, bcsr_min_edges=3, hidden_hint=16, bcsr_order="rcm",
    )
    prep = prepare_spmm(coo, cfg)
    assert prep.has_bcsr
    x = rng.standard_normal((n, 16)).astype(np.float32)
    ref = coo.to_dense().astype(np.float64) @ x
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)), ref, rtol=1e-4, atol=1e-4
    )


class TestBcsrPanelLayout:
    """Panel-major BCSR scheduling (bcsr_layout='panel'): one panel
    gather per column block amortized over its tiles."""

    def _coo(self, n=512, deg=20):
        rng = np.random.default_rng(77)
        rows = np.repeat(np.arange(n), deg)
        cols = (rows + rng.integers(0, 48, rows.size)) % n
        from pygim_tpu.core.graph import CooGraph

        return CooGraph(
            rows=rows.astype(np.int32), cols=cols.astype(np.int32),
            vals=rng.standard_normal(rows.size).astype(np.float32),
            nrows=n, ncols=n,
        ), rng

    def test_panel_matches_dense(self):
        coo, rng = self._coo()
        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=0, bcsr_bytes=64 << 20,
            bcsr_tile=8, bcsr_min_edges=3, hidden_hint=16,
            bcsr_layout="panel",
        )
        prep = prepare_spmm(coo, cfg)
        assert prep.has_bcsr and prep.bcsr_kind == "panel"
        x = rng.standard_normal((coo.ncols, 16)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), _dense_ref(coo, x),
            rtol=1e-4, atol=1e-4,
        )

    def test_panel_three_tier_fused_quant(self):
        coo, rng = self._coo(n=400, deg=14)
        import jax.numpy as jnp

        from pygim_tpu.quant import symmetric_dequantize, symmetric_quantize

        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=64, bcsr_bytes=32 << 20,
            bcsr_tile=8, bcsr_min_edges=3, hidden_hint=16,
            bcsr_layout="panel",
        )
        prep = prepare_spmm(coo, cfg)
        assert prep.has_bcsr and prep.hybrid_k_eff == 64
        x = jnp.asarray(
            rng.standard_normal((400, 16)), dtype=jnp.float32
        )
        scale, x_q = symmetric_quantize(x, "int8")
        unfused = symmetric_dequantize(prep.mul(x_q), 1.0, scale)
        fused = prep.mul_quantized(x, "int8")
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(unfused), rtol=1e-5, atol=1e-5
        )

    def test_panel_covers_more_at_lower_cutoff(self):
        """The panel layout's lower per-tile bar captures ≥ the edges of
        the row layout at the same budget/tile size (its raison d'être)."""
        coo, _ = self._coo(n=1024, deg=10)
        common = dict(
            backend="hybrid", hybrid_k=0, bcsr_bytes=256 << 20,
            bcsr_tile=8, hidden_hint=64,
        )
        row = prepare_spmm(coo, SpmmConfig(bcsr_layout="row", **common))
        panel = prepare_spmm(coo, SpmmConfig(bcsr_layout="panel", **common))
        row_edges = row.bcsr_edges if row.has_bcsr else 0
        assert panel.has_bcsr and panel.bcsr_edges >= row_edges


def test_ell_grouped_accumulation(rng, monkeypatch):
    """Forcing a tiny partial budget exercises the multi-group path
    (several inner scans + per-group scatter-adds, incl. a short
    remainder group); result must stay exact vs the dense reference."""
    import pygim_tpu.ops.spmm as spmm_mod

    coo = random_coo(rng, nrows=300, ncols=300, nnz=4000)
    x = rng.standard_normal((300, 32)).astype(np.float32)
    ref = _dense_ref(coo, x)
    cfg = SpmmConfig(backend="ell", ell_degree=8, block_nnz_budget=64)
    one = np.asarray(prepare_spmm(coo, cfg).mul(x))
    monkeypatch.setattr(spmm_mod, "ELL_PARTIAL_BYTES", 3 * 8 * 32 * 4)
    many = np.asarray(prepare_spmm(coo, cfg).mul(x))
    np.testing.assert_allclose(many, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(one, many)


def test_wide_int_core_dot_chunked_matches_whole(monkeypatch):
    """Wide integer payloads (int16/int32 quantization) through an
    int8/int4 core promote to int32 CHUNKED — a whole-core astype is a
    4-8x HBM temp at production core sizes. The scan-stitched product
    must equal the single-dot result exactly."""
    import jax.numpy as jnp

    from pygim_tpu.ops import spmm as spmm_mod
    from pygim_tpu.ops.spmm import _core_matmul

    rng = np.random.default_rng(11)
    k, h = 512, 8
    core8 = rng.integers(-30, 30, size=(k, k)).astype(np.int8)
    xq = rng.integers(-500, 500, size=(k, h)).astype(np.int32)
    want = core8.astype(np.int64) @ xq.astype(np.int64)

    # pack the same cells (clipped to int4 range) for the uint8 tier
    core4 = np.clip(core8, -8, 7).astype(np.int8)
    packed = ((core4[:, 0::2] & 0xF) | ((core4[:, 1::2] & 0xF) << 4)).astype(
        np.uint8
    )
    want4 = core4.astype(np.int64) @ xq.astype(np.int64)

    # tiny temp budget -> chunk=256, n_steps=2 (the scan path)
    monkeypatch.setattr(spmm_mod, "_WIDE_INT_CHUNK_BYTES", 1 << 10)
    got8 = np.asarray(_core_matmul(jnp.asarray(core8), jnp.asarray(xq),
                                   jnp.float32))
    got4 = np.asarray(_core_matmul(jnp.asarray(packed), jnp.asarray(xq),
                                   jnp.float32))
    np.testing.assert_array_equal(got8.astype(np.int64), want)
    np.testing.assert_array_equal(got4.astype(np.int64), want4)

    # and the default budget (single dot) agrees
    monkeypatch.setattr(spmm_mod, "_WIDE_INT_CHUNK_BYTES", 1 << 28)
    got8w = np.asarray(_core_matmul(jnp.asarray(core8), jnp.asarray(xq),
                                    jnp.float32))
    np.testing.assert_array_equal(got8w.astype(np.int64), want)


def test_bcsr_lp_order_recovers_latent_communities(rng):
    """bcsr_order='lp' (label propagation) recovers scrambled block
    communities that degree-rank ordering cannot see: far higher tile
    capture, same numerics (measured host-side: lp 0.85 vs rcm 0.51 vs
    rank 0.0 coverage on brmat-200k — docs/PERF.md)."""
    import jax.numpy as jnp

    from pygim_tpu.data import load_dataset

    ds = load_dataset("brmat-4000-120000-64", use_cache=False)
    g = ds.graph
    covs = {}
    for order in ("rank", "lp"):
        cfg = SpmmConfig(
            backend="hybrid", hybrid_k=0, bcsr_bytes=64 << 20,
            bcsr_tile=16, bcsr_order=order, bcsr_layout="panel",
            hidden_hint=16, bcsr_min_edges=24,
        )
        prep = prepare_spmm(g, cfg)
        covs[order] = (prep.bcsr_edges / g.nnz) if prep.has_bcsr else 0.0
        x = rng.standard_normal((g.ncols, 16)).astype(np.float32)
        out = np.asarray(prep.mul(x))
        ref = g.to_dense().astype(np.float64) @ x
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=1e-1)
    assert covs["lp"] > max(0.3, 2 * covs["rank"])


class TestInterleavedHybrid:
    """Core↔tail interleaving (PYGIM_HYBRID_INTERLEAVE=1): the dense
    core rides the tail's lax.scan as per-step row slabs — measured
    1.29x gather/MXU concurrency on v5e (tools/overlap_probe.py).
    Numerics must be unchanged: same dots, split along core rows."""

    def _graph(self, rng, n=800, about_nnz=12000):
        return _zipf_coo(rng, n=n, about_nnz=about_nnz)

    def _cfg(self, **kw):
        # big step budget => few scan steps => slab >= 8 even at k=128
        kw.setdefault("backend", "hybrid")
        kw.setdefault("hybrid_k", 128)
        kw.setdefault("block_nnz_budget", 4096)
        return SpmmConfig(**kw)

    @pytest.mark.parametrize("core_dtype", [None, "bfloat16", "int8", "int4"])
    def test_matches_plain_hybrid(self, rng, monkeypatch, core_dtype):
        coo = self._graph(rng)
        x = rng.standard_normal((coo.ncols, 16)).astype(np.float32)
        plain = prepare_spmm(coo, self._cfg(hybrid_dtype=core_dtype))
        monkeypatch.setenv("PYGIM_HYBRID_INTERLEAVE", "1")
        inter = prepare_spmm(coo, self._cfg(hybrid_dtype=core_dtype))
        assert inter.interleave is not None, "plan should engage here"
        slabs, steps, k = inter.interleave
        assert k == inter.hybrid_k_eff
        assert sum(s * n for s, n in zip(slabs, steps)) >= k
        # interleaved storage: NO 2-D core; per-table (steps, slab, cols)
        # arrays that stream through the tail scans as xs
        assert "core" not in inter._dev
        from pygim_tpu.ops.spmm import _ell_suffix

        tot = 0
        for i, (s, n) in enumerate(zip(slabs, steps)):
            c3 = inter._dev.get(f"core3d{_ell_suffix(i)}")
            if c3 is not None:
                assert c3.shape[:2] == (n, s)
                tot += n * s
        assert tot == sum(s * n for s, n in zip(slabs, steps))
        got = np.asarray(inter.mul(x))
        # the property under test: the row-slab split changes NOTHING
        # numerically vs the plain hybrid (per-dtype core exactness vs
        # the dense reference has its own tests above)
        want = np.asarray(plain.mul(x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        if core_dtype is None:  # f32 core: tight dense-reference check
            np.testing.assert_allclose(
                got, _dense_ref(coo, x), rtol=1e-4, atol=1e-4
            )

    def test_fused_quant_unpadded_output(self, rng, monkeypatch):
        coo = self._graph(rng)
        x = rng.standard_normal((coo.ncols, 8)).astype(np.float32)
        plain = prepare_spmm(coo, self._cfg(hybrid_dtype="int8"))
        monkeypatch.setenv("PYGIM_HYBRID_INTERLEAVE", "1")
        inter = prepare_spmm(coo, self._cfg(hybrid_dtype="int8"))
        assert inter.interleave is not None
        got = np.asarray(inter.mul_quantized(x, "int8"))
        want = np.asarray(plain.mul_quantized(x, "int8"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_tiny_core_skips_plan(self, rng, monkeypatch):
        monkeypatch.setenv("PYGIM_HYBRID_INTERLEAVE", "1")
        coo = self._graph(rng)
        x = rng.standard_normal((coo.ncols, 4)).astype(np.float32)
        # small step budget => many steps => slab < 8 => plan declines
        prep = prepare_spmm(
            coo, self._cfg(hybrid_k=16, block_nnz_budget=64)
        )
        assert prep.interleave is None
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)),
            _dense_ref(coo, x), rtol=2e-2, atol=2e-2,
        )


class TestChunkedOracle:
    """spmm_coo_oracle_chunked: identical math to the one-shot oracle
    with O(chunk·H) temps in BOTH directions of autodiff — the device
    that could not hold the raw oracle backward at flagship scale runs
    the trained-parity arm through this (VERDICT r4 item 4)."""

    def test_forward_matches_plain(self, rng):
        import jax.numpy as jnp

        from pygim_tpu.ops.reference import (
            spmm_coo_oracle,
            spmm_coo_oracle_chunked,
        )

        coo = _zipf_coo(rng, n=300, about_nnz=4000)
        x = jnp.asarray(
            rng.standard_normal((coo.ncols, 16)).astype(np.float32)
        )
        r, c, v = (
            jnp.asarray(coo.rows), jnp.asarray(coo.cols),
            jnp.asarray(coo.vals.astype(np.float32)),
        )
        want = np.asarray(spmm_coo_oracle(r, c, v, x, coo.nrows))
        for chunk in (1, 7, 100, 10**9):  # incl. pad-heavy and one-shot
            got = np.asarray(
                spmm_coo_oracle_chunked(r, c, v, x, coo.nrows, chunk)
            )
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_gradient_matches_plain(self, rng):
        import jax
        import jax.numpy as jnp

        from pygim_tpu.ops.reference import (
            spmm_coo_oracle,
            spmm_coo_oracle_chunked,
        )

        coo = _zipf_coo(rng, n=200, about_nnz=2500)
        x = jnp.asarray(
            rng.standard_normal((coo.ncols, 8)).astype(np.float32)
        )
        w = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
        r, c, v = (
            jnp.asarray(coo.rows), jnp.asarray(coo.cols),
            jnp.asarray(coo.vals.astype(np.float32)),
        )

        def loss(fn):
            return lambda x_: jnp.sum(
                jnp.tanh(fn(r, c, v, x_, coo.nrows)) * w
            )

        g_plain = jax.grad(loss(spmm_coo_oracle))(x)
        g_chunk = jax.grad(
            loss(
                lambda *a: spmm_coo_oracle_chunked(*a, 64)
            )
        )(x)
        np.testing.assert_allclose(
            np.asarray(g_chunk), np.asarray(g_plain), rtol=1e-5, atol=1e-5
        )

    def test_oracle_backend_config_routes_chunked(self, rng):
        coo = _zipf_coo(rng, n=200, about_nnz=2500)
        x = rng.standard_normal((coo.ncols, 8)).astype(np.float32)
        plain = prepare_spmm(coo, SpmmConfig(backend="oracle"))
        chunked = prepare_spmm(
            coo, SpmmConfig(backend="oracle", oracle_edge_chunk=128)
        )
        np.testing.assert_allclose(
            np.asarray(chunked.mul(x)), np.asarray(plain.mul(x)),
            rtol=1e-5, atol=1e-5,
        )


class TestStairCore:
    """Staircase hub-core (hybrid_shape='stair'): variable-width dense
    bands in rank space (core/stair.py — round-5 coverage study: 99.4%
    vs the square's 96.9% at equal bytes on reddit-sim). Numerics must
    match the dense reference / the square hybrid per dtype."""

    def _graph(self, rng, n=900, about_nnz=14000):
        return _zipf_coo(rng, n=n, about_nnz=about_nnz)

    @pytest.mark.parametrize("core_dtype", [None, "bfloat16", "int8", "int4"])
    def test_stair_matches_dense(self, core_dtype):
        # own fixed rng: the session-scoped fixture's stream depends on
        # which tests ran before, turning tolerance-margin draws into
        # order-dependent flakes (a 40-seed scan of this property
        # passes; determinism > breadth here)
        rng = np.random.default_rng(99)
        coo = self._graph(rng)
        x = rng.standard_normal((coo.ncols, 16)).astype(np.float32)
        prep = prepare_spmm(
            coo,
            SpmmConfig(
                backend="hybrid", hybrid_shape="stair",
                hybrid_core_bytes=1 << 18, hybrid_dtype=core_dtype,
                stair_max_bands=4,
            ),
        )
        assert prep.stair is not None and len(prep.stair) >= 1
        assert prep.hybrid_k_eff == prep.stair[-1][1]
        # bands tile contiguously from rank 0
        assert prep.stair[0][0] == 0
        for a, b in zip(prep.stair[:-1], prep.stair[1:]):
            assert a[1] == b[0]
        got = np.asarray(prep.mul(x))
        # float x through a bf16/int core computes on the MXU's bf16
        # path (core cells exact, payload rounded) — loose tol there
        tol = 1e-4 if core_dtype is None else 5e-2
        np.testing.assert_allclose(
            got, _dense_ref(coo, x), rtol=tol, atol=tol
        )

    def test_stair_beats_square_coverage(self):
        """The point of the shape: at equal bytes the stair tail holds
        no more (usually fewer) edges than the square's. Own fixed rng
        (the session-scoped fixture's stream depends on test order) and
        a graph big enough for the planner's 192-bin rank grid — at toy
        scales the grid/merge approximation can lose to the square,
        which is a planner-resolution artifact, not the property under
        test."""
        rng = np.random.default_rng(20260821)
        coo = self._graph(rng, n=6000, about_nnz=120000)
        budget = 1 << 22
        sq = prepare_spmm(
            coo,
            SpmmConfig(backend="hybrid", hybrid_core_bytes=budget),
        )
        st = prepare_spmm(
            coo,
            SpmmConfig(
                backend="hybrid", hybrid_shape="stair",
                hybrid_core_bytes=budget,
            ),
        )

        from pygim_tpu.ops.spmm import _ell_suffix

        def tail_edges(prep):
            return sum(
                int(
                    (np.asarray(
                        prep._dev[f"vals2d{_ell_suffix(i)}"]
                    ) != 0).sum()
                )
                for i in range(len(prep.ell_meta))
            )

        assert tail_edges(st) <= tail_edges(sq)

    def test_stair_fused_quant(self, rng):
        coo = self._graph(rng)
        x = rng.standard_normal((coo.ncols, 8)).astype(np.float32)
        cfg = dict(
            backend="hybrid", hybrid_core_bytes=1 << 18,
            hybrid_dtype="int8",
        )
        plain = prepare_spmm(coo, SpmmConfig(**cfg))
        st = prepare_spmm(
            coo, SpmmConfig(hybrid_shape="stair", **cfg)
        )
        got = np.asarray(st.mul_quantized(x, "int8"))
        want = np.asarray(plain.mul_quantized(x, "int8"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_stair_int_demotion_exact(self, rng):
        """Cells not representable in int8 must demote to the tail and
        keep the product exact (same contract as the square core)."""
        from pygim_tpu.core.graph import CooGraph

        n = 400
        rng2 = np.random.default_rng(7)
        rows = rng2.integers(0, n, 6000)
        cols = rng2.integers(0, n, 6000)
        # heavy duplicates on a few hub pairs -> merged cells > 127
        rows[:2000] = 0
        cols[:2000] = 1
        coo = CooGraph.from_edges(rows, cols, nrows=n, ncols=n)
        x = rng2.standard_normal((n, 8)).astype(np.float32)
        prep = prepare_spmm(
            coo,
            SpmmConfig(
                backend="hybrid", hybrid_shape="stair",
                hybrid_core_bytes=1 << 16, hybrid_dtype="int8",
            ),
        )
        np.testing.assert_allclose(
            np.asarray(prep.mul(x)), _dense_ref(coo, x),
            rtol=5e-2, atol=5e-2,  # bf16 payload path (cells exact)
        )
