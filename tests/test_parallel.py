"""2D mesh SpMM on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygim_tpu.nn.models import make_gnn
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm
from pygim_tpu.parallel import make_mesh, prepare_spmm_2d
from tests.conftest import random_coo


def _dense_ref(coo, x):
    return coo.to_dense().astype(np.float64) @ x.astype(np.float64)


@pytest.mark.parametrize("sp,ds", [(1, 1), (2, 4), (4, 2), (8, 1), (1, 8)])
def test_2d_spmm_matches_dense(rng, sp, ds):
    coo = random_coo(rng, nrows=130, ncols=117, nnz=1200)
    x = rng.standard_normal((117, 40)).astype(np.float32)
    mesh = make_mesh(sp, ds)
    prep = prepare_spmm_2d(coo, mesh, SpmmConfig(n_blocks=3))
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_allclose(out, _dense_ref(coo, x), rtol=1e-4, atol=1e-4)


def test_2d_matches_single_chip(rng):
    coo = random_coo(rng, nrows=96, ncols=96, nnz=800)
    x = rng.standard_normal((96, 32)).astype(np.float32)
    single = prepare_spmm(coo, SpmmConfig(backend="blocked", n_blocks=4))
    mesh = make_mesh(2, 2)
    dist = prepare_spmm_2d(coo, mesh, SpmmConfig(n_blocks=4))
    np.testing.assert_allclose(
        np.asarray(dist.mul(jnp.asarray(x))),
        np.asarray(single.mul(jnp.asarray(x))),
        rtol=1e-5, atol=1e-5,
    )


def test_2d_int32_quantized(rng):
    coo = random_coo(rng, nrows=64, ncols=64, nnz=500, dtype="int32")
    x = rng.integers(-5, 6, size=(64, 16)).astype(np.int32)
    mesh = make_mesh(4, 2)
    prep = prepare_spmm_2d(coo, mesh, SpmmConfig())
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_array_equal(out, _dense_ref(coo, x).astype(np.int64))


def test_2d_output_sharding(rng):
    coo = random_coo(rng, nrows=64, ncols=64, nnz=400)
    mesh = make_mesh(2, 4)
    prep = prepare_spmm_2d(coo, mesh)
    x = jnp.asarray(rng.standard_normal((64, 24)).astype(np.float32))
    out = prep.mul(x)
    # output features sharded over ds, rows unsharded
    assert out.shape == (64, 24)


def test_model_over_2d_mesh(rng):
    n, f_in, h, f_out = 80, 16, 32, 4
    coo = random_coo(rng, nrows=n, ncols=n, nnz=600)
    mesh = make_mesh(2, 2)
    dist = prepare_spmm_2d(coo, mesh)
    single = prepare_spmm(coo, SpmmConfig(backend="oracle"))
    model = make_gnn(jax.random.key(0), "gcn", f_in, h, f_out, agg_dtype="int32")
    x = jnp.asarray(rng.standard_normal((n, f_in)), dtype=jnp.float32)
    out_d = np.asarray(model.apply(x, dist.mul))
    out_s = np.asarray(model.apply(x, single.mul))
    np.testing.assert_allclose(out_d, out_s, rtol=1e-4, atol=1e-4)


def test_mesh_too_small_raises():
    with pytest.raises(ValueError):
        make_mesh(4, 4)  # 16 > 8 virtual devices


@pytest.mark.parametrize("sp,ds", [(2, 2), (4, 1), (2, 4)])
def test_2d_hybrid_matches_dense(rng, sp, ds):
    """Distributed hybrid: core column-sharded over sp, merged by psum."""
    coo = random_coo(rng, nrows=150, ncols=150, nnz=2500)
    x = rng.standard_normal((150, 24)).astype(np.float32)
    mesh = make_mesh(sp, ds)
    prep = prepare_spmm_2d(
        coo, mesh, SpmmConfig(backend="hybrid", hybrid_k=48)
    )
    assert prep.hybrid_k_eff == 48
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_allclose(out, _dense_ref(coo, x), rtol=1e-4, atol=1e-4)


def test_2d_hybrid_hub_heavy(rng):
    from pygim_tpu.core.graph import CooGraph

    n = 120
    hub_r = rng.integers(0, 10, 3000)
    hub_c = rng.integers(0, 10, 3000)
    t_r = rng.integers(0, n, 300)
    t_c = rng.integers(0, n, 300)
    coo = CooGraph.from_edges(
        np.concatenate([hub_r, t_r]), np.concatenate([hub_c, t_c]),
        rng.standard_normal(3300), nrows=n, ncols=n,
    )
    x = rng.standard_normal((n, 16)).astype(np.float32)
    prep = prepare_spmm_2d(
        coo, make_mesh(4, 2), SpmmConfig(backend="hybrid", hybrid_k=16)
    )
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_2d_hybrid_bf16_core(rng):
    coo = random_coo(rng, nrows=100, ncols=100, nnz=1500)
    x = rng.standard_normal((100, 16)).astype(np.float32)
    prep = prepare_spmm_2d(
        coo, make_mesh(2, 2),
        SpmmConfig(backend="hybrid", hybrid_k=32, hybrid_dtype="bfloat16"),
    )
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=3e-2, atol=1e-1,
    )


@pytest.mark.parametrize("sp,ds", [(2, 2), (4, 2)])
def test_2d_scatter_output(rng, sp, ds):
    """reduce-scatter merge: fully sharded output, same values."""
    coo = random_coo(rng, nrows=130, ncols=130, nnz=1500)
    x = rng.standard_normal((130, 16)).astype(np.float32)
    mesh = make_mesh(sp, ds)
    prep = prepare_spmm_2d(coo, mesh, scatter_output=True)
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_allclose(out, _dense_ref(coo, x), rtol=1e-4, atol=1e-4)


def test_2d_scatter_output_hybrid(rng):
    coo = random_coo(rng, nrows=90, ncols=90, nnz=900)
    x = rng.standard_normal((90, 8)).astype(np.float32)
    prep = prepare_spmm_2d(
        coo, make_mesh(2, 2),
        SpmmConfig(backend="hybrid", hybrid_k=24), scatter_output=True,
    )
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_2d_raw_mul_one_program(rng):
    """dev_arrays/raw_mul contract on the mesh path: a 2-layer forward
    (two aggregates + dense math) compiles as ONE jitted program."""
    import jax
    import jax.numpy as jnp

    from pygim_tpu.parallel.mesh import make_mesh
    from pygim_tpu.parallel.spmm_2d import prepare_spmm_2d

    coo = random_coo(rng, nrows=96, ncols=96, nnz=600)
    prep = prepare_spmm_2d(coo, make_mesh(2, 4), SpmmConfig(backend="ell"))
    w = rng.standard_normal((16, 16)).astype(np.float32)
    dev = prep.dev_arrays

    @jax.jit
    def fwd(x, w, dev):
        h = jax.nn.relu(prep.raw_mul(x, dev) @ w)
        return prep.raw_mul(h, dev)

    x = rng.standard_normal((96, 16)).astype(np.float32)
    ref = np.asarray(coo.to_dense(), dtype=np.float64)
    expect = ref @ np.maximum(ref @ x @ w, 0)
    np.testing.assert_allclose(
        np.asarray(fwd(jnp.asarray(x), jnp.asarray(w), dev)), expect,
        rtol=1e-3, atol=1e-3,
    )
    # mul() itself matches too (same traced path)
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), ref @ x, rtol=1e-4, atol=1e-4
    )


def test_halo_raw_mul_one_program(rng):
    import jax
    import jax.numpy as jnp

    from pygim_tpu.parallel.halo import make_node_mesh, prepare_spmm_halo

    coo = random_coo(rng, nrows=64, ncols=64, nnz=400)
    prep = prepare_spmm_halo(coo, make_node_mesh(4), SpmmConfig(n_blocks=1))
    dev = prep.dev_arrays

    @jax.jit
    def fwd(x, dev):
        return prep.raw_mul(jax.nn.relu(prep.raw_mul(x, dev)), dev)

    x = rng.standard_normal((64, 8)).astype(np.float32)
    ref = np.asarray(coo.to_dense(), dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(fwd(jnp.asarray(x), dev)),
        ref @ np.maximum(ref @ x, 0), rtol=1e-3, atol=1e-3,
    )


def test_2d_hybrid_scatter_phase_times(rng):
    """phase_times on the 2d mesh with hybrid core + reduce-scatter
    output (all options composed)."""
    from pygim_tpu.parallel.mesh import make_mesh
    from pygim_tpu.parallel.spmm_2d import prepare_spmm_2d

    coo = random_coo(rng, nrows=96, ncols=96, nnz=700)
    prep = prepare_spmm_2d(
        coo, make_mesh(4, 2),
        SpmmConfig(backend="hybrid", hybrid_k=16),
        scatter_output=True,
    )
    x = jnp.asarray(
        rng.standard_normal((96, 8)), dtype=jnp.float32
    )
    ph = prep.phase_times(x, iters=1)
    assert ph["psum_time(ms)"] >= 0
    np.testing.assert_allclose(
        np.asarray(prep.mul(x)),
        coo.to_dense().astype(np.float64) @ np.asarray(x, np.float64),
        rtol=1e-3, atol=1e-3,
    )


@pytest.mark.parametrize("core_dtype", ["int8", "int4"])
def test_2d_hybrid_integer_cores(rng, core_dtype):
    """int8 and nibble-packed int4 cores on the 2D mesh: per-shard slabs
    convert/pack to the stored dtype (demoting non-representable cells to
    the tail), and the run's even/odd dot pair matches the dense oracle.
    int4 = the autotuner's products-winning tier (docs/PERF.md E8)."""
    from pygim_tpu.core.graph import CooGraph

    n = 120
    # integer-valued graph with some cells outside int4 range (multi-edges)
    r = rng.integers(0, n, 4000)
    c = rng.integers(0, n, 4000)
    hub_r = np.zeros(40, dtype=r.dtype)  # 40 parallel edges: cell = 40 > 7
    hub_c = np.ones(40, dtype=c.dtype)
    coo = CooGraph.from_edges(
        np.concatenate([r, hub_r]), np.concatenate([c, hub_c]),
        np.ones(4040, dtype=np.float32), nrows=n, ncols=n,
    )
    x = rng.standard_normal((n, 16)).astype(np.float32)
    prep = prepare_spmm_2d(
        coo, make_mesh(2, 2),
        SpmmConfig(backend="hybrid", hybrid_k=32, hybrid_dtype=core_dtype),
    )
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=3e-2, atol=1e-1,  # float payload rides bf16 through the core
    )


def _community_coo(rng, n=512, blk=128, deg=12, shuffle=False):
    """Block-community graph (see tests/test_tune.py::TestBcsrTuning)."""
    from pygim_tpu.core.graph import CooGraph

    rows = np.repeat(np.arange(n), deg)
    cols = (rows // blk) * blk + rng.integers(0, blk, rows.size)
    if shuffle:
        relabel = rng.permutation(n)
        rows, cols = relabel[rows], relabel[cols]
    return CooGraph.from_edges(
        rows, cols, rng.standard_normal(rows.size), nrows=n, ncols=n
    )


@pytest.mark.parametrize("sp,ds", [(2, 2), (4, 2)])
def test_2d_bcsr_matches_dense(rng, sp, ds):
    """BCSR middle tier over the mesh: per-shard column ranking keeps
    panel gathers inside the owning x-shard; captured edges leave the
    ELL tail; partials merge through the same psum."""
    coo = _community_coo(rng)
    x = rng.standard_normal((coo.nrows, 24)).astype(np.float32)
    prep = prepare_spmm_2d(
        coo, make_mesh(sp, ds),
        SpmmConfig(
            backend="hybrid", hybrid_k=32, bcsr_bytes=8 << 20,
            bcsr_tile=8, bcsr_min_edges=2,
        ),
    )
    assert prep.has_bcsr and prep.bcsr_edges > 0
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_2d_bcsr_lp_order(rng):
    """The lp tile ordering works on the mesh: the global tail reorder
    feeds per-shard column rankings (tail_tile_order shared with the
    single-chip prepare)."""
    coo = _community_coo(rng, shuffle=True)
    x = rng.standard_normal((coo.nrows, 16)).astype(np.float32)
    prep = prepare_spmm_2d(
        coo, make_mesh(4, 1),
        SpmmConfig(
            backend="hybrid", hybrid_k=32, bcsr_bytes=8 << 20,
            bcsr_tile=8, bcsr_min_edges=2, bcsr_order="lp",
        ),
    )
    assert prep.has_bcsr
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_2d_bcsr_tileless_shards(rng):
    """Shards whose columns hold no qualifying tile get zero-padded dummy
    tables and contribute nothing through the tier."""
    from pygim_tpu.core.graph import CooGraph

    n = 512
    # dense community in shard 0's column range only + uniform noise
    dr = rng.integers(0, 64, 6000)
    dc = rng.integers(0, 64, 6000)
    tr_ = rng.integers(0, n, 800)
    tc_ = rng.integers(0, n, 800)
    coo = CooGraph.from_edges(
        np.concatenate([dr, tr_]), np.concatenate([dc, tc_]),
        rng.standard_normal(6800), nrows=n, ncols=n,
    )
    x = rng.standard_normal((n, 16)).astype(np.float32)
    prep = prepare_spmm_2d(
        coo, make_mesh(4, 2),
        SpmmConfig(
            backend="hybrid", hybrid_k=8, bcsr_bytes=8 << 20,
            bcsr_tile=8, bcsr_min_edges=24,
        ),
    )
    assert prep.has_bcsr
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), _dense_ref(coo, x),
        rtol=1e-4, atol=1e-4,
    )


def test_2d_bcsr_wide_int_exact(rng):
    """Integer payloads through the mesh tier stay exact (f32 compute
    for wide quantized x, matching the single-chip run builder)."""
    coo = _community_coo(rng)
    import dataclasses

    coo = dataclasses.replace(
        coo, vals=rng.integers(-3, 4, coo.nnz).astype(np.float32)
    )
    x = rng.integers(-5, 6, size=(coo.nrows, 16)).astype(np.int32)
    prep = prepare_spmm_2d(
        coo, make_mesh(2, 2),
        SpmmConfig(
            backend="hybrid", hybrid_k=32, bcsr_bytes=8 << 20,
            bcsr_tile=8, bcsr_min_edges=2,
        ),
    )
    assert prep.has_bcsr
    out = np.asarray(prep.mul(jnp.asarray(x)))
    np.testing.assert_array_equal(out, _dense_ref(coo, x))


def _zipf_coo(rng, n=800, about_nnz=12000):
    """Power-law degree graph (same shape as tests/test_spmm.py) — makes
    the shared multi-degree planner pick >1 table."""
    from pygim_tpu.core.graph import CooGraph

    deg = np.minimum(rng.zipf(1.4, n), 400)
    deg = (deg * (about_nnz / deg.sum())).astype(np.int64) + 1
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    return CooGraph.from_edges(rows, cols, nrows=n, ncols=n)


def test_2d_multi_degree_tables_match_dense(rng):
    """Shared multi-degree ELL tables over the sp mesh (round 4): the
    degrees come from the COMBINED histogram and every shard materializes
    every table, so shapes stay SPMD-uniform."""
    coo = _zipf_coo(rng)
    x = rng.standard_normal((coo.ncols, 16)).astype(np.float32)
    mesh = make_mesh(4, 2)
    prep = prepare_spmm_2d(coo, mesh, SpmmConfig(block_nnz_budget=512))
    assert len(prep.ell_meta) >= 2, "zipf graph should pick >1 table"
    ref = coo.to_dense().astype(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(prep.mul(jnp.asarray(x))), ref, rtol=1e-4, atol=1e-4
    )
