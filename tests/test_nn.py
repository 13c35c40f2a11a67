"""Quantization + GNN layer/model tests vs plain-float references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygim_tpu.nn import layers as L
from pygim_tpu.nn.models import make_gnn
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm
from pygim_tpu.quant import symmetric_dequantize, symmetric_quantize
from tests.conftest import random_coo


def test_quantize_int8_roundtrip(rng):
    v = jnp.asarray(rng.standard_normal((64, 16)), dtype=jnp.float32)
    scale, vq = symmetric_quantize(v, "int8")
    assert vq.dtype == jnp.int8
    # payload bounded by 2^4 (scale exponent 5): quantize.py:22-23
    assert int(jnp.max(jnp.abs(vq))) <= 16
    back = symmetric_dequantize(vq.astype(jnp.float32), 1.0, scale)
    # quantization step = scale -> error bounded by scale/2
    assert float(jnp.max(jnp.abs(back - v))) <= float(scale) / 2 + 1e-7


@pytest.mark.parametrize("dtype,exp", [("int8", 5), ("int16", 10), ("int32", 20)])
def test_quantize_scale_exponents(rng, dtype, exp):
    v = jnp.asarray(rng.standard_normal(100), dtype=jnp.float32)
    scale, _ = symmetric_quantize(v, dtype)
    expected = float(jnp.max(jnp.abs(v))) * 2 / 2**exp
    np.testing.assert_allclose(float(scale), expected, rtol=1e-6)


def test_quantize_float_passthrough(rng):
    v = jnp.asarray(rng.standard_normal(50), dtype=jnp.float32)
    scale, vq = symmetric_quantize(v, "float32")
    assert vq.dtype == jnp.float32  # rounded but kept float (quantize.py:28-31)
    np.testing.assert_allclose(np.asarray(vq), np.round(np.asarray(v) / scale))


def test_quantize_zero_input_safe():
    scale, vq = symmetric_quantize(jnp.zeros((4, 4)), "int8")
    assert np.all(np.isfinite(np.asarray(vq)))
    np.testing.assert_array_equal(np.asarray(vq), 0)


def test_quantized_aggregate_close_to_exact(rng):
    coo = random_coo(rng, nrows=80, ncols=80, nnz=800)
    prep = prepare_spmm(coo, SpmmConfig(backend="blocked", n_blocks=3))
    x = jnp.asarray(rng.standard_normal((80, 32)), dtype=jnp.float32)
    exact = np.asarray(prep.mul(x))
    # int32 quantization (k=20) should be near-exact
    quant = np.asarray(L.quantized_aggregate(prep.mul, x, "int32"))
    np.testing.assert_allclose(quant, exact, rtol=1e-3, atol=1e-3)
    # int8 (k=5) is coarse but should correlate strongly
    q8 = np.asarray(L.quantized_aggregate(prep.mul, x, "int8"))
    corr = np.corrcoef(q8.ravel(), exact.ravel())[0, 1]
    assert corr > 0.98


@pytest.mark.parametrize("conv", ["gcn", "sage", "gin"])
def test_models_run_and_match_oracle_aggregate(rng, conv):
    n, f_in, h, f_out = 60, 12, 16, 5
    coo = random_coo(rng, nrows=n, ncols=n, nnz=400)
    prep_blocked = prepare_spmm(coo, SpmmConfig(backend="blocked", n_blocks=2))
    prep_oracle = prepare_spmm(coo, SpmmConfig(backend="oracle"))
    x = jnp.asarray(rng.standard_normal((n, f_in)), dtype=jnp.float32)
    model = make_gnn(jax.random.key(0), conv, f_in, h, f_out)
    out_b = np.asarray(model.apply(x, prep_blocked.mul))
    out_o = np.asarray(model.apply(x, prep_oracle.mul))
    assert out_b.shape == (n, f_out)
    np.testing.assert_allclose(out_b, out_o, rtol=1e-4, atol=1e-4)


def test_model_forward_jits(rng):
    n, f_in, h, f_out = 40, 8, 16, 3
    coo = random_coo(rng, nrows=n, ncols=n, nnz=200)
    prep = prepare_spmm(coo, SpmmConfig(backend="blocked", n_blocks=2))
    model = make_gnn(jax.random.key(1), "gcn", f_in, h, f_out, agg_dtype="int32")
    fwd = jax.jit(lambda x: model.apply(x, prep.mul))
    x = jnp.asarray(rng.standard_normal((n, f_in)), dtype=jnp.float32)
    out = np.asarray(fwd(x))
    ref = np.asarray(model.apply(x, prep.mul))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_dropout_training_mode(rng):
    x = jnp.ones((100, 50))
    y = L.dropout(jax.random.key(0), x, 0.5, True)
    kept = float(jnp.mean(y != 0))
    assert 0.35 < kept < 0.65
    np.testing.assert_allclose(
        np.asarray(y[y != 0]), 2.0, rtol=1e-6
    )  # inverted scaling
    # eval mode: identity
    np.testing.assert_array_equal(np.asarray(L.dropout(None, x, 0.5, False)), 1.0)


def test_model_with_hybrid_aggregate(rng):
    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

    n, f_in, h, f_out = 120, 12, 16, 4
    coo = random_coo(rng, nrows=n, ncols=n, nnz=1500)
    hyb = prepare_spmm(coo, SpmmConfig(backend="hybrid", hybrid_k=32))
    oracle = prepare_spmm(coo, SpmmConfig(backend="oracle"))
    model = make_gnn(jax.random.key(2), "gcn", f_in, h, f_out)
    x = jnp.asarray(rng.standard_normal((n, f_in)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(x, hyb.mul)),
        np.asarray(model.apply(x, oracle.mul)),
        rtol=1e-4, atol=1e-4,
    )


def test_jit_with_dev_arrays_threading(rng):
    """The remote-backend-safe pattern: tables as jit arguments."""
    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

    n = 80
    coo = random_coo(rng, nrows=n, ncols=n, nnz=500)
    prep = prepare_spmm(coo, SpmmConfig(backend="ell"))
    model = make_gnn(jax.random.key(0), "gcn", 8, 16, 3)
    dev = prep.dev_arrays
    fwd = jax.jit(
        lambda x, dev: model.apply(x, lambda v: prep.raw_mul(v, dev))
    )
    x = jnp.asarray(rng.standard_normal((n, 8)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fwd(x, dev)),
        np.asarray(model.apply(x, prep.mul)),
        rtol=1e-5, atol=1e-5,
    )


def test_train_step_threaded_matches_closure(rng):
    import optax

    from pygim_tpu.nn.train import make_train_step, make_train_step_threaded
    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

    n, f = 60, 8
    coo = random_coo(rng, nrows=n, ncols=n, nnz=300)
    prep = prepare_spmm(coo, SpmmConfig(backend="ell"))
    model = make_gnn(jax.random.key(0), "gcn", f, 16, 3)
    opt = optax.sgd(1e-2)
    s0 = opt.init(model.params)
    x = jnp.asarray(rng.standard_normal((n, f)), dtype=jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, n))
    m = jnp.ones((n,), dtype=jnp.float32)
    key = jax.random.key(7)

    closure_step = jax.jit(make_train_step(model, prep.mul, opt))
    p1, _, l1 = closure_step(model.params, s0, x, y, m, key)
    threaded, dev = make_train_step_threaded(model, prep, opt)
    p2, _, l2 = jax.jit(threaded)(model.params, s0, x, y, m, key, dev)
    assert abs(float(l1) - float(l2)) < 1e-6
    np.testing.assert_allclose(
        np.asarray(p1["ln1"]["w"]), np.asarray(p2["ln1"]["w"]), rtol=1e-6
    )


@pytest.mark.parametrize("use_orbax", [False, True])
def test_checkpoint_orbax_and_npz(tmp_path, use_orbax):
    """Both checkpoint formats roundtrip params + optimizer state."""
    if use_orbax:
        pytest.importorskip("orbax.checkpoint")
    import optax

    from pygim_tpu.nn.checkpoint import restore_checkpoint, save_checkpoint
    from pygim_tpu.nn.models import make_gnn

    model = make_gnn(jax.random.key(0), "gcn", 8, 16, 4)
    opt = optax.adam(1e-3)
    opt_state = opt.init(model.params)
    save_checkpoint(
        tmp_path / "ck", model.params, step=7,
        extra={"opt_state": opt_state}, use_orbax=use_orbax,
    )
    tmpl = jax.tree_util.tree_map(jnp.zeros_like, model.params)
    opt_tmpl = jax.tree_util.tree_map(jnp.zeros_like, opt_state)
    params, extra, step = restore_checkpoint(
        tmp_path / "ck", tmpl, extra_template={"opt_state": opt_tmpl}
    )
    assert step == 7
    import chex

    chex.assert_trees_all_close(params, model.params)
    chex.assert_trees_all_close(extra["opt_state"], opt_state)


def test_checkpoint_rejects_structure_mismatch(tmp_path):
    """A checkpoint restored into a structurally different template must
    raise, even when leaf count and shapes coincide (same-shape square
    weights would otherwise restore positionally into the wrong slots)."""
    from pygim_tpu.nn.checkpoint import restore_checkpoint, save_checkpoint

    params = {"a": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4, 4))}}
    save_checkpoint(tmp_path / "ck", params, step=1, use_orbax=False)
    renamed = {"z": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4, 4))}}
    with pytest.raises(ValueError, match="structure"):
        restore_checkpoint(tmp_path / "ck", renamed)


def test_checkpoint_restores_legacy_bare_params(tmp_path):
    """Round-1 checkpoints saved the BARE params pytree (no {'params': ...}
    wrapper, no "format" key in meta) — restore must still accept them."""
    import json

    import jax
    import numpy as np

    from pygim_tpu.nn.checkpoint import restore_checkpoint

    params = {"w1": np.ones((3, 2), np.float32), "b": np.zeros(2, np.float32)}
    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez(tmp_path / "params.npz",
             **{f"p{i}": a for i, a in enumerate(flat)})
    (tmp_path / "meta.json").write_text(json.dumps(
        {"step": 7, "n_leaves": len(flat), "treedef": str(treedef)}
    ))
    template = {"w1": np.zeros((3, 2), np.float32),
                "b": np.zeros(2, np.float32)}
    restored, step = restore_checkpoint(tmp_path, template)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["w1"]),
                                  params["w1"])
