"""Benchmark bodies — the in-process equivalents of the reference entry
scripts ``spmm_test.py`` and ``inference.py``.

Both report through the ``[DATA]`` protocol with the reference's key names
(``torch_time(ms)`` becomes ``ref_time(ms)``; ``pim_time_spmm(ms)``,
``prepare_pim_time(ms)``, ``infer_time(ms)``, ``test_acc`` keep their
roles — spmm_test.py:19-37, inference.py:20-41).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pygim_tpu.data import GraphDataset
from pygim_tpu.nn.models import make_gnn
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm
from pygim_tpu.utils.metrics import DataReporter
from pygim_tpu.utils.timers import device_time


def spmm_model_bytes(nnz: int, nrows: int, hidden: int, dtype_bytes: int = 4):
    """Standard SpMM traffic model: per-edge index+value stream, one dense
    row read per edge (no reuse credit), one output write per row."""
    return nnz * (4 + dtype_bytes) + nnz * hidden * dtype_bytes \
        + nrows * hidden * dtype_bytes


def run_spmm_benchmark(
    ds: GraphDataset,
    *,
    hidden: int = 256,
    dtype: str = "float32",
    config: Optional[SpmmConfig] = None,
    repeat: int = 3,
    verify: bool = True,
    reporter: Optional[DataReporter] = None,
    mesh=None,
    prepare_fn=None,
    phases: bool = False,
) -> dict:
    """SpMM micro-benchmark (spmm_test.py analog): times the prepared
    backend against the jnp oracle and cross-checks numerics.
    ``prepare_fn(graph, config) -> prep`` overrides the default dispatch
    (used by the entry scripts' ``--version`` routing, compat.py)."""
    rep = reporter or DataReporter()
    # synthetic stand-ins must be distinguishable from real graphs in every
    # ledger record (VERDICT r2: accuracy/time on a *-sim graph is not a
    # real-dataset claim)
    rep.report("data_source", "synthetic" if ds.synthetic else "real")
    rng = np.random.default_rng(0)
    graph = ds.graph
    if dtype.startswith("int"):
        # random integer features, as spmm_test.py:70
        x_np = rng.integers(-10, 11, (graph.ncols, hidden))
    else:
        x_np = rng.standard_normal((graph.ncols, hidden))
    x = jnp.asarray(x_np, dtype=dtype)
    graph = _cast_graph(graph, dtype)

    t0 = time.perf_counter()
    if prepare_fn is not None:
        prep = prepare_fn(graph, config)
    elif mesh is not None:
        from pygim_tpu.parallel import prepare_spmm_2d

        prep = prepare_spmm_2d(graph, mesh, config)
    else:
        prep = prepare_spmm(graph, config or SpmmConfig())
    prep_s = time.perf_counter() - t0
    rep.report("prepare_pim_time(ms)", prep_s * 1e3)
    for ph, sec in getattr(
        getattr(prep, "prepare_timer", None), "acc", {}
    ).items():
        # host-side prepare sub-phases (timer.c slot analog)
        rep.report(f"prepare_{ph}_time(ms)", sec * 1e3)
    from pygim_tpu.compat import describe_layout

    rep.report("layout", describe_layout(prep))
    # the reference's load_sparse_time: sparse operand movement to device
    # memory. Here the device_put happens inside prepare (prepare-once);
    # report the same number so parse_results' pim_time_dense derivation
    # (pim_time_spmm − load_sparse_time) stays meaningful — and 0 for the
    # run path, which never re-copies the sparse operand (SURVEY §7
    # non-goal: grande's per-run re-copy).
    rep.report("load_sparse_time(ms)", 0.0)

    dt = device_time(prep.mul, x, iters=repeat)
    rep.report("pim_time_spmm(ms)", dt * 1e3)
    if phases and hasattr(prep, "phase_times"):
        # per-phase breakdown (the reference's 5 timer slots,
        # spmm_mul_csr.c:563-580) — each phase compiles its own program,
        # so this is opt-in
        for k, v in prep.phase_times(x, iters=repeat).items():
            if k != "mul_time(ms)":
                rep.report(k, v)
    model_bytes = spmm_model_bytes(
        graph.nnz, graph.nrows, hidden, jnp.dtype(dtype).itemsize
    )
    rep.report("spmm_effective_GBps", model_bytes / dt / 1e9)
    rep.report("edges_per_s", graph.nnz / dt)
    # dual accounting (VERDICT r4): the headline credits the RAW stored
    # edge stream (multigraphs: duplicates merged at prepare do less
    # work); report the unique-edge-credited number beside it so neither
    # needs a footnote. Equal on simple graphs.
    nnz_unique = int(getattr(prep, "nnz", graph.nnz))
    rep.report(
        "spmm_effective_GBps_unique",
        spmm_model_bytes(
            nnz_unique, graph.nrows, hidden, jnp.dtype(dtype).itemsize
        ) / dt / 1e9,
    )

    if verify:
        cfg = getattr(prep, "config", None)
        # a reduced-precision core computes float payloads in bf16 —
        # true for a bfloat16 core AND an int8/int4 core fed floats (the
        # integer cells are exact, but the payload is cast to bf16 for
        # the MXU); int payloads through an int8/int4 core stay
        # exact-integer
        loose = (
            cfg is not None and cfg.backend == "hybrid"
            and (
                cfg.hybrid_dtype == "bfloat16"
                or (cfg.hybrid_dtype in ("int8", "int4")
                    and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating))
            )
        )
        ok = _verify_against_oracle(
            graph, prep, x, rng, rtol=1e-2 if loose else 1e-4
        )
        rep.report("verify", "OK" if ok else "ERROR")
        if not ok:
            raise AssertionError("SpMM backend mismatch vs oracle")

    # oracle timing only when affordable (one-shot gather materializes nnz×H)
    if graph.nnz * hidden <= 2 ** 27:
        oracle = prepare_spmm(graph, SpmmConfig(backend="oracle"))
        rep.report("ref_time(ms)", device_time(oracle.mul, x, iters=repeat) * 1e3)
    return rep.means()


def _cast_graph(graph, dtype: str):
    import dataclasses as _dc

    want = np.dtype(dtype if dtype != "bfloat16" else "float32")
    if graph.vals.dtype == want:
        return graph
    return _dc.replace(graph, vals=graph.vals.astype(want))


def _verify_against_oracle(
    graph, prep, x, rng, rows_to_check: int = 256, rtol: float = 1e-4
):
    """Spot-check against a NumPy CSR reference on sampled rows (cheap even
    for 100M-edge graphs) — the spmm_host_csr comparison of
    spmm_mul_csr.c:414-477, minus the comment markers."""
    csr = graph.to_csr() if not hasattr(graph, "rowptr") else graph
    out = np.asarray(prep.mul(x))
    xs = np.asarray(x)
    rows = rng.choice(csr.nrows, min(rows_to_check, csr.nrows), replace=False)
    for r in rows:
        e0, e1 = int(csr.rowptr[r]), int(csr.rowptr[r + 1])
        ref = (
            xs[csr.colind[e0:e1]].astype(np.float64)
            * csr.vals[e0:e1, None].astype(np.float64)
        ).sum(axis=0)
        got = out[r].astype(np.float64)
        tol = 10 * rtol * max(1.0, np.abs(ref).max())
        if not np.allclose(got, ref, atol=tol, rtol=rtol):
            return False
    return True


def run_inference_benchmark(
    ds: GraphDataset,
    *,
    model: str = "gcn",
    num_layers: int = 2,
    hidden: int = 256,
    agg_dtype: Optional[str] = "int32",
    config: Optional[SpmmConfig] = None,
    repeat: int = 1,
    reporter: Optional[DataReporter] = None,
    mesh=None,
    seed: int = 0,
    prepare_fn=None,
    validate: bool = False,
) -> dict:
    """End-to-end GNN inference (inference.py analog): model forward under
    jit, ``infer_time(ms)`` + test accuracy of the (untrained, like the
    reference — SURVEY.md §5.4) model. ``prepare_fn(graph, config)``
    overrides the default dispatch (``--version`` routing, compat.py)."""
    rep = reporter or DataReporter()
    rep.report("data_source", "synthetic" if ds.synthetic else "real")
    graph = ds.graph
    x = jnp.asarray(ds.x, dtype=jnp.float32)

    t0 = time.perf_counter()
    if prepare_fn is not None:
        prep = prepare_fn(graph, config)
    elif mesh is not None:
        from pygim_tpu.parallel import prepare_spmm_2d

        prep = prepare_spmm_2d(graph, mesh, config)
    else:
        prep = prepare_spmm(graph, config or SpmmConfig())
    rep.report("prepare_pim_time(ms)", (time.perf_counter() - t0) * 1e3)
    for ph, sec in getattr(
        getattr(prep, "prepare_timer", None), "acc", {}
    ).items():
        # host-side prepare sub-phases (timer.c slot analog)
        rep.report(f"prepare_{ph}_time(ms)", sec * 1e3)
    from pygim_tpu.compat import describe_layout

    rep.report("layout", describe_layout(prep))

    gnn = make_gnn(
        jax.random.key(seed), model, ds.x.shape[1], hidden,
        ds.num_classes, num_layers=num_layers, agg_dtype=agg_dtype,
    )
    # thread the sparse tables through the jit as ARGUMENTS — closing
    # over prep.mul would bake them in as giant HLO constants. The mesh
    # preps (2d / halo) implement the same dev_arrays/raw_mul contract,
    # so single-chip and multi-chip forwards both compile to ONE program.
    from pygim_tpu.ops.spmm import PreparedAggregate

    dev = prep.dev_arrays
    fwd_j = jax.jit(
        lambda x, dev: gnn.apply(x, PreparedAggregate(prep, dev))
    )
    fwd = lambda x: fwd_j(x, dev)
    dt = device_time(fwd, x, iters=repeat)
    rep.report("infer_time(ms)", dt * 1e3)
    rep.report("edges_per_s", graph.nnz * num_layers / dt)

    logits = np.asarray(fwd(x))
    rep.report("test_acc", evaluate_predictions(ds, logits))
    if validate:
        # per-layer aggregate check vs host CSR on sampled rows — the
        # BASELINE "per-layer activations allclose" clause at any scale
        from pygim_tpu.bench.validate import validate_inference_sampled

        # fused-capable jitted adapter (not a bare lambda): validation
        # probes the fused-quant hook, staying on the memory-lean device
        # path (the unfused (N, H) quantize round-trip OOM'd at
        # ogbn-products scale)
        from pygim_tpu.bench.validate import JittedAggregate

        ok = validate_inference_sampled(
            graph, gnn, x, JittedAggregate(prep), reporter=rep,
        )
        if not ok:
            raise AssertionError("per-layer validation failed")
    return rep.means()


def run_training_benchmark(
    ds: GraphDataset,
    *,
    model: str = "gcn",
    num_layers: int = 2,
    hidden: int = 256,
    config: Optional[SpmmConfig] = None,
    epochs: int = 50,
    lr: float = 1e-2,
    seed: int = 0,
    reporter: Optional[DataReporter] = None,
    mesh=None,
    prepare_fn=None,
    parity: bool = True,
    acc_tol: float = 0.01,
    oracle_chunk: Optional[int] = None,
) -> dict:
    """Trained-accuracy parity (beyond the reference, which only reports
    untrained accuracy — inference.py:27-41): train the SAME initialization
    with the SAME rng schedule twice, once aggregating through the TPU
    backend under test and once through the jnp oracle, then assert

    * final test accuracy matches within ``acc_tol`` (both paths learned
      the same function — the strongest end-to-end correctness signal), and
    * the trained model's per-layer activations are allclose under both
      aggregates (validate_model).

    The two runs differ ONLY in the aggregate implementation; dropout
    masks, init, and the optimizer schedule are bit-identical.
    """
    import dataclasses as _dc

    import optax

    from pygim_tpu.nn.models import gnn_apply
    from pygim_tpu.nn.train import make_train_step_threaded

    rep = reporter or DataReporter()
    rep.report("data_source", "synthetic" if ds.synthetic else "real")
    graph = ds.graph
    x = jnp.asarray(ds.x, dtype=jnp.float32)
    labels = jnp.asarray(ds.y.astype(np.int32))
    train_mask = jnp.asarray(ds.train_mask.astype(np.float32))

    if prepare_fn is not None:
        prep = prepare_fn(graph, config)
    elif mesh is not None:
        from pygim_tpu.parallel import prepare_spmm_2d

        prep = prepare_spmm_2d(graph, mesh, config)
    else:
        prep = prepare_spmm(graph, config or SpmmConfig())
    from pygim_tpu.compat import describe_layout

    rep.report("layout", describe_layout(prep))

    gnn = make_gnn(
        jax.random.key(seed), model, ds.x.shape[1], hidden,
        ds.num_classes, num_layers=num_layers,
    )
    optimizer = optax.adam(lr)

    def train(prep_):
        step, dev = make_train_step_threaded(gnn, prep_, optimizer)
        jit_step = jax.jit(step)
        params, opt_state = gnn.params, optimizer.init(gnn.params)
        loss = None
        for epoch in range(epochs):
            params, opt_state, loss = jit_step(
                params, opt_state, x, labels, train_mask,
                jax.random.key(seed * 100_003 + epoch), dev,
            )
        return params, float(loss)

    t0 = time.perf_counter()
    params, loss = train(prep)
    rep.report("train_time(ms)", (time.perf_counter() - t0) * 1e3)
    rep.report("train_loss", loss)
    logits = np.asarray(
        gnn_apply(
            params, x, prep.mul, conv=gnn.conv, num_layers=num_layers,
            dropout_rate=gnn.dropout, agg_dtype=None, training=False,
        )
    )
    acc = evaluate_predictions(ds, logits)
    rep.report("test_acc", acc)

    if parity:
        # oracle_chunk: memory-bounded oracle (spmm_coo_oracle_chunked)
        # — the raw oracle's backward materializes ~2×(nnz, H), OOMing
        # beyond ~10M edges; chunking lets the parity arm run at
        # flagship scale (VERDICT r4 item 4)
        oracle = prepare_spmm(
            graph,
            SpmmConfig(backend="oracle", oracle_edge_chunk=oracle_chunk),
        )
        params_o, loss_o = train(oracle)
        rep.report("oracle_train_loss", loss_o)
        logits_o = np.asarray(
            gnn_apply(
                params_o, x, oracle.mul, conv=gnn.conv,
                num_layers=num_layers, dropout_rate=gnn.dropout,
                agg_dtype=None, training=False,
            )
        )
        acc_o = evaluate_predictions(ds, logits_o)
        rep.report("oracle_test_acc", acc_o)
        rep.report("acc_delta", abs(acc - acc_o))
        # per-layer activations of the TRAINED model under both aggregates
        from pygim_tpu.bench.validate import JittedAggregate, validate_model

        cfg = getattr(prep, "config", None)
        loose = cfg is not None and cfg.backend == "hybrid" and (
            cfg.hybrid_dtype in ("bfloat16", "int8", "int4")
        )
        trained = _dc.replace(gnn, params=params)
        ok = validate_model(
            trained, x, JittedAggregate(prep), oracle.mul, reporter=rep,
            rtol=1e-2 if loose else 1e-4, atol=1e-2 if loose else 1e-4,
        )
        if not ok:
            raise AssertionError(
                "trained-model per-layer validation failed vs oracle"
            )
        if abs(acc - acc_o) > acc_tol:
            raise AssertionError(
                f"trained accuracy diverged: backend {acc:.4f} vs oracle "
                f"{acc_o:.4f} (tol {acc_tol})"
            )
    return rep.means()


def evaluate_predictions(ds: GraphDataset, logits: np.ndarray) -> float:
    """Task metric on the test split — accuracy by default; ROC-AUC or
    micro-F1 per dataset, mirroring the reference's OGB Evaluator /
    sklearn usage (inference.py:27-41)."""
    mask = ds.test_mask
    if not mask.any():
        return 0.0
    metric = getattr(ds, "metric", "acc")
    y, lg = ds.y[mask], logits[mask]
    if metric == "rocauc":
        from sklearn.metrics import roc_auc_score

        onehot = np.eye(lg.shape[1])[y]
        try:
            return float(roc_auc_score(onehot, lg, average="micro"))
        except ValueError:
            return 0.0
    if metric == "f1":
        from sklearn.metrics import f1_score

        return float(f1_score(y, lg.argmax(-1), average="micro"))
    return float((lg.argmax(-1) == y).mean())
