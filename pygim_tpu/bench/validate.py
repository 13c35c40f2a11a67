"""Numerical validation: per-layer activation comparison vs the oracle
path — the BASELINE.md validation clause ("per-layer activations allclose
vs CPU reference; matched node-classification accuracy"), and the
capability the reference sketched in commented-out block checks
(spmm_mul_csr.c:414-477, [OK]/[ERROR] verdicts)."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from pygim_tpu.nn import layers as L
from pygim_tpu.nn.models import GNN, _CONV_APPLY
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm
from pygim_tpu.utils.metrics import DataReporter


def layer_activations(model: GNN, x, aggregate) -> list[np.ndarray]:
    """Forward pass capturing the activation after every stage (input
    projection, each conv block, output head)."""
    p = model.params
    acts = []
    h = L.linear_apply(p["ln1"], x)
    h = jax.nn.relu(L.batchnorm_apply(p["bn0"], h))
    acts.append(np.asarray(h))
    conv_apply = _CONV_APPLY[model.conv]
    for i in range(model.num_layers):
        h = conv_apply(p["convs"][i], h, aggregate, agg_dtype=model.agg_dtype)
        h = jax.nn.relu(L.batchnorm_apply(p["bns"][i], h))
        acts.append(np.asarray(h))
    acts.append(np.asarray(L.linear_apply(p["ln2"], h)))
    return acts


def validate_model(
    model: GNN,
    x,
    aggregate,
    oracle_aggregate,
    *,
    rtol: float = 1e-4,
    atol: float = 1e-4,
    reporter: Optional[DataReporter] = None,
) -> bool:
    """Compare per-layer activations of ``aggregate`` vs the oracle.
    Reports ``layer{i}_max_err`` and a final [OK]/[ERROR] verdict."""
    rep = reporter or DataReporter(echo=False)
    got = layer_activations(model, x, aggregate)
    ref = layer_activations(model, x, oracle_aggregate)
    ok = True
    for i, (g, r) in enumerate(zip(got, ref)):
        err = float(np.max(np.abs(g - r))) if g.size else 0.0
        rep.report(f"layer{i}_max_err", err)
        scale = max(1.0, float(np.max(np.abs(r)))) if r.size else 1.0
        if err > atol + rtol * scale:
            ok = False
    rep.report("validate", "OK" if ok else "ERROR")
    return ok


def validate_backend(
    graph, hidden: int, config: SpmmConfig, *, n_check_cols: int = 32,
    seed: int = 0, rtol: float = 1e-4, atol: float = 1e-4,
) -> bool:
    """Direct SpMM check of ``config`` vs the oracle backend on a random
    dense operand (full-matrix allclose; use runners' sampled check for
    100M-edge graphs)."""
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    x = jnp.asarray(
        rng.standard_normal((graph.ncols, min(hidden, n_check_cols))),
        dtype=jnp.float32,
    )
    got = np.asarray(prepare_spmm(graph, config).mul(x))
    ref = np.asarray(
        prepare_spmm(graph, SpmmConfig(backend="oracle")).mul(x)
    )
    return np.allclose(got, ref, rtol=rtol, atol=atol)


class JittedAggregate:
    """Aggregate adapter for EAGER contexts (validation): routes through
    the prep's cached-jit ``mul`` / ``mul_quantized`` and exposes the
    fused-quant hook so eager validation runs the same memory-lean
    programs as the timed path."""

    def __init__(self, prep):
        self.prep = prep

    def __call__(self, v):
        return self.prep.mul(v)

    def quantized(self, v, agg_dtype: str):
        if getattr(self.prep, "supports_fused_quant", False):
            return self.prep.mul_quantized(v, agg_dtype)
        return None


class _RecordingAggregate:
    """Aggregate wrapper capturing (input, output, quant-dtype) per call.
    Exposes the fused-quantization hook when the wrapped aggregate does —
    keeping validation on the SAME memory-lean device path as the timed
    run (the unfused path's (N, H) quantize round-trip OOM'd validation
    at ogbn-products scale on a 16 GB chip)."""

    def __init__(self, aggregate):
        self._agg = aggregate
        self.records: list[tuple[np.ndarray, np.ndarray, Optional[str]]] = []

    def __call__(self, v):
        out = self._agg(v)
        self.records.append((np.asarray(v), np.asarray(out), None))
        return out

    def quantized(self, v, agg_dtype: str):
        fused = getattr(self._agg, "quantized", None)
        if fused is None:
            return None
        out = fused(v, agg_dtype)
        if out is not None:
            self.records.append((np.asarray(v), np.asarray(out), agg_dtype))
        return out


def validate_inference_sampled(
    graph,
    model: GNN,
    x,
    aggregate,
    *,
    rows_to_check: int = 128,
    seed: int = 0,
    rtol: float = 1e-2,
    atol: float = 1e-3,
    reporter: Optional[DataReporter] = None,
) -> bool:
    """Per-layer aggregate validation at 100M-edge scale: run the real
    forward once, intercept every (input, output) pair of the aggregate,
    and recompute sampled output rows from the host CSR (the reference's
    commented-out per-rank block check, spmm_mul_csr.c:414-477, done for
    real). Affordable on any graph — cost is rows_to_check·deg·H per
    layer on host. Fused-quantized aggregates (int8/16/32) are checked
    against a host replica of the same quantization (scale/round per
    quant/__init__.py), so the check stays near-bit-exact."""
    from pygim_tpu.quant import _SCALE_EXP

    rep = reporter or DataReporter(echo=False)
    csr = graph.to_csr() if not hasattr(graph, "rowptr") else graph
    rec = _RecordingAggregate(aggregate)
    layer_activations(model, x, rec)
    rng = np.random.default_rng(seed)
    rows = rng.choice(
        csr.nrows, min(rows_to_check, csr.nrows), replace=False
    )
    ok = True
    for li, (vin, vout, qname) in enumerate(rec.records):
        if qname is not None:
            # replicate the fused path's symmetric quantization on host:
            # scale from the full input, round(v/scale), integer sum,
            # ·scale — near-bit-exact vs the device program
            k = _SCALE_EXP[qname]
            # f32 arithmetic start-to-finish: bit-identical to the device
            # scale (abs_max·2 exact, ÷2^k exact)
            q_scale = (
                np.float32(np.max(np.abs(vin)))
                * np.float32(2.0) / np.float32(2.0 ** k)
            )
            q_scale = q_scale if q_scale != 0 else np.float32(1.0)
        max_err = 0.0
        for r in rows:
            e0, e1 = int(csr.rowptr[r]), int(csr.rowptr[r + 1])
            vrows = vin[csr.colind[e0:e1]].astype(np.float64)
            if qname is not None:
                vrows = np.round(
                    vrows.astype(np.float32) / q_scale
                ).astype(np.float64)
            ref = (vrows * csr.vals[e0:e1, None].astype(np.float64)).sum(
                axis=0
            )
            if qname is not None:
                ref = ref * np.float64(q_scale)
            err = float(np.max(np.abs(vout[r].astype(np.float64) - ref)))
            scale = max(1.0, float(np.max(np.abs(ref))))
            max_err = max(max_err, err / scale)
            if err > atol + rtol * scale:
                ok = False
        rep.report(f"agg{li}_max_rel_err", max_err)
    rep.report("validate", "OK" if ok else "ERROR")
    return ok
