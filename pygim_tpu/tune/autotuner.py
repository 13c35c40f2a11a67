"""Per-graph autotuner — the utils/autotuner.py capability, TPU-native.

The reference searches (sp_parts, ds_parts, dpu-balance, tasklet-balance)
with an analytical cost model fed by a native measurement op
(``prepare_tune_csr`` — missing from its snapshot, SURVEY.md §2.1). Here:

* :func:`plan_statistics` IS that measurement op, implemented for real as a
  pure planner statistic (needs no hardware): per-candidate byte/row/nnz
  counters derived from the partition plan.
* ``mode='model'`` ranks candidates with the TPU roofline cost model.
* ``mode='measure'`` compiles and times each candidate on the device —
  affordable on TPU because configs are runtime parameters, not per-config
  ``.so`` builds (SURVEY.md §5.6).

Results are cached per (graph fingerprint, hidden, dtype) the way the
reference keys its builds by frozen params (experiment.py:214-234).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from pathlib import Path
from typing import Optional

import numpy as np

from pygim_tpu.core.graph import CsrGraph
from pygim_tpu.core.partition import make_row_block_plan
from pygim_tpu.ops.spmm import SpmmConfig
from pygim_tpu.tune.cost_model import TpuCostModel, predict_spmm_time
from pygim_tpu.tune.space import For, Space

_CACHE_DIR = Path(
    os.environ.get(
        "PYGIM_TPU_TUNE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pygim_tpu"),
    )
)

# default search space — the TPU analog of the reference's
# sp_ds_set=[(1,32),(2,16)] × blnc_set=[0,2] (autotuner.py:259-261)
DEFAULT_SPACE = (
    For("balance", ["nnz", "row"])
    * For("block_nnz_budget", [1 << 15, 1 << 17, 1 << 19])
    * For("backend", ["blocked", "ell", "hybrid"])
)


def plan_statistics(
    csr: CsrGraph,
    hidden: int,
    config: SpmmConfig,
    sp: int = 1,
    ds: int = 1,
    dtype_bytes: int = 4,
) -> dict:
    """Per-candidate counters — the re-implemented ``prepare_tune_csr``
    (autotuner.py:295-302 expected ``[load_bytes, retrieve_bytes,
    merge_rows, max_nnz_per_dpu, max_nnz_per_tasklet, nr_dpus, read_cnt,
    write_cnt]``; these are the TPU-meaningful equivalents)."""
    h_local = -(-hidden // ds)
    nnz_local = csr.nnz // sp  # expectation per column part
    nb = config.resolve_n_blocks(max(1, nnz_local))
    plan = make_row_block_plan(csr, nb, balance=config.balance)
    nnz_per_block = (
        csr.rowptr[plan.bounds[1:]] - csr.rowptr[plan.bounds[:-1]]
    )
    core_bytes = 0
    if config.backend in ("ell", "hybrid"):
        from pygim_tpu.core.partition import choose_ell_degree

        deg = np.diff(csr.rowptr).astype(np.int64)
        tail_nnz = csr.nnz
        if config.backend == "hybrid":
            # hub-core coverage estimate: degree-ranked top-k × top-k
            itemsize = 2 if config.hybrid_dtype == "bfloat16" else dtype_bytes
            k = config.hybrid_k or min(
                csr.nrows,
                (int(np.sqrt(config.hybrid_core_bytes / itemsize)) // 256)
                * 256,
            )
            total_deg = deg + np.bincount(
                csr.colind, minlength=csr.ncols
            )[: csr.nrows]
            rank = np.empty(csr.nrows, dtype=np.int64)
            rank[np.argsort(-total_deg)] = np.arange(csr.nrows)
            rows_of = np.repeat(np.arange(csr.nrows, dtype=np.int64), deg)
            in_core = (rank[rows_of] < k) & (rank[csr.colind] < k)
            tail_nnz = int((~in_core).sum())
            core_bytes = k * k * itemsize
            deg = np.bincount(
                rows_of[~in_core], minlength=csr.nrows
            ).astype(np.int64)
        D = config.ell_degree or choose_ell_degree(deg, hidden=hidden)
        n_vr = -(-deg[deg > 0] // D)
        padded_nnz = int(n_vr.sum() * D)
        # merge of virtual rows: one write + one scattered read per vrow
        scatter_bytes = 2 * int(n_vr.sum()) * h_local * dtype_bytes
    else:
        padded_nnz = nb * plan.nnz_pad
        # blocked/coo materialize the gathered contribution then
        # scatter-read it in the segment-sum (the measured amplification)
        scatter_bytes = 2 * padded_nnz * h_local * dtype_bytes
    return {
        "scatter_bytes": scatter_bytes,
        "core_bytes": core_bytes,
        # dominant term: one dense row read per (local) nnz
        "gather_bytes": padded_nnz / max(1, sp) * h_local * dtype_bytes * sp
        if sp == 1
        else nnz_local * h_local * dtype_bytes,
        # colind + vals streams and the output write
        "stream_bytes": (
            padded_nnz * (4 + dtype_bytes) + csr.nrows * h_local * dtype_bytes
        ),
        # sp-axis reduction volume (replaces host memadd merge_rows)
        "psum_bytes": (sp - 1) * csr.nrows * h_local * dtype_bytes,
        "max_nnz_per_block": int(nnz_per_block.max(initial=0)),
        "mean_nnz_per_block": float(nnz_per_block.mean()) if nb else 0.0,
        "pad_fraction": float(padded_nnz / max(1, csr.nnz)) - 1.0,
        "n_blocks": nb,
        "n_dispatch": 1,
        "rows_pad": plan.rows_pad,
        "nnz_pad": plan.nnz_pad,
    }


def _fingerprint(csr: CsrGraph, hidden: int) -> str:
    h = hashlib.sha256()
    h.update(np.asarray([csr.nrows, csr.ncols, csr.nnz, hidden]).tobytes())
    h.update(csr.rowptr[:: max(1, csr.nrows // 64)].tobytes())
    return h.hexdigest()[:16]


@dataclasses.dataclass
class TuneResult:
    config: SpmmConfig
    predicted_s: float
    measured_s: Optional[float]
    candidates: list  # (config_dict, predicted_s, measured_s|None)


def autotune(
    graph,
    hidden: int,
    space: Optional[Space] = None,
    *,
    mode: str = "model",
    model: Optional[TpuCostModel] = None,
    use_cache: bool = True,
    repeats: int = 3,
) -> TuneResult:
    """Pick the best SpmmConfig for ``graph`` × dense width ``hidden``.

    ``mode='model'`` — rank by roofline prediction only (no device time),
    like the reference's analytic argmin (autotuner.py:309-343).
    ``mode='measure'`` — additionally time the top-3 predicted candidates
    on device and pick the measured argmin (the "real timing fallback" of
    SURVEY.md §7 step 5).
    """
    csr = graph if isinstance(graph, CsrGraph) else graph.to_csr()
    space = space if space is not None else DEFAULT_SPACE
    key = None
    if use_cache:
        key = _fingerprint(csr, hidden) + f"-{mode}"
        path = _CACHE_DIR / f"tune-{key}.json"
        if path.exists():
            try:
                d = json.loads(path.read_text())
                return TuneResult(
                    config=SpmmConfig(**d["config"]),
                    predicted_s=d["predicted_s"],
                    measured_s=d.get("measured_s"),
                    candidates=d["candidates"],
                )
            except Exception:
                pass

    scored = []
    for point in space:
        cfg = SpmmConfig(**point)
        stats = plan_statistics(csr, hidden, cfg)
        t = predict_spmm_time(stats, model)
        scored.append((point, t))
    scored.sort(key=lambda s: s[1])

    measured: dict = {}
    if mode == "measure":
        import time

        import jax
        import jax.numpy as jnp

        from pygim_tpu.ops.spmm import prepare_spmm

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((csr.ncols, hidden)),
            dtype=jnp.float32,
        )
        red = jax.jit(lambda o: jnp.sum(o))
        for point, _pred in scored[:3]:
            prep = prepare_spmm(csr, SpmmConfig(**point))
            float(red(prep.mul(x)))  # compile + warm
            t0 = time.time()
            for _ in range(repeats):
                out = prep.mul(x)
            float(red(out))
            measured[json.dumps(point, sort_keys=True)] = (
                time.time() - t0
            ) / repeats

    if measured:
        best_point = min(
            (p for p, _ in scored[:3]),
            key=lambda p: measured[json.dumps(p, sort_keys=True)],
        )
        best_measured = measured[json.dumps(best_point, sort_keys=True)]
    else:
        best_point, best_measured = scored[0][0], None

    result = TuneResult(
        config=SpmmConfig(**best_point),
        predicted_s=next(t for p, t in scored if p == best_point),
        measured_s=best_measured,
        candidates=[
            (p, t, measured.get(json.dumps(p, sort_keys=True)))
            for p, t in scored
        ],
    )
    if use_cache and key is not None:
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        (_CACHE_DIR / f"tune-{key}.json").write_text(
            json.dumps(
                {
                    "config": dataclasses.asdict(result.config),
                    "predicted_s": result.predicted_s,
                    "measured_s": result.measured_s,
                    "candidates": result.candidates,
                }
            )
        )
    return result
