#!/usr/bin/env python3
"""Headline benchmark — driver contract: prints ONE JSON line
``{"metric", "value", "unit", "vs_baseline"}`` to stdout.

Metric: single-chip SpMM effective bandwidth on the Reddit-shaped graph
(CSR, float32, hidden 256 — BASELINE.md §3 config 1). Effective bytes use
the standard SpMM traffic model (edge streams + one dense-row read per
edge + output write; no reuse credit). ``vs_baseline`` is achieved GB/s
over the target 70% of v5e HBM speed-of-light (0.70 × 819 GB/s), so
vs_baseline ≥ 1.0 means the BASELINE.json target is met.

Progress goes to stderr; only the JSON line goes to stdout.
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HBM_PEAK_GBPS = float(os.environ.get("PYGIM_BENCH_HBM_GBPS", 819.0))
TARGET_FRACTION = 0.70


def _wait_for_tpu_relay():
    """The remote-TPU tunnel relay (CLAUDE.md) can die; a JAX client then
    BLOCKS FOREVER in backend init. When the axon plugin is on the path,
    probe its port first and wait a bounded time — failing fast beats
    hanging the driver's round-end bench."""
    if "axon" not in os.environ.get("PYTHONPATH", "") + os.environ.get(
        "JAX_PLATFORMS", ""
    ):
        return True
    import socket

    deadline = time.time() + float(
        os.environ.get("PYGIM_BENCH_RELAY_WAIT_S", 600)
    )
    while True:
        try:
            socket.create_connection(("127.0.0.1", 8082), 2).close()
            return True
        except OSError:
            if time.time() >= deadline:
                return False
            log("tpu relay down — waiting 60s")
            time.sleep(60)


def main():
    dataset = os.environ.get("PYGIM_BENCH_DATASET", "reddit")
    hidden = int(os.environ.get("PYGIM_BENCH_HIDDEN", 256))
    t_start = time.time()

    if not _wait_for_tpu_relay():
        log("FATAL: tpu tunnel relay unreachable (port 8082 refused); "
            "backend init would block forever — aborting without a "
            "result line")
        sys.exit(1)

    import jax

    # persistent compile cache: repeated bench runs skip the (minutes-long
    # on remote backends) XLA compile when supported
    from pygim_tpu.utils.compile_cache import enable as enable_cache

    if not enable_cache():
        log("compile cache unavailable")

    log(f"devices: {jax.devices()}")

    from pygim_tpu.data import load_dataset
    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm
    from pygim_tpu.bench.runners import spmm_model_bytes
    from pygim_tpu.utils.timers import device_time

    import jax.numpy as jnp
    import numpy as np

    log(f"loading {dataset} ...")
    ds = load_dataset(dataset)
    graph = ds.graph
    log(
        f"graph: N={graph.nrows} E={graph.nnz} "
        f"({'synthetic' if ds.synthetic else 'real'})  [{time.time()-t_start:.0f}s]"
    )

    backend = os.environ.get("PYGIM_BENCH_BACKEND", "hybrid")
    # Candidate ladder, measured-best first (round-3 on-chip ladder,
    # duplicate-merged prepares — docs/PERF.md round 3):
    #   int8 12 GiB  107.5 ms  (1102.7 GB/s, the headline)
    #   int4  8 GiB  133.6 ms  (was 362 ms before duplicate merging —
    #                           hub-cell demotion, since priced exactly)
    #   bf16 12 GiB  144.7 ms
    # Integer cores apply only to integer-VALUED adjacencies (cells are
    # exact small ints; out-of-range cells demote to the exact ELL tail
    # at prepare); the float payload rides bf16/f32 on the MXU either
    # way. To stay honest against residual model error, the first
    # PYGIM_BENCH_MEASURE_TOP surviving candidates are MEASURED and the
    # best wins; explicit env pins collapse to one.
    env_dt = os.environ.get("PYGIM_BENCH_CORE_DTYPE")
    env_b = os.environ.get("PYGIM_BENCH_CORE_BYTES")
    env_shape = os.environ.get("PYGIM_BENCH_CORE_SHAPE")
    if env_dt or env_b or env_shape:
        attempts = [(
            env_dt or "int8", int(env_b or (12 << 30)),
            env_shape or "square",
        )]
        measure_top = 1
    else:
        attempts = [
            # measured round 5 (docs/PERF.md): the staircase region
            # captures 98.3% of edges at 8 GiB (square-12: 96.9%) and
            # spends 2/3 of the square-12's MXU flops — 70.7 ms, the
            # tuner's own argmin. stair-12 measured 75.8; square-12
            # 102.4.
            ("int8", 8 << 30, "stair"),
            ("int8", 12 << 30, "stair"),
            ("int8", 12 << 30, "square"),
            ("int4", 8 << 30, "square"),    # measured 133.6 ms
            ("bfloat16", 12 << 30, "square"),  # 144.7 ms; float-valued
                                               # -graph fallback
            ("bfloat16", 8 << 30, "square"),
            ("bfloat16", 4 << 30, "square"),
        ]
        # Default 1: three rounds of on-chip evidence agree int8-12GiB is
        # the best, and round 3's driver bench hit rc=124 chasing a second
        # candidate (prepare+fresh-compile pushed past the driver timeout
        # AFTER the winner was already measured — BENCH_r03.json).
        measure_top = int(os.environ.get("PYGIM_BENCH_MEASURE_TOP", 1))
    sample = graph.vals[:: max(1, graph.vals.size // 4096)]
    if not np.all(sample == np.round(sample)):
        attempts = [
            (d, b, s) for d, b, s in attempts
            if d not in ("int4", "int8")
        ] or [("bfloat16", 12 << 30, "square")]
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((graph.ncols, hidden)), dtype=jnp.float32
    )
    iters = int(os.environ.get("PYGIM_BENCH_ITERS", 5))

    # Wall-clock guard: once one candidate is measured, never start
    # another past the deadline — printing the JSON line with the number
    # we have beats a driver-side timeout with no line at all.
    deadline = t_start + float(os.environ.get("PYGIM_BENCH_DEADLINE_S", 1500))
    dt = None
    nnz_unique = graph.nnz
    measured = 0
    for i, (core_dtype, budget, shape) in enumerate(attempts):
        if dt is not None and time.time() > deadline:
            log(
                f"deadline ({time.time()-t_start:.0f}s elapsed) — "
                "reporting the best measured candidate"
            )
            break
        cfg = SpmmConfig(
            backend=backend, format="csr", hybrid_core_bytes=budget,
            hybrid_dtype=core_dtype or None, hybrid_shape=shape,
        )
        try:
            t0 = time.time()
            prep = prepare_spmm(graph, cfg)
            log(f"prepare ({core_dtype} {shape} core, budget {budget >> 30} GiB): "
                f"{time.time()-t0:.1f}s")
            t0 = time.time()
            dt_i = device_time(prep.mul, x, iters=iters)
            log(f"timed (incl. compile {time.time()-t0:.0f}s): "
                f"{dt_i*1e3:.1f} ms/iter ({core_dtype} {shape} {budget >> 30} GiB)")
            measured += 1
            if dt is None or dt_i < dt:
                dt = dt_i
                # post-merge edge count for the unique-edge accounting
                nnz_unique = int(getattr(prep, "nnz", graph.nnz))
            del prep  # free HBM before the next candidate
            if measured >= measure_top:
                break
        except Exception as e:
            log(f"{core_dtype} core at {budget >> 30} GiB failed "
                f"({type(e).__name__}); retrying next config")
            if backend != "hybrid" or (
                dt is None and i == len(attempts) - 1
            ):
                raise
    assert dt is not None

    model_bytes = spmm_model_bytes(graph.nnz, graph.nrows, hidden, 4)
    gbps = model_bytes / dt / 1e9
    # dual accounting: duplicates merged at prepare (multigraph stand-ins)
    # do less device work; the unique-edge-credited number carries the
    # conservative reading in the same line (VERDICT r4 item 7)
    gbps_unique = (
        spmm_model_bytes(nnz_unique, graph.nrows, hidden, 4) / dt / 1e9
    )
    target = TARGET_FRACTION * HBM_PEAK_GBPS
    log(
        f"effective {gbps:.1f} GB/s (unique-edge credit {gbps_unique:.1f}); "
        f"target {target:.0f} GB/s "
        f"({TARGET_FRACTION*100:.0f}% of {HBM_PEAK_GBPS:.0f})"
    )

    print(
        json.dumps(
            {
                "metric": f"spmm_effective_bandwidth_{dataset}_csr_f32_h{hidden}",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / target, 4),
                "spmm_effective_GBps_unique": round(gbps_unique, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
