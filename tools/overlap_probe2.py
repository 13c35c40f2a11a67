#!/usr/bin/env python3
"""Probe 2: WHY did the 1.29x gather/MXU overlap (tools/overlap_probe.py)
not transfer to the shipped interleaved hybrid (round-4 queue A/B:
102.7 ms interleaved vs 102.4 ms plain on the int8-12GiB reddit prep)?

Two differences between the round-4 probe's winning variant (D) and the
shipped formulation (_ell_grouped_scan core args) are suspects:

  1. OPERAND STREAMING: the probe streamed the matmul's slab operand as
     scan **xs** (XLA double-buffers/prefetches loop operands); the
     shipped path does a raw ``dynamic_slice`` from a closed-over
     multi-GiB core inside the body — possibly no prefetch, serializing
     the slab read against the gather.
  2. DTYPE PATH: the probe used a pre-converted bf16 operand; the
     shipped float path converts int8->bf16 in the body
     (``_core_matmul``). The round-3 standalone measurement showed XLA
     fuses that convert into the dot reads — inside a scan body next to
     a gather it may not.

This probe times, on shapes small enough for fast compiles but with the
real per-step structure (int8 slab -> bf16 dot against a closed-over
(kc, H) activation block, gather chunks of 256 B rows):

  A      gather-only scan
  M_xs   core-only scan, slab via scan xs (3-D stored core)
  M_ds   core-only scan, slab via dynamic_slice from 2-D core
  AB_xs  one scan: gather + xs-streamed slab      (proposed fix)
  AB_ds  one scan: gather + dynamic_slice slab    (shipped formulation)

Verdicts:  M_ds >> M_xs           -> dynamic_slice kills the core side
           AB_ds ~= A + M_ds      -> shipped form cannot overlap
           AB_xs << A + M_xs      -> restructuring the core as per-table
                                     3-D arrays recovers the overlap.

Guard rails as in probe 1: full outputs returned, tuple unwrap outside
jit, device_time fence (utils/timers.py). Run through the TPU queue.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from pygim_tpu.utils.timers import device_time
from pygim_tpu.utils.compile_cache import enable as enable_cache


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    enable_cache()
    log("devices:", jax.devices())

    import ml_dtypes

    rng = np.random.default_rng(0)

    # gather side: 1M rows of 256 B (issue-bound, ~8 ms), 16 steps
    NROWS, H = 1 << 20, 64
    STEPS = 16
    # dtype-exact host arrays ONLY (no converting uploads, no device
    # astype before the first compile): runs 05/06 died with
    # remote_compile HTTP 413 before the first variant finished — each
    # stage below uploads lazily and fences, so a failure names its
    # stage
    table_np = rng.standard_normal((NROWS, H)).astype(np.float32)
    idx_np = rng.integers(
        0, NROWS, (STEPS, (1 << 20) // STEPS)
    ).astype(np.int32)
    log("uploading gather arrays ...")
    table = jax.block_until_ready(jnp.asarray(table_np))
    idx_c = jax.block_until_ready(jnp.asarray(idx_np))
    log("gather arrays resident")

    # core side: int8 (k, kc) = (32768, 32768) = 1 GiB, slab = k/STEPS,
    # activations (kc, HC) bf16 closed over — the real hybrid's shape
    # class (reddit: k=113408, HC=256, 26 steps)
    K, KC, HC = 32768, 32768, 256
    SLAB = K // STEPS
    core_np = rng.integers(-3, 4, (K, KC), dtype=np.int8)
    xc_np = rng.standard_normal((KC, HC)).astype(ml_dtypes.bfloat16)

    _lazy = {}

    def arrays_for(name):
        if name == "A_gather":
            return (idx_c, table)
        if "xc" not in _lazy:
            log("uploading xc ...")
            _lazy["xc"] = jax.block_until_ready(jnp.asarray(xc_np))
        if name in ("M_xs", "AB_xs") and "core3d" not in _lazy:
            log("uploading core3d (1 GiB) ...")
            _lazy["core3d"] = jax.block_until_ready(
                jnp.asarray(core_np.reshape(STEPS, SLAB, KC))
            )
            log("core3d resident")
        if name in ("M_ds", "AB_ds") and "core2d" not in _lazy:
            log("uploading core2d (1 GiB) ...")
            _lazy["core2d"] = jax.block_until_ready(jnp.asarray(core_np))
            log("core2d resident")
        return {
            "M_xs": lambda: (_lazy["core3d"], _lazy["xc"]),
            "M_ds": lambda: (_lazy["core2d"], _lazy["xc"]),
            "AB_xs": lambda: (idx_c, table, _lazy["core3d"], _lazy["xc"]),
            "AB_ds": lambda: (idx_c, table, _lazy["core2d"], _lazy["xc"]),
        }[name]()

    # NB: bodies must reference ONLY their jit parameters — a closure
    # over a resident device array bakes it into the HLO as a CONSTANT
    # (a 256 MB+ compile request: the actual cause of runs 05-08's
    # remote_compile HTTP 413s)

    def _gather_step(tbl, ic):
        return jnp.take(tbl, ic, axis=0).sum(axis=0)

    def _slab_dot(cs, xc):
        return jnp.dot(
            cs.astype(jnp.bfloat16), xc, preferred_element_type=jnp.float32
        )

    def a_gather(idx_c, table):
        def step(carry, ic):
            return carry + _gather_step(table, ic), None

        out, _ = jax.lax.scan(step, jnp.zeros((H,), jnp.float32), idx_c)
        return out

    def m_xs(core3d, xc):
        def step(_, cs):
            return None, _slab_dot(cs, xc)

        _, ys = jax.lax.scan(step, None, core3d)
        return ys

    def m_ds(core2d, xc):
        def step(_, st):
            cs = jax.lax.dynamic_slice(
                core2d, (st, jnp.int32(0)), (SLAB, KC)
            )
            return None, _slab_dot(cs, xc)

        starts = jnp.arange(STEPS, dtype=jnp.int32) * SLAB
        _, ys = jax.lax.scan(step, None, starts)
        return ys

    def ab_xs(idx_c, table, core3d, xc):
        def step(carry, xs):
            ic, cs = xs
            return carry + _gather_step(table, ic), _slab_dot(cs, xc)

        g, ys = jax.lax.scan(
            step, jnp.zeros((H,), jnp.float32), (idx_c, core3d)
        )
        return g, ys

    def ab_ds(idx_c, table, core2d, xc):
        def step(carry, xs):
            ic, st = xs
            cs = jax.lax.dynamic_slice(
                core2d, (st, jnp.int32(0)), (SLAB, KC)
            )
            return carry + _gather_step(table, ic), _slab_dot(cs, xc)

        starts = jnp.arange(STEPS, dtype=jnp.int32) * SLAB
        g, ys = jax.lax.scan(
            step, jnp.zeros((H,), jnp.float32), (idx_c, starts)
        )
        return g, ys

    results = {}
    for name, fn, tup in (
        ("A_gather", a_gather, False),
        ("M_xs", m_xs, False),
        ("M_ds", m_ds, False),
        ("AB_xs", ab_xs, True),
        ("AB_ds", ab_ds, True),
    ):
        args = arrays_for(name)
        jitted = jax.jit(fn)
        timed = (lambda j: lambda *xs: j(*xs)[0])(jitted) if tup else jitted
        t0 = time.time()
        dt = device_time(timed, *args, iters=10)
        results[name] = dt
        log(f"{name}: {dt*1e3:.2f} ms  (compile+measure {time.time()-t0:.0f}s)")

    for v, m in (("AB_xs", "M_xs"), ("AB_ds", "M_ds")):
        seq = results["A_gather"] + results[m]
        log(
            f"{v}: {results[v]*1e3:.2f} ms vs sequential A+{m} "
            f"{seq*1e3:.2f} ms -> overlap factor {seq/results[v]:.2f}x"
        )
    log(
        f"M_ds/M_xs = {results['M_ds']/results['M_xs']:.2f}x "
        "(>1.3 means dynamic_slice alone slows the core side)"
    )


if __name__ == "__main__":
    main()
