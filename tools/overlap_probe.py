#!/usr/bin/env python3
"""Falsification probe: does XLA/Mosaic overlap an issue-bound gather
with an MXU-bound matmul on v5e?

Motivation (round-4 phase split, results/ reddit int8-12GiB phases):
tail_time 60.9 ms + core_time 37.0 ms ~= total 101.4 ms — the hybrid's
two halves run back-to-back even though they stress different units
(gather issue engine vs MXU). If one fused program overlaps them, the
headline drops toward max(tail, core), a ~1.6x win no format change can
buy. This probe times, on small shapes (fast compiles):

  A. gather-only            (issue-bound:  1M rows of 256 B, ~8 ms)
  B. matmul-only            (MXU-bound:    bf16 dot, ~5.5 ms)
  C. one jit computing both (independent inputs and outputs)
  D. chunk-interleaved scan (slab-matmul + gather-chunk per step)

overlap iff C (or D) << A + B. Sequential execution means C ~= A + B.

Guard rails: matmuls return their FULL (M, N) output (a sum/slice
inside the jit would let XLA narrow the dot); tuple-returning variants
are unwrapped OUTSIDE the jit (jit materializes every output, and on a
FIFO device queue fencing any output drains the whole program —
utils/timers.py).

Run through the TPU queue (one client at a time — CLAUDE.md).
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

    rng = np.random.default_rng(0)
    NROWS, H = 1 << 20, 64          # 256 B rows: issue-bound regime
    table = jnp.asarray(rng.standard_normal((NROWS, H)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, NROWS, 1 << 20), jnp.int32)
    M, K, N = 8192, 16384, 4096     # 2*M*K*N = 1.1e12 bf16 flops
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    def g_only(idx, table):
        return jnp.take(table, idx, axis=0).sum(axis=0)

    def m_only(a, b):
        return a @ b

    def both(idx, table, a, b):
        return g_only(idx, table), a @ b

    CH = 8
    idx_c = idx.reshape(CH, -1)
    a_c = a.reshape(CH, M // CH, K)

    def interleaved(idx_c, table, a_c, b):
        def step(carry, xs):
            g_acc, m_acc = carry
            ic, ac = xs
            g_acc = g_acc + jnp.take(table, ic, axis=0).sum(axis=0)
            m_acc = m_acc + (ac @ b).astype(jnp.float32)
            return (g_acc, m_acc), None

        init = (
            jnp.zeros((H,), jnp.float32),
            jnp.zeros((M // CH, N), jnp.float32),
        )
        (g_acc, m_acc), _ = jax.lax.scan(step, init, (idx_c, a_c))
        return g_acc, m_acc

    results = {}
    for name, fn, args, tup in (
        ("A_gather", g_only, (idx, table), False),
        ("B_matmul", m_only, (a, b), False),
        ("C_both_one_jit", both, (idx, table, a, b), True),
        ("D_interleaved_scan", interleaved, (idx_c, table, a_c, b), True),
    ):
        jitted = jax.jit(fn)
        timed = (lambda j: lambda *xs: j(*xs)[0])(jitted) if tup else jitted
        t0 = time.time()
        dt = device_time(timed, *args, iters=10)
        results[name] = dt
        log(f"{name}: {dt*1e3:.2f} ms  (compile+measure {time.time()-t0:.0f}s)")

    seq = results["A_gather"] + results["B_matmul"]
    for v in ("C_both_one_jit", "D_interleaved_scan"):
        log(
            f"{v}: {results[v]*1e3:.2f} ms vs sequential {seq*1e3:.2f} ms "
            f"-> overlap factor {seq/results[v]:.2f}x"
        )


if __name__ == "__main__":
    main()
