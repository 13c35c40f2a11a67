"""Phase timers with device-sync-correct semantics.

The reference's 56-slot ``gettimeofday`` timer (support/timer.c:4-20)
measured real host phases because every UPMEM call was synchronous at the
sync points. On TPU, dispatch is asynchronous AND on this environment's
remote-tunnel backend ``block_until_ready`` alone has proven unreliable —
the only trustworthy fence is a device-side reduction fetched to host.
:func:`device_time` therefore times ``iters`` dispatches closed by a jitted
scalar reduction + host fetch (one extra ~µs-scale op, amortized).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


class PhaseTimer:
    """Accumulating named phase timer (timer.c analog, without the slot
    indices). ``with timer.phase("kernel"): ...`` or start/stop pairs."""

    def __init__(self):
        self.acc: dict[str, float] = {}
        self._t0: dict[str, float] = {}

    def start(self, name: str) -> None:
        self._t0[name] = time.perf_counter()

    def stop(self, name: str) -> None:
        self.acc[name] = self.acc.get(name, 0.0) + (
            time.perf_counter() - self._t0.pop(name)
        )

    class _Ctx:
        def __init__(self, timer, name):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.timer.start(self.name)

        def __exit__(self, *exc):
            self.timer.stop(self.name)
            return False

    def phase(self, name: str) -> "_Ctx":
        return self._Ctx(self, name)

    def ms(self, name: str) -> float:
        return self.acc.get(name, 0.0) * 1e3


_sync_reduce = None


def _get_sync_reduce():
    global _sync_reduce
    if _sync_reduce is None:
        _sync_reduce = jax.jit(lambda o: jnp.sum(jnp.ravel(o).astype(jnp.float32)[:8]))
    return _sync_reduce


def device_time(
    fn: Callable, *args, iters: int = 8, warmup: int = 1
) -> float:
    """Seconds per call of ``fn(*args)`` with a trustworthy device fence.

    The fence: the last output is folded by a tiny jitted reduction whose
    scalar is fetched to host — a full pipeline drain on a FIFO device
    queue, robust where ``block_until_ready`` is not (remote backends).
    """
    red = _get_sync_reduce()
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    float(red(out))
    # fence overhead (reduce + host round-trip; significant on remote
    # backends) — measured on the warm output and subtracted
    t0 = time.perf_counter()
    float(red(out))
    fence = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(red(out))
    total = time.perf_counter() - t0
    # guard against noisy fence estimates: never report below the
    # fence-inclusive average spread over iters+1 "iterations"
    return max(total - fence, total * iters / (iters + 1)) / iters
