"""Persistent XLA compilation cache (shared by every entry point).

Remote TPU backends pay minutes-long compiles per new executable; the
reference amortized its analog (per-flag-combination ``.so`` builds) by
keying build dirs on frozen params (utils/experiment.py:214-234). Here
JAX's persistent cache plays that role: compiled executables keyed by
HLO land in one on-disk directory shared by bench.py, the CLIs, and the
experiment harness.
"""

from __future__ import annotations

import os

_DEFAULT = "~/.cache/pygim_tpu/jaxcache"
_enabled_dir: "str | None" = None


def enable(cache_dir: str | None = None) -> bool:
    """Idempotently point JAX at the shared on-disk compile cache.
    A later call with a DIFFERENT directory re-points it. Returns False
    when the running JAX build doesn't support it."""
    global _enabled_dir
    cache_dir = os.path.expanduser(
        cache_dir
        or os.environ.get("PYGIM_TPU_JAX_CACHE")
        or _DEFAULT
    )
    if _enabled_dir == cache_dir:
        return True
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        return False
    _enabled_dir = cache_dir
    return True
