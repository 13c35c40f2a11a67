"""Utils: phase timers, device_time fence, logger, profiling no-crash."""

import logging
import time

import jax.numpy as jnp
import numpy as np

from pygim_tpu.utils.logging import make_logger
from pygim_tpu.utils.timers import PhaseTimer, device_time


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        pass
    assert t.ms("a") >= 15
    assert t.ms("b") >= 0
    assert t.ms("missing") == 0


def test_device_time_measures():
    x = jnp.ones((256, 256))
    dt = device_time(lambda a: a * 2.0, x, iters=3)
    assert 0 < dt < 1.0


def test_make_logger_idempotent(tmp_path):
    lg1 = make_logger("t_logger", logfile=str(tmp_path / "x.log"))
    lg2 = make_logger("t_logger", logfile=str(tmp_path / "x.log"))
    assert lg1 is lg2
    n_stream = sum(
        isinstance(h, logging.StreamHandler) for h in lg1.handlers
    )
    assert n_stream <= 2  # one stdout + one file handler
    lg1.info("hello")
    assert "hello" in (tmp_path / "x.log").read_text()


def test_profiling_contexts_no_crash():
    from pygim_tpu.utils.profiling import annotate, trace

    with annotate("region"):
        pass
    # trace may not be supported on all backends; must never raise
    with trace("/tmp/pygim_trace_test"):
        jnp.ones(4).sum()


def test_compile_cache_enable_idempotent(tmp_path, monkeypatch):
    import pygim_tpu.utils.compile_cache as cc

    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.setenv("PYGIM_TPU_JAX_CACHE", str(tmp_path / "jc"))
    assert cc.enable() is True
    assert cc.enable() is True  # second call is a no-op hit
    import jax

    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "jc")
    # a different directory RE-POINTS the cache (no silent stale hit)
    assert cc.enable(str(tmp_path / "jc2")) is True
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "jc2")
