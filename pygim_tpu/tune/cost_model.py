"""TPU roofline cost model for SpMM configuration search.

The reference's cost model (utils/autotuner.py:309-343) mirrors its five
run phases with measured UPMEM constants (autotuner.py:23-89). The TPU
analog has fewer phases — there is no host staging — so the model is:

    t = gather_bytes / (hbm_bw · gather_eff)      # per-edge dense reads
      + stream_bytes / hbm_bw                     # colind/vals/out streams
      + psum_bytes   / ici_bw                     # sp-axis reduction
      + pad_overhead                              # wasted padded work

Constants default to v5e datasheet numbers scaled by measured efficiency
factors; :func:`measure_constants` runs an on-device microbenchmark and
caches the honest values (the reference lost its measurement op
``prepare_tune_csr`` — SURVEY.md §2.1 gap — ours is implemented for real:
:func:`pygim_tpu.tune.autotuner.plan_statistics` needs no hardware at all,
and this module's measurement path needs only a few seconds of device
time).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Optional

# v5e datasheet-ish defaults; overridden by measurement when available.
_DEFAULTS = {
    "hbm_bw": 819e9,        # bytes/s
    "ici_bw": 180e9,        # bytes/s per link direction
    "gather_eff": 0.30,     # random-row gather efficiency vs streaming
    "stream_eff": 0.80,     # sequential stream efficiency
    "fixed_us": 5.0,        # per-dispatch overhead
    "mxu_bf16": 197e12,     # flops/s (v5e bf16 systolic peak)
}

_CACHE = Path(
    os.environ.get(
        "PYGIM_TPU_TUNE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pygim_tpu"),
    )
) / "tpu_constants.json"


@dataclasses.dataclass(frozen=True)
class TpuCostModel:
    hbm_bw: float
    ici_bw: float
    gather_eff: float
    stream_eff: float
    fixed_us: float
    # default keeps pre-existing cached tpu_constants.json loadable
    mxu_bf16: float = _DEFAULTS["mxu_bf16"]
    # measured per-collective constants for one mesh topology:
    # {name: {"bw": bytes/s, "fixed_us": µs}} with name ∈
    # {"psum", "all_gather", "all_to_all", "ring"}. None = price every
    # collective at the datasheet ici_bw (the pre-calibration behavior).
    coll: Optional[dict] = None
    # TUNER-layer correction on the per-slot gather cost over the degree
    # chooser's 8.7 ns floor. Round-5 calibration: the MULTI-TABLE tails
    # actually shipped run at ~13 ns/slot end-to-end — two independent
    # measured points fit it (reddit int8-12GiB: 60.9 ms tail over 3.41M
    # slots + 0.27M vrows; bf16-12GiB: 127.7 ms over 8.53M + 0.30M) —
    # the smaller per-degree scans and per-group scatter-adds cost real
    # overhead the single-table floor calibration never saw. The degree
    # CHOOSER keeps the 8.7 ns floor (its slot-vs-vrow TRADEOFF was
    # validated by the round-4 single-vs-multi A/B); this factor only
    # corrects the tuner's absolute tail pricing so core-coverage
    # candidates rank against the tail they will actually pay.
    # 1.2, not the raw 1.5 fit: at 1.5 the arxiv argmin flipped to
    # blocked (measured 45.9 ms vs the hybrid it abandoned at 39.2) —
    # small-graph tails sit closer to the single-table floor, and the
    # argmins this factor exists to fix (reddit BCSR-vs-plain, stair
    # ranking) hold at 1.2 on every tracked graph (round-5 sweep).
    ell_slot_factor: float = 1.2
    # where the constants came from — surfaced in TuneResult so a tuner
    # decision can be audited: "datasheet" (no measurement ran),
    # "measured:<platform>" (on-device microbenchmark), optionally
    # "+ici:<platform>x<n>" when per-collective constants were measured.
    # A cpu platform tag means a VIRTUAL mesh calibrated the exchange
    # pricing — useful for relative choices, not absolute times.
    # "+ell-issue:v5e" marks the ELL-tail issue-rate floor (8.7 ns/slot
    # + V(H)/virtual-row, core/partition.py) — those constants were
    # measured on the real chip and apply to every prediction that
    # carries an ELL tail, whatever the byte-roofline provenance.
    provenance: str = "datasheet+ell-issue:v5e"

    @classmethod
    def default(cls) -> "TpuCostModel":
        if _CACHE.exists():
            try:
                d = json.loads(_CACHE.read_text())
                # pre-provenance cache files were written by
                # measure_constants — they ARE measured
                d.setdefault("provenance", "measured:cached+ell-issue:v5e")
                return cls(**d)
            except Exception:
                pass
        return cls(**_DEFAULTS)

    @classmethod
    def measured(cls) -> "TpuCostModel":
        """Cached-or-calibrate: the first ``mode='measure'`` autotune call
        pays a few seconds of device microbenchmark, later calls hit the
        on-disk constants (the honest version of the reference's
        hard-coded bandwidth tables, autotuner.py:23-89)."""
        if _CACHE.exists():
            return cls.default()
        try:
            return measure_constants(save=True)
        except Exception:
            return cls(**_DEFAULTS)

    @classmethod
    def for_topology(cls, n_devices: int) -> "TpuCostModel":
        """Measured model + per-collective constants for the current
        mesh topology (cached per platform × device count). Falls back
        to the plain measured model when the mesh microbenchmark is
        unavailable."""
        base = cls.measured()
        if n_devices <= 1:
            return base
        try:
            coll = measure_ici_constants(n_devices, save=True)
        except Exception:
            return base
        meta = coll.get("__meta", {})
        tag = (
            f"+ici:{meta.get('platform', '?')}x{meta.get('n_devices', n_devices)}"
        )
        return dataclasses.replace(
            base, coll=coll, provenance=base.provenance + tag
        )


def predict_spmm_time(stats: dict, model: Optional[TpuCostModel] = None) -> float:
    """Predicted seconds for one SpMM under a partition plan's statistics
    (from :func:`pygim_tpu.tune.autotuner.plan_statistics`). The phase
    structure deliberately parallels the reference's
    load+merge+compute+retrieve decomposition (autotuner.py:309-343)."""
    m = model or TpuCostModel.default()
    tail_bw = (
        stats["gather_bytes"] / (m.hbm_bw * m.gather_eff)
        + stats["stream_bytes"] / (m.hbm_bw * m.stream_eff)
        + stats.get("scatter_bytes", 0) / (m.hbm_bw * m.stream_eff)
    )
    if stats.get("ell_slots") is not None:
        # ELL tail: the gather engine is ISSUE-rate-bound for rows up to
        # ~1 KB (measured ~8.7 ns/slot regardless of dtype — CLAUDE.md),
        # and each virtual row carries ~V(H) ns of merge overhead. The
        # byte roofline alone under-prices the tail 2-4× (4.2 ns/slot
        # f32@256, 2.1 ns bf16), which made three successive tuner
        # argmins shrink the hub core in favor of more tail — all
        # refuted on-chip (results/ tuner-argmin A/Bs; best shipped
        # 12 GiB core 102.0 ms vs predicted-better 8 GiB+BCSR 105.1 ms).
        # Wide-row plans (h_local·dtype ≳ 2 KB) flip back to bandwidth-
        # bound, hence max() rather than replacement.
        from pygim_tpu.core.partition import (
            _ELL_SLOT_NS,
            _ell_vrow_ns,
        )

        # slot term scaled by the measured multi-table correction
        # (ell_slot_factor — see the field's calibration note); vrow
        # term unchanged
        tail_bw = max(
            tail_bw,
            (
                stats["ell_slots"] * _ELL_SLOT_NS * m.ell_slot_factor
                + (stats.get("ell_vrows") or 0)
                * _ell_vrow_ns(stats.get("ell_hidden"))
            ) * 1e-9,
        )
    t = tail_bw
    # hybrid dense core: HBM stream and MXU issue overlap — the core
    # costs whichever roof binds (an int8 core at H=256 is compute-
    # bound: 512 flops but only 1 streamed byte per cell)
    t += max(
        stats.get("core_bytes", 0) / (m.hbm_bw * m.stream_eff),
        stats.get("core_flops", 0) / m.mxu_bf16,
    )
    # BCSR middle tier: tile/panel streams and MXU tile FMAs overlap —
    # whichever roof binds (statistics from the sampled structure probe,
    # tune/bcsr_probe.py)
    t += max(
        stats.get("bcsr_stream_bytes", 0) / (m.hbm_bw * m.stream_eff),
        stats.get("bcsr_flops", 0) / m.mxu_bf16,
    )
    # collective volume: measured per-collective constants for this
    # topology when available (measure_ici_constants), else the
    # datasheet ici_bw with the generic dispatch overhead
    cname = stats.get("collective")
    cinfo = (m.coll or {}).get(cname) if cname else None
    if cinfo is not None:
        t += stats["psum_bytes"] / max(1.0, cinfo["bw"])
        t += stats["n_dispatch"] * cinfo["fixed_us"] * 1e-6
        t += m.fixed_us * 1e-6  # the compute dispatch itself
    else:
        t += stats["psum_bytes"] / m.ici_bw
        t += stats["n_dispatch"] * m.fixed_us * 1e-6
    return t


def calibrate_from_phases(
    stats: dict,
    phases_ms: dict,
    base: Optional[TpuCostModel] = None,
    save: bool = False,
) -> TpuCostModel:
    """Fit the model's efficiency constants from MEASURED run-path phase
    times (``PreparedSpmm.phase_times``) and the matching plan statistics
    — closing the loop the reference closed with its per-phase timers
    feeding the tuner's bandwidth table (spmm_mul_csr.c:563-580 →
    autotuner.py:23-89)."""
    m = base or TpuCostModel.default()
    kw = dataclasses.asdict(m)
    g = phases_ms.get("gather_time(ms)")
    t = phases_ms.get("tail_time(ms)")
    stream = stats["stream_bytes"] + stats.get("scatter_bytes", 0)
    if g and t and g >= t:
        # inconsistent probe (the standalone gather compiled worse than
        # the fused scan — seen on the CPU backend where per-dispatch
        # overhead dominates): fit ONE effective bandwidth from the
        # fused tail phase instead
        eff = max(
            1e-4,
            min(1.0, (stats["gather_bytes"] + stream) / (t * 1e-3)
                / kw["hbm_bw"]),
        )
        kw["gather_eff"] = kw["stream_eff"] = eff
    else:
        if g and g > 0 and stats.get("gather_bytes"):
            kw["gather_eff"] = max(
                1e-4,
                min(1.0, stats["gather_bytes"] / (g * 1e-3) / kw["hbm_bw"]),
            )
        if t and g is not None and t > g:
            kw["stream_eff"] = max(
                1e-4,
                min(1.0, stream / ((t - g) * 1e-3) / kw["hbm_bw"]),
            )
    model = TpuCostModel(**kw)
    if save:
        _CACHE.parent.mkdir(parents=True, exist_ok=True)
        _CACHE.write_text(json.dumps(dataclasses.asdict(model)))
    return model


def _ici_cache_path(platform: str, nd: int, rows: int, h: int) -> Path:
    # the default payload keeps the stable per-topology name (the
    # persisted-constants contract); custom fit sizes get their own key
    # so they never silently return a default-size fit
    suffix = "" if (rows, h) == (4096, 256) else f"-r{rows}-h{h}"
    return _CACHE.parent / f"ici-{platform}-n{nd}{suffix}.json"


def measure_ici_constants(
    n_devices: Optional[int] = None,
    save: bool = True,
    rows: int = 4096,
    h: int = 256,
) -> dict:
    """Per-collective (bw, fixed_us) for the current mesh topology,
    measured with a two-point fit (small payload → fixed overhead,
    large payload → bandwidth), in the same volume units
    :func:`pygim_tpu.tune.autotuner.plan_statistics` reports:

    * ``psum``       — per-device volume = bytes × (nd−1)/nd × 2
    * ``all_gather`` — received rows = everything but the own shard
    * ``all_to_all`` — the whole (nd·K, H) exchange buffer
    * ``ring``       — one collective-permute shift (the model charges
      ``n_dispatch = nd−1`` of them)

    Persisted per (platform, device count) — the reference keyed its
    bandwidth tables per block size (utils/autotuner.py:24-39); an ICI
    mesh needs them per topology instead. On a CPU virtual mesh the
    numbers calibrate the VIRTUAL backend (useful for relative choices
    in tests); real-mesh runs overwrite the honest values.
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from pygim_tpu.utils.timers import device_time

    devs = jax.devices()
    nd = n_devices or len(devs)
    if nd > len(devs):
        raise ValueError(f"{nd} devices requested, {len(devs)} available")
    devs = devs[:nd]
    platform = devs[0].platform
    path = _ici_cache_path(platform, nd, rows, h)
    if save and path.exists():
        try:
            return json.loads(path.read_text())
        except Exception:
            pass

    mesh = Mesh(np.array(devs), ("sp",))
    # disable the replicated-output check: it can't be statically
    # inferred for these micro-bodies (psum/all_gather ARE replicated).
    # The public jax.shard_map names the flag check_vma; older releases
    # only have the experimental entry point with check_rep.
    try:
        sm = functools.partial(
            jax.shard_map, mesh=mesh, check_vma=False
        )
        sm(lambda: None, in_specs=(), out_specs=P())  # probe the kwargs
    except TypeError:
        from jax.experimental.shard_map import shard_map as _shard_map

        sm = functools.partial(_shard_map, mesh=mesh, check_rep=False)

    def timed(fn, in_spec, out_spec, shape):
        x = jnp.ones(shape, dtype=jnp.float32)
        f = jax.jit(sm(fn, in_specs=in_spec, out_specs=out_spec))
        return device_time(f, x, iters=5)

    frac = (nd - 1) / nd
    out: dict = {}
    # (name, body, in_spec, out_spec, global_shape(r), volume(r))
    cases = [
        (
            "psum",
            lambda x: jax.lax.psum(x, "sp"),
            P("sp"), P(),
            lambda r: (nd * r, h),
            lambda r: r * h * 4 * frac * 2,
        ),
        (
            "all_gather",
            lambda x: jax.lax.all_gather(x, "sp", tiled=True),
            P("sp"), P(),
            lambda r: (nd * r, h),
            lambda r: (nd - 1) * r * h * 4,
        ),
        (
            "all_to_all",
            lambda x: jax.lax.all_to_all(
                x, "sp", split_axis=0, concat_axis=0, tiled=True
            ),
            P("sp"), P("sp"),
            lambda r: (nd * nd * r, h),
            lambda r: nd * r * h * 4,
        ),
        (
            "ring",
            lambda x: jax.lax.ppermute(
                x, "sp", [(i, (i + 1) % nd) for i in range(nd)]
            ),
            P("sp"), P("sp"),
            lambda r: (nd * r, h),
            lambda r: r * h * 4,
        ),
    ]
    for name, body, ispec, ospec, shape, vol in cases:
        r_small, r_big = 8, rows
        t1 = timed(body, ispec, ospec, shape(r_small))
        t2 = timed(body, ispec, ospec, shape(r_big))
        v1, v2 = vol(r_small), vol(r_big)
        if t2 > t1:
            bw = (v2 - v1) / (t2 - t1)
            fixed = max(0.0, t1 - v1 / bw)
        else:  # degenerate (overhead-dominated at both sizes)
            bw = v2 / max(1e-9, t2)
            fixed = 0.0
        out[name] = {"bw": float(bw), "fixed_us": float(fixed * 1e6)}
    # provenance metadata (not a collective name — consumers look up
    # specific names only): records WHICH backend calibrated these; a
    # "cpu" platform means a virtual mesh priced the exchanges
    out["__meta"] = {"platform": platform, "n_devices": nd}
    if save:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(out))
    return out


def measure_constants(
    save: bool = True,
    n: int = 1 << 21,
    h: int = 256,
    g: int = 2_000_000,
) -> TpuCostModel:
    """On-device microbenchmark of streaming/gather bandwidth — the honest
    version of the reference's hard-coded bandwidth tables
    (autotuner.py:23-89). Requires a few seconds of device time."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pygim_tpu.utils.timers import device_time

    # defaults: 2 GB stream / 2 GB gather out
    x = jnp.ones((n, h), dtype=jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, n, g), dtype=jnp.int32
    )
    copy = jax.jit(lambda a: a * 1.0000001)
    gather = jax.jit(lambda a, i: jnp.take(a, i, axis=0))

    stream_bw = 2 * n * h * 4 / device_time(copy, x, iters=5)
    gather_bw = 2 * g * h * 4 / device_time(gather, x, idx, iters=5)
    hbm = _DEFAULTS["hbm_bw"]
    model = TpuCostModel(
        hbm_bw=hbm,
        ici_bw=_DEFAULTS["ici_bw"],
        gather_eff=min(1.0, gather_bw / hbm),
        stream_eff=min(1.0, stream_bw / hbm),
        fixed_us=_DEFAULTS["fixed_us"],
        provenance=f"measured:{jax.devices()[0].platform}+ell-issue:v5e",
    )
    if save:
        _CACHE.parent.mkdir(parents=True, exist_ok=True)
        _CACHE.write_text(json.dumps(dataclasses.asdict(model)))
    return model
