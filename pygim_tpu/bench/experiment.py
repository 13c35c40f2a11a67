"""Experiment config points, frozen-name ledger, and the sweep runner.

The reference's ``Experiment`` dataclass (utils/experiment.py:146-171)
carried both run-time and compile-time knobs and shelled out to the entry
scripts after cmake'ing one ``.so`` per flag set (experiment.py:101-143,
361-466). On TPU every knob is a runtime/jit parameter, so a sweep is a
plain in-process loop; what we keep is the operational discipline:

* frozen-parameter result names (experiment.py:214-309),
* the done/failed/todo ledger with skip-or-retry semantics
  (experiment.py:350-356, helpers.py:71-89),
* failures preserved as ``.failed`` output files (experiment.py:450-457),
* ``dry_run`` exercising config expansion without hardware
  (experiment.py:50-77).
"""

from __future__ import annotations

import dataclasses
import io
import json
import logging
import traceback
from pathlib import Path
from typing import Iterable, Optional

from pygim_tpu.ops.spmm import SpmmConfig
from pygim_tpu.utils.metrics import DataReporter


@dataclasses.dataclass(frozen=True)
class Experiment:
    """One run point. Field names follow the reference where the concept
    survives (dataset, sp/ds parts, sp_format, dtype, balance, repeat,
    model, num_layers, tune — experiment.py:146-171); compile-time-only
    knobs (tasklets, locks, cache size, sync) are replaced by the runtime
    block/backend knobs."""

    dataset: str = "pubmed"
    kind: str = "spmm"            # spmm | inference | scaling | training
    model: str = "gcn"
    num_layers: int = 2
    hidden: int = 256
    sp_parts: int = 1
    ds_parts: int = 1
    sp_format: str = "csr"
    dtype: str = "float32"        # spmm value / aggregation dtype
    backend: str = "blocked"
    balance: str = "nnz"
    block_nnz_budget: int = 1 << 17
    ell_degree: int = 0                # 0 = auto (choose_ell_degree)
    ell_tables: int = 3                # auto-degree: max multi-degree ELL
                                       # tables (1 = single-table A/B)
    hybrid_core_bytes: int = 4 << 30   # hybrid backend core budget
    hybrid_dtype: str = ""             # "" = vals dtype; "bfloat16" option
    hybrid_shape: str = "square"       # core region: square | stair
                                       # (core/stair.py banded region)
    stair_max_bands: int = 8           # stair: band budget
    bcsr_bytes: int = 0                # hybrid BCSR middle-tier budget
    bcsr_tile: int = 32                # BCSR tile rows
    bcsr_order: str = "rank"           # BCSR ordering (rank | rcm | lp)
    bcsr_layout: str = "row"           # BCSR scheduling (row | panel)
    exchange: str = "all_to_all"       # scaling kind: halo exchange
    cluster: str = ""                  # scaling kind: node order for the
                                       # halo partition ("", rcm, lp,
                                       # metis — core/cluster.py)
    device_counts: str = ""            # scaling kind: comma list, e.g.
                                       # "1,8" — virtual-CPU meshes abort
                                       # on >40 s collective rendezvous,
                                       # so big graphs skip the low
                                       # counts whose per-pair transfer
                                       # is huge (measured at 268M edges)
    scale_model: bool = False          # scaling kind: time the FULL model
                                       # forward, not the raw SpMM
    phases: bool = False               # spmm kind: per-phase [DATA] times
    validate: bool = False             # inference kind: per-layer check
    epochs: int = 50                   # training kind
    lr: float = 0.01                   # training kind
    parity: bool = True                # training kind: retrain on the
                                       # oracle aggregate and compare.
                                       # The raw-edge oracle backward
                                       # materializes (nnz, H) — beyond
                                       # ~10M edges (measured 117 GB OOM
                                       # at reddit scale) set
                                       # oracle_chunk instead
    oracle_chunk: int = 0              # training kind: >0 streams the
                                       # parity oracle in edge chunks
                                       # (memory-bounded forward AND
                                       # backward — reference.py
                                       # spmm_coo_oracle_chunked)
    part_size: int = 0                 # >0: run on ONE cluster partition
                                       # of ~part_size nodes — the
                                       # reference's AmazonProducts path
                                       # (ClusterData ~500k-node parts,
                                       # partition[1] only,
                                       # inference.py:64-73)
    part_idx: int = 1                  # which partition (reference: 1)
    part_method: str = "none"          # none|rcm|lp|metis (data/datasets
                                       # .py cluster_partition)
    repeat: int = 3
    tune: bool = False
    data_tag: str = ""            # free-form provenance tag for the
                                  # frozen name (e.g. "realfmt" = bytes
                                  # read through the real-format
                                  # parsers via a data_root override) —
                                  # keeps such entries from clobbering
                                  # the synthetic-path ledger records

    def frozen_name(self) -> str:
        """Deterministic result-file stem from the params
        (experiment.py:214-234 analog). Fields at their default value are
        omitted (except the always-identifying dataset/kind/backend) so
        names stay under the filesystem's 255-char limit and remain
        stable when new knobs are added with defaults."""
        d = dataclasses.asdict(self)
        keep = {"dataset", "kind", "backend"}
        defaults = {
            f.name: f.default for f in dataclasses.fields(Experiment)
        }
        return "_".join(
            f"{k}-{d[k]}"
            for k in sorted(d)
            if k in keep or d[k] != defaults[k]
        )

    def spmm_config(self) -> SpmmConfig:
        return SpmmConfig(
            format=self.sp_format, backend=self.backend,
            balance=self.balance, block_nnz_budget=self.block_nnz_budget,
            ell_degree=self.ell_degree or None,
            ell_tables=self.ell_tables,
            hybrid_core_bytes=self.hybrid_core_bytes,
            hybrid_dtype=self.hybrid_dtype or None,
            hybrid_shape=self.hybrid_shape,
            stair_max_bands=self.stair_max_bands,
            bcsr_bytes=self.bcsr_bytes, bcsr_tile=self.bcsr_tile,
            bcsr_order=self.bcsr_order, bcsr_layout=self.bcsr_layout,
            hidden_hint=self.hidden,
        )

    def matches_legacy_stem(self, stem: str) -> bool:
        """True when ``stem`` is a ledger name this experiment would have
        produced under an OLDER field vintage. Legacy stems (pre
        default-omission) wrote every then-existing field in sorted-key
        order, so: every token present must match this experiment's
        value exactly, and a field absent from the stem (it didn't exist
        yet) must sit at its default here — old runs behaved as the
        default behaves."""
        d = dataclasses.asdict(self)
        defaults = {
            f.name: f.default for f in dataclasses.fields(Experiment)
        }
        rest = stem
        for k in sorted(d):
            tok = f"{k}-{d[k]}"
            if rest == tok:
                rest = ""
            elif rest.startswith(tok + "_"):
                rest = rest[len(tok) + 1:]
            elif d[k] != defaults[k]:
                return False  # non-default value missing from the stem
        return rest == ""

    def status_at(self, results_dir) -> str:
        """done | failed | todo (experiment.py:350-356). Probes the
        current (defaults-omitted) stem first, then any legacy-vintage
        stem in the ledger — so sweeps queued against a pre-round-2
        ledger don't silently re-run completed experiments at
        minutes-to-hours per TPU job."""
        stem = Path(results_dir) / self.frozen_name()
        if stem.with_suffix(".out").exists():
            return "done"
        if stem.with_suffix(".failed").exists():
            return "failed"
        rd = Path(results_dir)
        if rd.is_dir():
            for p in rd.iterdir():
                if p.suffix in (".out", ".failed") and \
                        self.matches_legacy_stem(p.stem):
                    return "done" if p.suffix == ".out" else "failed"
        return "todo"

    def run(self, results_dir, data_root: Optional[str] = None) -> dict:
        """Execute in-process; write the ``[DATA]`` record + JSON means to
        the ledger. Raises on failure after writing the ``.failed`` file."""
        from pygim_tpu.bench.runners import (
            run_inference_benchmark,
            run_spmm_benchmark,
        )
        from pygim_tpu.data import load_dataset
        from pygim_tpu.utils.compile_cache import enable as _enable_cache

        _enable_cache()  # share compiled executables across ledger runs

        results_dir = Path(results_dir)
        results_dir.mkdir(parents=True, exist_ok=True)
        stem = results_dir / self.frozen_name()
        rep = DataReporter(echo=False)
        try:
            kw = {} if data_root is None else {"root": data_root}
            ds = load_dataset(self.dataset, **kw)
            if self.part_size > 0:
                from pygim_tpu.data import cluster_partition

                ds = cluster_partition(
                    ds, part_size=self.part_size,
                    part_idx=self.part_idx, method=self.part_method,
                )
                rep.report("part_nodes", ds.num_nodes)
                rep.report("part_edges", ds.graph.nnz)
            cfg = self.spmm_config()
            if self.tune:
                from pygim_tpu.tune import autotune

                cfg = autotune(ds.graph, self.hidden).config
                # record the tuner's pick — the frozen name carries the
                # PRE-tune backend, so the choice must be observable here
                rep.report("tuned_backend", cfg.backend)
                rep.report("tuned_balance", cfg.balance)
                rep.report("tuned_block_nnz_budget", cfg.block_nnz_budget)
            mesh = None
            if self.sp_parts * self.ds_parts > 1:
                from pygim_tpu.parallel import make_mesh

                mesh = make_mesh(self.sp_parts, self.ds_parts)
            if self.kind == "spmm":
                run_spmm_benchmark(
                    ds, hidden=self.hidden, dtype=self.dtype, config=cfg,
                    repeat=self.repeat, reporter=rep, mesh=mesh,
                    phases=self.phases,
                )
            elif self.kind == "inference":
                run_inference_benchmark(
                    ds, model=self.model, num_layers=self.num_layers,
                    hidden=self.hidden,
                    agg_dtype=None if self.dtype == "float32" else self.dtype,
                    config=cfg, repeat=self.repeat, reporter=rep, mesh=mesh,
                    validate=self.validate,
                )
            elif self.kind == "scaling":
                from pygim_tpu.bench.scaling import run_scaling_benchmark

                run_scaling_benchmark(
                    ds,
                    device_counts=(
                        [int(c) for c in self.device_counts.split(",")]
                        if self.device_counts else None
                    ),
                    hidden=self.hidden, exchange=self.exchange,
                    config=cfg, repeat=self.repeat, reporter=rep,
                    model=self.model if self.scale_model else None,
                    num_layers=self.num_layers,
                    agg_dtype=(
                        None if self.dtype == "float32" else self.dtype
                    ),
                    order=self.cluster or None,
                )
            elif self.kind == "training":
                from pygim_tpu.bench.runners import run_training_benchmark

                run_training_benchmark(
                    ds, model=self.model, num_layers=self.num_layers,
                    hidden=self.hidden, config=cfg, epochs=self.epochs,
                    lr=self.lr, reporter=rep, mesh=mesh,
                    parity=self.parity,
                    oracle_chunk=self.oracle_chunk or None,
                )
            else:
                raise ValueError(f"unknown kind {self.kind!r}")
        except Exception:
            stem.with_suffix(".failed").write_text(
                _render_record(self, rep) + "\n" + traceback.format_exc()
            )
            raise
        means = rep.means()
        stem.with_suffix(".out").write_text(_render_record(self, rep))
        stem.with_suffix(".json").write_text(json.dumps(means, indent=1))
        return means


def _render_record(exp: Experiment, rep: DataReporter) -> str:
    buf = io.StringIO()
    print(f"# {exp.frozen_name()}", file=buf)
    for k, vs in rep.records.items():
        for v in vs:
            print(f"[DATA]{k}: {v}", file=buf)
    return buf.getvalue()


def run_experiments(
    experiments: Iterable[Experiment],
    results_dir,
    *,
    retry_failed: bool = False,
    dry_run: bool = False,
    logger: Optional[logging.Logger] = None,
    data_root: Optional[str] = None,
) -> dict[str, dict]:
    """Sweep driver (helpers.py:44-103 analog): skip done, optionally retry
    failed, collect means per frozen name. Failures don't abort the
    sweep."""
    log = logger or logging.getLogger("pygim_tpu.bench")
    results = {}
    for exp in experiments:
        name = exp.frozen_name()
        status = exp.status_at(results_dir)
        if status == "done" or (status == "failed" and not retry_failed):
            log.info("skip [%s] %s", status, name)
            if status == "done":
                p = Path(results_dir) / (name + ".json")
                if p.exists():
                    results[name] = json.loads(p.read_text())
            continue
        if dry_run:
            log.info("dry-run %s", name)
            continue
        log.info("run %s", name)
        try:
            results[name] = exp.run(results_dir, data_root=data_root)
        except Exception as e:  # ledger already has the .failed record
            log.error("FAILED %s: %s", name, e)
            # release device memory before the next experiment: a
            # RESOURCE_EXHAUSTED prepare leaves multi-GB arrays live in
            # traceback frame refs and jitted-function caches — without
            # this, later experiments in the sweep OOM collaterally
            # (measured: the round-3 products 8 GiB OOM took the
            # fitting 6 GiB re-run down with it)
            import gc

            import jax

            gc.collect()
            try:
                jax.clear_caches()
            except Exception:
                pass
            gc.collect()
    return results
