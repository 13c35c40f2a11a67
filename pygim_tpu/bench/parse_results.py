"""Result-directory → CSV export (parse_results.py analog).

Walks a ledger directory of ``.out`` files, extracts ``[DATA]`` keys per
repeat, derives ``pim_time_dense = pim_time_spmm − load_sparse_time`` when
both present (parse_results.py:52-60), and writes per-run rows plus an
``average_all.csv`` keyed by the filename-encoded params
(parse_results.py:26-72)."""

from __future__ import annotations

import csv
import dataclasses
import re
from pathlib import Path

from pygim_tpu.utils.metrics import mean_data, parse_data_lines


def _known_fields() -> list[str]:
    from pygim_tpu.bench.experiment import Experiment

    return [f.name for f in dataclasses.fields(Experiment)]


def _params_from_name(stem: str) -> dict:
    """Recover ``{field: value}`` from an ``Experiment.frozen_name`` stem.

    Field names themselves contain underscores (``block_nnz_budget``), so a
    naive ``split('_')`` mangles them; instead anchor on the known
    Experiment field names (longest match wins) and take everything up to
    the next ``_<field>-`` as the value."""
    fields = sorted(_known_fields(), key=len, reverse=True)
    pat = re.compile(
        "(?:^|_)(" + "|".join(re.escape(f) for f in fields) + ")-"
    )
    hits = list(pat.finditer(stem))
    if not hits:  # not a frozen_name — fall back to plain tokens
        out = {}
        for tok in stem.split("_"):
            if "-" in tok:
                k, v = tok.split("-", 1)
                out[k] = v
        return out
    out = {}
    for i, m in enumerate(hits):
        end = hits[i + 1].start() if i + 1 < len(hits) else len(stem)
        out[m.group(1)] = stem[m.end() : end]
    return out


def results_to_csv(results_dir, out_csv=None) -> Path:
    results_dir = Path(results_dir)
    out_csv = Path(out_csv) if out_csv else results_dir / "average_all.csv"
    rows = []
    for f in sorted(results_dir.glob("*.out")):
        parsed = parse_data_lines(f.read_text().splitlines())
        means = mean_data(parsed)
        if (
            "pim_time_spmm(ms)" in means
            and "load_sparse_time(ms)" in means
        ):
            means["pim_time_dense(ms)"] = (
                means["pim_time_spmm(ms)"] - means["load_sparse_time(ms)"]
            )
        rows.append({**_params_from_name(f.stem), **means})
    if not rows:
        out_csv.write_text("")
        return out_csv
    fields = sorted({k for r in rows for k in r})
    with out_csv.open("w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    return out_csv
