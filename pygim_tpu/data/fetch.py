"""CLI: attempt the official dataset downloads and print an attempt log.

``python -m pygim_tpu.data.fetch pubmed [reddit ...]`` — in an environment
with network access this populates the raw layouts that
``pygim_tpu.data.real`` parses; in this sandbox it records the exact
failures (docs/DATASETS.md)."""

from __future__ import annotations

import argparse

from pygim_tpu.data.datasets import _DEFAULT_CACHE
from pygim_tpu.data.real import DOWNLOAD_URLS, fetch


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+", choices=sorted(DOWNLOAD_URLS))
    ap.add_argument("--root", default=_DEFAULT_CACHE)
    args = ap.parse_args(argv)
    any_fail = False
    for name in args.names:
        for line in fetch(name, args.root):
            print(line)
            any_fail |= line.startswith("FAIL")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
