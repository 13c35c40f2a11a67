#!/bin/bash
# Tracked config 3: GIN (COO) + SAGE (CSR) on ogbn-arxiv, autotuned —
# re-run under the round-4 tuner (multi-degree tables priced from the
# same split the prepare builds). Arxiv is small; compile-dominated.
cd /root/repo
timeout 7200 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from pygim_tpu.utils.compile_cache import enable
enable()
from pygim_tpu.bench.experiment import Experiment

for model, fmt in (("gin", "coo"), ("sage", "csr")):
    exp = Experiment(dataset="ogbn-arxiv", kind="inference", model=model,
                     sp_format=fmt, tune=True)
    print(exp.frozen_name())
    print(exp.run("/root/repo/results"))
EOF
