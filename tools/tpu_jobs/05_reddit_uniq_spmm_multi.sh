#!/bin/bash
# Tracked config 1b: reddit-uniq (simple-graph fidelity sibling) under the
# multi-degree tail. Gated on its own host prebuild.
until grep -q "reddit-uniq prep int8/12GiB" /tmp/prebuild_uniq.log 2>/dev/null; do
  sleep 30
done
cd /root/repo
timeout 7200 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from pygim_tpu.utils.compile_cache import enable
enable()
from pygim_tpu.bench.experiment import Experiment

exp = Experiment(dataset="reddit-uniq", kind="spmm", sp_format="csr",
                 dtype="float32", hidden=256, backend="hybrid", phases=True,
                 hybrid_core_bytes=12 << 30, hybrid_dtype="int8")
print(exp.frozen_name())
print(exp.run("/root/repo/results"))
EOF
