#!/bin/bash
# Tracked config 2: 2-layer GCN Reddit end-to-end with per-layer
# activation validation, int8 12 GiB core + multi-degree tail.
until grep -q "reddit bench prep int8/12GiB" /tmp/prebuild.log 2>/dev/null; do
  sleep 30
done
cd /root/repo
timeout 7200 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from pygim_tpu.utils.compile_cache import enable
enable()
from pygim_tpu.bench.experiment import Experiment

exp = Experiment(dataset="reddit", kind="inference", model="gcn",
                 num_layers=2, dtype="float32", hidden=256, backend="hybrid",
                 hybrid_core_bytes=12 << 30, hybrid_dtype="int8",
                 validate=True)
print(exp.frozen_name())
print(exp.run("/root/repo/results"))
EOF
