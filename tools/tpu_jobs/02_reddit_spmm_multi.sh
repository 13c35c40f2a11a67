#!/bin/bash
# Tracked config 1 under the multi-degree ELL tail (ell_tables=3 default):
# fresh ledger entry with the per-phase split. Prep cache shared with the
# bench (same SpmmConfig) so this is load+compile+run only.
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

exp = Experiment(dataset="reddit", kind="spmm", sp_format="csr",
                 dtype="float32", hidden=256, backend="hybrid", phases=True,
                 hybrid_core_bytes=12 << 30, hybrid_dtype="int8")
print(exp.frozen_name())
print(exp.run("/root/repo/results"))
EOF
