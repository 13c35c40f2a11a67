#!/bin/bash
# Measure the round-4 tuner's single-chip argmin on reddit: int8-8GiB
# core + 1 GiB rank-ordered BCSR tier (model says it beats the shipped
# pure 12 GiB core; the model also under-prices the ELL tail — twice
# refuted on budget questions — so measurement decides).
until grep -q "reddit prep int8/8GiB+bcsr1GiB" /tmp/prebuild_bcsr.log 2>/dev/null; do
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
                 hybrid_core_bytes=8 << 30, hybrid_dtype="int8",
                 bcsr_bytes=1 << 30, bcsr_tile=32, bcsr_order="rank")
print(exp.frozen_name())
print(exp.run("/root/repo/results"))
EOF
