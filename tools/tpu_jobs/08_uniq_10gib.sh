#!/bin/bash
# Budget A/B under the multi-degree tail: does the 12 GiB core still
# beat 10 GiB on the simple graph (the model predicts the opposite; the
# round-3 single-table measurement said 12 wins by 20 ms)?
until grep -q "reddit-uniq prep int8/10GiB" /tmp/prebuild_uniq10.log 2>/dev/null; do
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
                 hybrid_core_bytes=10 << 30, hybrid_dtype="int8")
print(exp.frozen_name())
print(exp.run("/root/repo/results"))
EOF
