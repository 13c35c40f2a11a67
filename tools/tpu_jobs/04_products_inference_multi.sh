#!/bin/bash
# Tracked config 4: int8-quantized GCN on ogbn-products, int4 6 GiB core,
# multi-degree tail (products tail was D=8 single-table at 2.2386 s —
# the multi-degree split targets exactly its virtual-row overhead).
until grep -q "products prep int4/6GiB" /tmp/prebuild.log 2>/dev/null; do
  sleep 30
done
cd /root/repo
timeout 7200 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from pygim_tpu.utils.compile_cache import enable
enable()
from pygim_tpu.bench.experiment import Experiment

exp = Experiment(dataset="ogbn-products", kind="inference", model="gcn",
                 dtype="int8", backend="hybrid", hybrid_dtype="int4",
                 hybrid_core_bytes=6 << 30, validate=True)
print(exp.frozen_name())
print(exp.run("/root/repo/results"))
EOF
