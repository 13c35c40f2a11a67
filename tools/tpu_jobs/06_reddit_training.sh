#!/bin/bash
# Resolve round-3's failed reddit training entry: the oracle-parity
# backward OOMs at reddit scale (117 GB — measured), so parity=False
# (the Experiment toggle added for exactly this). 3 epochs of the real
# 2-layer GCN training loop on the hybrid bf16-8GiB aggregate.
until grep -q "reddit prep bf16/8GiB" /tmp/prebuild_bf16_8.log 2>/dev/null; do
  sleep 30
done
cd /root/repo
timeout 7200 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from pygim_tpu.utils.compile_cache import enable
enable()
from pygim_tpu.bench.experiment import Experiment

exp = Experiment(dataset="reddit", kind="training", epochs=3, repeat=1,
                 backend="hybrid", hybrid_core_bytes=8 << 30,
                 hybrid_dtype="bfloat16", parity=False)
print(exp.frozen_name())
print(exp.run("/root/repo/results"))
EOF
