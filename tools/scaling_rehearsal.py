#!/usr/bin/env python3
"""Config-5 rehearsal driver (BASELINE papers100M, SURVEY §5.7): run ONE
scaling experiment per process on the 8-device virtual CPU mesh, with
XLA's collective-rendezvous termination timeout RAISED.

Why: the virtual mesh timeshares 8 shard threads over this host's 4
cores, so arrival skew into a collective grows with per-shard work; the
default 40 s wall (rendezvous.cc) is what aborted every rehearsal past
~17M edges/shard (docs/SCALING.md "Virtual-mesh rehearsal ceiling").
``--xla_cpu_collective_call_terminate_timeout_seconds`` lifts it — the
skew is benign timesharing, not deadlock. Real ICI meshes never hit
this path.

Usage:
  python tools/scaling_rehearsal.py <dataset> <exchange> <device_counts>
      [results_dir] [hidden] [order]
  python tools/scaling_rehearsal.py rmat-16777216-268435456 all_to_all 1,8
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_collective_call_terminate_timeout_seconds="
    + os.environ.get("PYGIM_RENDEZVOUS_TIMEOUT_S", "1800")
).strip()

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env var alone is unreliable
                                           # under the axon sitecustomize


def main():
    dataset = sys.argv[1]
    exchange = sys.argv[2] if len(sys.argv) > 2 else "all_to_all"
    counts = sys.argv[3] if len(sys.argv) > 3 else "1,8"
    results = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/results"
    hidden = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    order = sys.argv[6] if len(sys.argv) > 6 else ""

    print(f"devices: {len(jax.devices())}", flush=True)
    from pygim_tpu.bench.experiment import Experiment

    exp = Experiment(
        dataset=dataset, kind="scaling", backend="ell", hidden=hidden,
        exchange=exchange, device_counts=counts, repeat=1,
        cluster=order,
    )
    print(exp.frozen_name(), flush=True)
    res = exp.run(results)
    for k in sorted(res):
        if "edges_per_s" in k or "efficiency" in k or "halo" in k:
            print(f"  {k}: {res[k]}", flush=True)


if __name__ == "__main__":
    main()
