"""Host-side prebuild for the reddit-uniq fidelity sibling (config 1b)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

from pygim_tpu.data import load_dataset
from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm

t0 = time.time()
ds = load_dataset("reddit-uniq")
g = ds.graph
log(f"reddit-uniq: N={g.nrows} E={g.nnz} [{time.time()-t0:.0f}s]")
cfg = SpmmConfig(backend="hybrid", format="csr",
                 hybrid_core_bytes=12 << 30, hybrid_dtype="int8")
t0 = time.time()
prep = prepare_spmm(g, cfg)
log(f"reddit-uniq prep int8/12GiB: k={prep.hybrid_k_eff} [{time.time()-t0:.0f}s]")
