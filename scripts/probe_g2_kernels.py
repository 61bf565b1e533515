"""Compile G2 kernels one at a time to find the 2.7GB executable."""
import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import kgroup

ops = curve_ops("bls12_381")
kg = kgroup(ops.params.q, ops.fq.n, "g2")
R = kg.R; PCR = kg.k.PCR
B, S = 128, 4   # npad 2^16, G=512
which = sys.argv[1] if len(sys.argv) > 1 else "run_scan"
t0 = time.time()
def log(*a): print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)

if which == "run_scan":
    A_key = jnp.zeros((B, 2*PCR+3, S, 128), jnp.uint32)
    f = jax.jit(lambda a: kg.run_scan(a))
    out = f(A_key)
    log("run_scan ok", [o.shape for o in jax.tree.leaves(out)][:2])
elif which == "fold":
    Bc = 8; rounds = 10
    kv = jnp.zeros((3*R, Bc, 128), jnp.uint32)
    masks = jnp.zeros((rounds, Bc, 128), jnp.uint32)
    f = jax.jit(lambda a, m: kg.fold_tree(a, rounds, m))
    out = f(kv, masks)
    log("fold_tree ok", out.shape)
elif which == "reduce":
    from zkp_tpu.msm.msm_split import msm_reduce
    bk = jnp.zeros((22, 2048, 3*R), jnp.uint32)
    out = msm_reduce(kg, bk, c=12)
    log("reduce ok", out.shape)
jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
log("done")
