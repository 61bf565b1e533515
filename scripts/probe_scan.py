"""Does the windows lax.scan unroll? Compare entry sizes vs nwin."""
import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.msm.msm_split import msm_windows
from zkp_tpu.curve.pkernels import kgroup

ops = curve_ops("bls12_381")
kg = kgroup(ops.params.q, ops.fq.n, "g2")
N = 1 << 16
nbits = int(sys.argv[1])
c, B = 12, 128
t0 = time.time()
def log(*a): print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)
cache0 = set(os.listdir(os.path.join(_ROOT, ".jax_cache")))
PCR = kg.k.PCR
w = 4*PCR + 2
pw = -(-w // 64) * 64
pa = jnp.zeros((N, pw), jnp.uint16).at[:, 4*PCR].set(1)
scal = jnp.zeros((N, ops.fr.n), jnp.uint32)
out = msm_windows(kg, pa, scal, c=c, B=B, nbits=nbits)
jax.device_get(out.ravel()[:1])
new = set(os.listdir(os.path.join(_ROOT, ".jax_cache"))) - cache0
tot = 0
for f_ in sorted(new):
    p = os.path.join(_ROOT, ".jax_cache", f_)
    sz = os.path.getsize(p); tot += sz
    if sz > 1e6: log(f_[:40], f"{sz/1e6:.1f} MB")
log(f"nbits={nbits} total new cache: {tot/1e6:.1f} MB")
