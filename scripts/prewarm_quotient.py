"""Prewarm the prove quotient pipeline (KNTT 2^16 kernels) on TPU."""
import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from scripts.prove_bench import build_fixture
t0 = time.time()
def log(*a): print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)
pk, witness = build_fixture("bls12_381", 16, log=log)
z = witness.device()
from zkp_tpu.field.kfield import kfield
ops_fr = pk.qap.fr
log("computing h (compiles KNTT 2^16 kernels + from_mont)...")
h = pk.qap.compute_h(z)
import numpy as np
log(f"h done: {np.asarray(jax.device_get(h[:1]))[0][:3]}")
t1 = time.time()
h = pk.qap.compute_h(z)
jax.device_get(h[:1])
log(f"h warm: {time.time()-t1:.3f}s")
