"""Background: build (or load) the 2^16 prove fixture on TPU."""
import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from scripts.prove_bench import build_fixture

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
t0 = time.time()
pk, w = build_fixture("bls12_381", log_n, log=log)
log(f"fixture ready in {time.time()-t0:.1f}s V={pk.qap.num_variables} n={pk.qap.n}")
