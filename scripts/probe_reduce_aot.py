import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import kgroup
from zkp_tpu.msm.msm_split import msm_reduce
from zkp_tpu.msm.aot_dispatch import source_tag, _default_cache_dir
from zkp_tpu.utils.aot import cached_export
t0=time.time()
def log(*a): print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)
ops = curve_ops("bls12_381")
kg = kgroup(ops.params.q, ops.fq.n, "g2")
bk = jnp.zeros((22, 2048, 3*kg.R), jnp.uint32)
fn = jax.jit(lambda b: msm_reduce(kg, b, c=12))
rcall = cached_export(fn, (bk,), _default_cache_dir(),
                      source_tag("bls12_381", "g2", "r"), log)
out = rcall(bk)
jax.device_get(out.ravel()[:1])
log("exported reduce compiled+ran ok", out.shape)
