"""Per-stage timing of the kntt pipeline at 2^18 on TPU."""
import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.ntt.ntt import domain_for
from zkp_tpu.ntt.kntt import kntt_for, _dft_pass, _mul_k

ops = curve_ops("bls12_381"); fr = ops.fr
log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
dom = domain_for(ops.params, log_n)
k = kntt_for(fr.p, fr.n, log_n, dom.omega)
n = 1 << log_n
x = fr.random(seed=5, shape=(n,))
xk = jnp.transpose(x, (1, 0))
L, N1, N2 = k.L, k.N1, k.N2

def fence(o): return jax.device_get(jax.tree.leaves(o)[0].ravel()[:1])

def t(label, f, *args, reps=5):
    o = f(*args); fence(o)           # warm
    ts = []
    for _ in range(reps):
        t0 = time.time(); o = f(*args); fence(o); ts.append(time.time()-t0)
    print(f"{label:26s} {min(ts)*1000:8.2f} ms")
    return o

x3 = xk.reshape(L, N1, N2)
y = t("dft A (M=%d)" % N1, lambda a: _dft_pass(fr.p, L, N1, "dif", a, k.twA_f), x3)
y2 = t("mul_k mid", lambda a: _mul_k(fr.p, L, a, k.mid_f), y)
sw = jax.jit(lambda a: jnp.swapaxes(a, 1, 2))
y3 = t("transpose", sw, y2)
z = t("dft B (M=%d)" % N2, lambda a: _dft_pass(fr.p, L, N2, "dif", a, k.twB_f), y3)
zf = z.reshape(L, n)
tk = jax.jit(lambda a: jnp.take(a, k._perm, axis=1))
t("nat perm take", tk, zf)
f_all = jax.jit(k.fast_ntt)
t("fast_ntt (one jit)", f_all, xk)
f_nat = jax.jit(lambda a: k.ntt(a))
t("natural ntt (one jit)", f_nat, xk)
# old path comparison
told = dom._jitted.__wrapped__ if hasattr(dom._jitted, "__wrapped__") else None
