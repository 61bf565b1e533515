"""Find the XLA glue that compiles to GBs in the G2 windows module."""
import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np, jax.numpy as jnp
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import kgroup, SENTINEL

ops = curve_ops("bls12_381")
kg = kgroup(ops.params.q, ops.fq.n, "g2")
R = kg.R; PCR = kg.k.PCR
N = 1 << 16; B = 128; G = N // B; S = G // 128
c = 12; half = 1 << (c-1)
PW16 = 4*PCR + 2
PW16 = -(-PW16 // 64) * 64 + 0   # approximate packed row width
which = sys.argv[1]
t0 = time.time()
def log(*a): print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)
cache0 = set(os.listdir(os.path.join(_ROOT, ".jax_cache")))

if which == "sortgather":
    def f(digits, pa):
        keys, perm = jax.lax.sort_key_val(digits, jnp.arange(N, dtype=jnp.uint32))
        rows16 = jnp.take(pa, perm, axis=0)
        rows = jax.lax.bitcast_convert_type(rows16.reshape(N, PW16 // 2, 2), jnp.uint32)
        PW32 = PW16 // 2
        rows_t = rows.reshape(G, B, PW32).transpose(1, 2, 0)[:, :2*PCR+1]
        return keys, rows_t
    out = jax.jit(f)(jnp.zeros((N,), jnp.uint32), jnp.zeros((N, PW16), jnp.uint16))
elif which == "compact":
    PJ = (3*R+1)//2
    Scap = -(-(min(N, half) + G) // 1024) * 1024
    def f(emits, ekeys, ev):
        Bp = B + 1
        e_rows = emits.reshape(Bp, PJ, G).transpose(0, 2, 1).reshape(Bp*G, PJ)
        e_keys = ekeys.reshape(Bp*G)
        live = (ev.reshape(Bp*G) != 0) & (e_keys != 0)
        ckeys = jnp.where(live, e_keys, SENTINEL)
        ckeys, cperm = jax.lax.sort_key_val(ckeys, jnp.arange(Bp*G, dtype=jnp.uint32))
        packed = jnp.take(e_rows, cperm[:Scap], axis=0)
        part = jnp.stack([packed & jnp.uint32(0xFFFF), packed >> 16], axis=-1).reshape(Scap, 2*PJ)[:, :3*R]
        tgt = jnp.where(ckeys[:Scap] != SENTINEL, ckeys[:Scap] - 1, jnp.uint32(half))
        buckets = jnp.zeros((half+1, 3*R), jnp.uint32).at[tgt].set(part)[:half]
        return buckets
    Bp = B + 1
    out = jax.jit(f)(jnp.zeros((Bp, PJ, S, 128), jnp.uint32),
                     jnp.zeros((Bp, 1, S, 128), jnp.uint32),
                     jnp.zeros((Bp, 1, S, 128), jnp.uint32))
jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
new = set(os.listdir(os.path.join(_ROOT, ".jax_cache"))) - cache0
for f_ in new:
    p = os.path.join(_ROOT, ".jax_cache", f_)
    log(f_, f"{os.path.getsize(p)/1e6:.1f} MB")
log("done")
