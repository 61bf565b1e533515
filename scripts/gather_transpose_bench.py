"""Microbench: MSM data-movement alternatives on TPU.

1. Row gather throughput at 256B (current: (N,64) u32) vs 128B packed
   ((N,32) u32 with two 16-bit limbs per word) vs 192B.
2. The relayout transpose (G,B,PW)->(B,PW,G) vs 2-D formulations.
3. The emit flatten transpose (Bp,3R,G)->(G,Bp,3R).
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    return jax.device_get(jax.tree.leaves(x)[0].ravel()[:1])


def timed(name, f, *a, iters=5):
    fence(f(*a))
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        fence(f(*a))
        best = min(best, time.time() - t0)
    print(f"{name:<52s} {best*1e3:9.2f} ms")
    return best


N = 1 << 20
B, G = 512, 2048
PW = 64
R = 24
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(N).astype(np.uint32))

for cols in (64, 48, 32, 16):
    pa = jnp.asarray(rng.integers(0, 1 << 16, size=(N, cols), dtype=np.uint32))
    f = jax.jit(lambda pa, perm: jnp.take(pa, perm, axis=0))
    t = timed(f"gather (N,{cols}) u32 rows ({cols*4}B)", f, pa, perm)

# u16 rows
for cols in (64, 32):
    pa16 = jnp.asarray(rng.integers(0, 1 << 16, size=(N, cols), dtype=np.uint16))
    f = jax.jit(lambda pa, perm: jnp.take(pa, perm, axis=0))
    timed(f"gather (N,{cols}) u16 rows ({cols*2}B)", f, pa16, perm)

rows = jnp.asarray(rng.integers(0, 1 << 16, size=(N, PW), dtype=np.uint32))

def relayout_3d(rows):
    return rows.reshape(G, B, PW).transpose(1, 2, 0)
timed("relayout transpose (G,B,PW)->(B,PW,G)", jax.jit(relayout_3d), rows)

def relayout_2d(rows):
    return rows.reshape(G, B * PW).T.reshape(B, PW, G)
timed("relayout 2-D transpose (G, B*PW).T", jax.jit(relayout_2d), rows)

def relayout_tmajor(rows):
    # alternative target: (B, S=G/128, 128, PW)? -- time-major gather order
    return rows.reshape(G, B, PW).transpose(1, 0, 2)
timed("relayout transpose (G,B,PW)->(B,G,PW)", jax.jit(relayout_tmajor), rows)

em = jnp.asarray(rng.integers(0, 1 << 16, size=(B + 1, 3 * R, G), dtype=np.uint32))

def emit_flat(em):
    return em.transpose(2, 0, 1).reshape((B + 1) * G, 3 * R)
timed("emit flatten (Bp,3R,G)->(Bp*G,3R) g-major", jax.jit(emit_flat), em)

def emit_flat_t(em):
    return em.transpose(0, 2, 1).reshape((B + 1) * G, 3 * R)
timed("emit flatten (Bp,3R,G)->(Bp*G,3R) t-major", jax.jit(emit_flat_t), em)

# pure HBM copy reference
big = jnp.asarray(rng.integers(0, 1 << 16, size=(N * PW,), dtype=np.uint32))
timed("flat copy 268 MB (x+1)", jax.jit(lambda x: x + 1), big)
