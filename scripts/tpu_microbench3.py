"""TPU microbench v3: K-scaling-validated dependent chains.

Every benchmark runs the SAME jit at two different in-jit iteration counts
(K and 2K) and reports both times; a valid measurement scales ~linearly in K.
Bodies are genuinely dependent (carried whole-array state) and the final
output is a full-array materialization.
"""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

def timeit(f, *a, iters=3):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(f(*a))
        ts.append(time.time() - t0)
    return min(ts)

def report(name, make_fn, unit_count_per_iter, Ks=(8, 16)):
    times = []
    for K in Ks:
        f = make_fn(K)
        t = timeit(f)
        times.append(t)
        print(f"  {name} K={K}: {t*1e3:8.2f} ms -> {K*unit_count_per_iter/t/1e9:10.2f} Gunits/s",
              flush=True)
    dt = times[-1] - times[0]
    dK = Ks[-1] - Ks[0]
    if dt > 1e-5:
        print(f"  {name} marginal: {dK*unit_count_per_iter/dt/1e9:10.2f} Gunits/s  <-- trust this",
              flush=True)

print("platform:", jax.devices()[0], flush=True)
key = jax.random.PRNGKey(0)

# ---------- u32 elementwise mul
N = 1 << 22
a0 = jax.random.randint(key, (N,), 1, 1 << 16, dtype=jnp.uint32)
b0 = jax.random.randint(key, (N,), 1, 1 << 16, dtype=jnp.uint32)

def mk_u32(K):
    @jax.jit
    def f(x, b):
        def body(i, x):
            return x * b + jnp.uint32(1)
        return jax.lax.fori_loop(0, K, body, x, unroll=False)
    return lambda: f(a0, b0)

report("u32 mul+add (4.2M lanes)", mk_u32, N)

# ---------- Fp.mul dependent chain
from zkp_tpu.field import bls12_381
cp = bls12_381()
fq = cp.fq
M = 1 << 17
xa = fq.random(seed=1, shape=(M,))
xb = fq.random(seed=2, shape=(M,))

def mk_fp(K):
    @jax.jit
    def f(x, y):
        def body(i, x):
            return fq.mul(x, y)
        return jax.lax.fori_loop(0, K, body, x)
    return lambda: f(xa, xb)

report(f"Fp.mul ({M},24)", mk_fp, M, Ks=(4, 8))

# ---------- matmul f32, dependent chain (renormalized to avoid inf)
D = 1024
A0 = jax.random.normal(key, (D, D), jnp.float32) / np.sqrt(D)

def mk_mm(K):
    @jax.jit
    def f(A):
        def body(i, X):
            return A @ X
        return jax.lax.fori_loop(0, K, body, A)
    return lambda: f(A0)

report(f"f32 matmul {D}^2@{D}^2 (units=MAC)", mk_mm, D**3)

# ---------- int8->int32 matmul, dependent via cast back
A8 = jax.random.randint(key, (D, D), -4, 4, dtype=jnp.int8)

def mk_mm8(K):
    @jax.jit
    def f(A):
        def body(i, X):
            C = jax.lax.dot_general(A, X, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (C & 7).astype(jnp.int8)
        return jax.lax.fori_loop(0, K, body, A)
    return lambda: f(A8)

report(f"int8 matmul {D}^3 (units=MAC)", mk_mm8, D**3)

# ---------- sort, dependent chain
S = 1 << 20
ks0 = jax.random.randint(key, (S,), 0, 1 << 20, dtype=jnp.uint32)

def mk_sort(K):
    @jax.jit
    def f(ks):
        def body(i, ks):
            s, _ = jax.lax.sort_key_val(ks, ks)
            return s[::-1]  # force next iter to re-sort reversed data
        return jax.lax.fori_loop(0, K, body, ks)
    return lambda: f(ks0)

report("sort 2^20 u32 kv (units=keys)", mk_sort, S, Ks=(2, 4))

# ---------- gather (2^20, 24), dependent chain
T = 1 << 20
tbl0 = jax.random.randint(key, (T, 24), 0, 1 << 16, dtype=jnp.uint32)
perm0 = jax.random.permutation(key, T).astype(jnp.uint32)

def mk_gather(K):
    @jax.jit
    def f(tbl, perm):
        def body(i, tbl):
            return jnp.take(tbl, perm, axis=0)
        return jax.lax.fori_loop(0, K, body, tbl)
    return lambda: f(tbl0, perm0)

report("gather (2^20,24) (units=rows)", mk_gather, T, Ks=(2, 4))

# ---------- transpose (relayout) (2^20,24)->(24,2^20) and back
def mk_tr(K):
    @jax.jit
    def f(tbl):
        def body(i, tbl):
            return tbl.T.reshape(T, 24)[:, ::-1] * 0 + tbl  # dep, includes T relayout
        return jax.lax.fori_loop(0, K, body, tbl)
    return lambda: f(tbl0)

report("transpose+reshape (2^20,24) (units=rows)", mk_tr, T, Ks=(2, 4))
