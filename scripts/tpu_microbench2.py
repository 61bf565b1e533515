"""TPU primitive microbenchmarks v2: loops inside jit to amortize dispatch."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

def timeit(f, *a, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(f(*a))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(f(*a))
        ts.append(time.time() - t0)
    return min(ts)

print("platform:", jax.devices()[0], flush=True)
key = jax.random.PRNGKey(0)
K = 50  # in-jit repetitions

# ---------------- dispatch overhead floor
@jax.jit
def nop(x):
    return x + 1
t = timeit(nop, jnp.zeros((8, 128), jnp.uint32), iters=10)
print(f"dispatch floor (tiny jit): {t*1e3:.2f} ms", flush=True)

# ---------------- u32 elementwise multiply, in-jit loop
N = 1 << 22
a = jax.random.randint(key, (N,), 0, 1 << 16, dtype=jnp.uint32)
b = jax.random.randint(key, (N,), 1, 1 << 16, dtype=jnp.uint32)

@jax.jit
def mulloop(a, b):
    def body(i, x):
        return (x * b + a) & jnp.uint32(0xFFFFFFFF)
    return jax.lax.fori_loop(0, K * 4, body, a)

t = timeit(mulloop, a, b)
print(f"u32 mul+add chain (fori {K*4}x{N}): {K*4*N/t/1e9:.1f} Gmul/s", flush=True)

# ---------------- Fp.mul chained in-jit
from zkp_tpu.field import bls12_381
cp = bls12_381()
fq = cp.fq
M = 1 << 18
xa = fq.random(seed=1, shape=(M,))
xb = fq.random(seed=2, shape=(M,))

@jax.jit
def fqmul_loop(xa, xb):
    def body(i, x):
        return fq.mul(x, xb)
    return jax.lax.fori_loop(0, K, body, xa)

t = timeit(fqmul_loop, xa, xb)
print(f"Fp.mul (N,24) chained: {K*M/t/1e6:.2f} M muls/s ({t*1e3:.1f} ms / {K} iters)", flush=True)

# ---------------- matmuls with in-jit loop
for dt, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
    D = 2048
    if dt == jnp.int8:
        A = jax.random.randint(key, (D, D), -128, 127, dtype=jnp.int8)
        B = jax.random.randint(key, (D, D), -128, 127, dtype=jnp.int8)
        acc_t = jnp.int32
    else:
        A = jax.random.normal(key, (D, D), jnp.float32).astype(dt)
        B = jax.random.normal(key, (D, D), jnp.float32).astype(dt)
        acc_t = jnp.float32

    @jax.jit
    def mmloop(A, B):
        def body(i, acc):
            c = jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_t)
            return acc + c[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    t = timeit(mmloop, A, B)
    print(f"{name} matmul {D}^3 x{K}: {K*2*D**3/t/1e12:.1f} T(fl)ops", flush=True)

# ---------------- sort + gather with in-jit loop
ks = jax.random.randint(key, (1 << 20,), 0, 1 << 16, dtype=jnp.uint32)
idx = jnp.arange(1 << 20, dtype=jnp.uint32)

@jax.jit
def sortloop(ks, idx):
    def body(i, c):
        k2, v2 = jax.lax.sort_key_val(ks + c, idx)
        return c + v2[0]
    return jax.lax.fori_loop(0, 10, body, jnp.uint32(0))

t = timeit(sortloop, ks, idx)
print(f"lax.sort 2^20 u32 kv: {t/10*1e3:.1f} ms/sort", flush=True)

tbl = jax.random.randint(key, (1 << 20, 24), 0, 1 << 16, dtype=jnp.uint32)
perm = jax.random.permutation(key, 1 << 20).astype(jnp.uint32)

@jax.jit
def gatherloop(tbl, perm):
    def body(i, c):
        g = jnp.take(tbl, (perm + c) % jnp.uint32(1 << 20), axis=0)
        return c + g[0, 0]
    return jax.lax.fori_loop(0, 10, body, jnp.uint32(0))

t = timeit(gatherloop, tbl, perm)
print(f"gather (2^20,24) u32: {t/10*1e3:.1f} ms ({(1<<20)*24*4/(t/10)/1e9:.1f} GB/s)", flush=True)

# gather of (2^20,) flat
flat = tbl[:, 0]

@jax.jit
def gatherflat(flat, perm):
    def body(i, c):
        g = jnp.take(flat, (perm + c) % jnp.uint32(1 << 20))
        return c + g[0]
    return jax.lax.fori_loop(0, 10, body, jnp.uint32(0))

t = timeit(gatherflat, flat, perm)
print(f"gather (2^20,) u32 flat: {t/10*1e3:.1f} ms", flush=True)

# ---------------- NTT stage analysis: where do the 315ms go at 2^16?
from zkp_tpu.ntt.ntt import domain_for
dom = domain_for(cp, 16)
coeffs = fq.random(seed=3, shape=(1 << 16,))

@jax.jit
def nttloop(c):
    def body(i, x):
        return dom.ntt(x)
    return jax.lax.fori_loop(0, 5, body, c)

t = timeit(nttloop, coeffs)
print(f"NTT 2^16 (in-jit x5): {t/5*1e3:.1f} ms", flush=True)
