"""TPU primitive microbenchmarks to direct the field/curve kernel design.

Measures, on the real chip:
  1. u32 elementwise multiply-add throughput (XLA, flat layout)
  2. current Fp.mul throughput, (N, 24) trailing-limb layout
  3. limb-major Fp-mul prototype: tuples of (N,) limb vectors, pure XLA
  4. lax.sort throughput on 2^20 u32 keys
  5. int8 matmul (MXU) throughput
  6. Pallas mont-mul kernel throughput (pallas_kernels path if present)
"""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

def timeit(f, *a, iters=5, warmup=2):
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

# 1. u32 multiply throughput: c = a*b elementwise, chained K times
N = 1 << 22
a = jax.random.randint(key, (N,), 0, 1 << 16, dtype=jnp.uint32)
b = jax.random.randint(key, (N,), 1, 1 << 16, dtype=jnp.uint32)

@jax.jit
def mulchain(a, b):
    x = a
    for _ in range(64):
        x = (x * b + a) & jnp.uint32(0xFFFF)
    return x

t = timeit(mulchain, a, b)
print(f"u32 mul+add+and chain: {64*N/t/1e9:.2f} G(mul+add+and)/s  ({t*1e3:.2f} ms)", flush=True)

@jax.jit
def mulchain16(a, b):
    x = a.astype(jnp.uint16)
    bb = b.astype(jnp.uint16)
    for _ in range(64):
        x = (x * bb + bb)
    return x

t = timeit(mulchain16, a, b)
print(f"u16 mul+add chain:      {64*N/t/1e9:.2f} G/s", flush=True)

@jax.jit
def f32chain(a, b):
    x = a.astype(jnp.float32)
    bb = b.astype(jnp.float32)
    for _ in range(64):
        x = x * bb + bb
    return x

t = timeit(f32chain, a, b)
print(f"f32 fma chain:          {64*N/t/1e9:.2f} Gfma/s", flush=True)

# 2. current Fp.mul (N, 24)
from zkp_tpu.field import bls12_381
cp = bls12_381()
fq = cp.fq
M = 1 << 18
xa = fq.random(seed=1, shape=(M,))
xb = fq.random(seed=2, shape=(M,))
t = timeit(fq.mul, xa, xb)
print(f"Fp.mul (N,{fq.n}) trailing-limb: {M/t/1e6:.2f} M muls/s ({t*1e3:.1f} ms @ N={M})", flush=True)

# 3. limb-major prototype: mont mul on tuples of (N,) vectors, pure XLA
n = fq.n
p_l = [jnp.uint32(int(v)) for v in fq.p_limbs]
pinv_l = [jnp.uint32(int(v)) for v in fq.pinv_limbs]
MASK = jnp.uint32(0xFFFF)

def carry_norm(cols, n_out):
    out = []
    c = jnp.zeros_like(cols[0])
    for k in range(len(cols)):
        tt = cols[k] + c
        out.append(tt & MASK)
        c = tt >> 16
    while len(out) < n_out:
        out.append(c & MASK)
        c = c >> 16
    return out[:n_out]

def mul_cols(x, y, out_len):
    cols = [None] * out_len
    for i in range(len(x)):
        for j in range(len(y)):
            k = i + j
            if k >= out_len:
                continue
            prod = x[i] * y[j]
            lo = prod & MASK
            hi = prod >> 16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < out_len:
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    # NOTE: no overflow handling here (illustrative perf only)
    return cols

@jax.jit
def mont_mul_limbmajor(al, bl):
    al = list(al); bl = list(bl)
    t_cols = mul_cols(al, bl, 2 * n)
    t_limbs = carry_norm(t_cols, 2 * n)
    m = carry_norm(mul_cols(t_limbs[:n], pinv_l, n), n)
    mp = mul_cols(m, p_l, 2 * n)
    u = carry_norm([a + b for a, b in zip(t_cols, mp)], 2 * n)
    return tuple(u[n:])

al = tuple(xa[:, i] for i in range(n))
bl = tuple(xb[:, i] for i in range(n))
t = timeit(mont_mul_limbmajor, al, bl)
print(f"mont-mul limb-major XLA: {M/t/1e6:.2f} M muls/s ({t*1e3:.1f} ms @ N={M})", flush=True)

# 4. sort
ks = jax.random.randint(key, (1 << 20,), 0, 1 << 16, dtype=jnp.uint32)
idx = jnp.arange(1 << 20, dtype=jnp.uint32)
f = jax.jit(lambda k, i: jax.lax.sort_key_val(k, i))
t = timeit(f, ks, idx)
print(f"lax.sort 2^20 u32 key+val: {t*1e3:.1f} ms", flush=True)

# 5. int8 matmul MXU
A = jax.random.randint(key, (1024, 1024), -128, 127, dtype=jnp.int8)
B = jax.random.randint(key, (1024, 1024), -128, 127, dtype=jnp.int8)
mm = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.int32))
t = timeit(mm, A, B)
print(f"int8 matmul 1024^3: {2 * 1024**3 / t / 1e12:.2f} TOPS", flush=True)

Af = A.astype(jnp.float32)
Bf = B.astype(jnp.float32)
mmf = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
t = timeit(mmf, Af, Bf)
print(f"f32 matmul 1024^3: {2 * 1024**3 / t / 1e12:.2f} TFLOPS", flush=True)

Ab = A.astype(jnp.bfloat16); Bb = B.astype(jnp.bfloat16)
mmb = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
t = timeit(mmb, Ab, Bb)
print(f"bf16 matmul 1024^3: {2 * 1024**3 / t / 1e12:.2f} TFLOPS", flush=True)

# 6. u32 gather (take) of (2^20, 24)
tbl = jax.random.randint(key, (1 << 20, 24), 0, 1 << 16, dtype=jnp.uint32)
g = jax.jit(lambda t_, i: jnp.take(t_, i, axis=0))
perm = jax.random.permutation(key, 1 << 20).astype(jnp.uint32)
t = timeit(g, tbl, perm)
print(f"gather (2^20,24) u32: {t*1e3:.1f} ms ({(1<<20)*24*4/t/1e9:.1f} GB/s)", flush=True)
