"""TPU microbench v4: device_get fence (block_until_ready is a no-op on axon),
K-marginal differencing to remove the ~25ms tunnel round-trip."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np
key = jax.random.PRNGKey(0)

def fence(out):
    return jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])

def marginal(name, mk, Ks, units_per_iter):
    ts = {}
    for K in Ks:
        f = mk(K)
        fence(f())  # compile+warm
        best = 1e9
        for _ in range(2):
            t0 = time.time(); fence(f())
            best = min(best, time.time() - t0)
        ts[K] = best
    dK = Ks[-1] - Ks[0]
    dt = ts[Ks[-1]] - ts[Ks[0]]
    rate = dK * units_per_iter / dt / 1e9 if dt > 1e-6 else float("nan")
    per = dt / dK * 1e3
    print(f"{name:<42s} {per:9.3f} ms/iter {rate:12.2f} Gunit/s  (raw { {k: round(v*1e3,1) for k,v in ts.items()} })", flush=True)

N = 1 << 22
a0 = jax.random.randint(key, (N,), 1, 1 << 16, dtype=jnp.uint32)
b0 = jax.random.randint(key, (N,), 1, 1 << 16, dtype=jnp.uint32)
def mk_u32(K):
    @jax.jit
    def f(x, b):
        return jax.lax.fori_loop(0, K, lambda i, x: x * b + jnp.uint32(1), x)
    return lambda: f(a0, b0)
marginal(f"u32 mul+add ({N} lanes)", mk_u32, (8, 64), N)

from zkp_tpu.field import bls12_381
cp = bls12_381()
fq = cp.fq
for M in (1 << 14, 1 << 17):
    xa = fq.random(seed=1, shape=(M,)); xb = fq.random(seed=2, shape=(M,))
    def mk_fp(K):
        @jax.jit
        def f(x, y):
            return jax.lax.fori_loop(0, K, lambda i, x: fq.mul(x, y), x)
        return lambda: f(xa, xb)
    marginal(f"Fq.mul ({M},24)", mk_fp, (4, 16), M)

from zkp_tpu.curve.curves import curve_ops
ops = curve_ops("bls12_381")
g1 = ops.g1
for M in (1 << 11, 1 << 14):
    gx, gy = ops.g1_gen_affine
    X = jnp.broadcast_to(gx, (M,) + gx.shape); Y = jnp.broadcast_to(gy, (M,) + gy.shape)
    P = g1.from_affine(X, Y)
    def mk_madd(K):
        @jax.jit
        def f(P, x, y):
            return jax.lax.fori_loop(0, K, lambda i, P: g1.add_mixed(P, x, y), P)
        return lambda: f(P, X, Y)
    marginal(f"g1.add_mixed ({M} lanes)", mk_madd, (2, 8), M)

D = 2048
A0 = (jax.random.normal(key, (D, D), jnp.float32) / np.sqrt(D))
def mk_mm(K):
    @jax.jit
    def f(A):
        return jax.lax.fori_loop(0, K, lambda i, X: A @ X, A)
    return lambda: f(A0)
marginal(f"f32 matmul {D}^3 (MACs)", mk_mm, (2, 16), D**3)

A8 = jax.random.randint(key, (D, D), -4, 4, dtype=jnp.int8)
def mk_mm8(K):
    @jax.jit
    def f(A):
        def body(i, X):
            C = jax.lax.dot_general(A, X, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return (C & 7).astype(jnp.int8)
        return jax.lax.fori_loop(0, K, body, A)
    return lambda: f(A8)
marginal(f"int8 matmul {D}^3 (MACs)", mk_mm8, (2, 16), D**3)

Ab = A0.astype(jnp.bfloat16)
def mk_mmb(K):
    @jax.jit
    def f(A):
        def body(i, X):
            C = jax.lax.dot_general(A, X, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            return C.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, K, body, A)
    return lambda: f(Ab)
marginal(f"bf16 matmul {D}^3 (MACs)", mk_mmb, (2, 16), D**3)

T = 1 << 20
tbl0 = jax.random.randint(key, (T, 24), 0, 1 << 16, dtype=jnp.uint32)
perm0 = jax.random.permutation(key, T).astype(jnp.uint32)
def mk_g(K):
    @jax.jit
    def f(tbl, perm):
        return jax.lax.fori_loop(0, K, lambda i, t: jnp.take(t, perm, axis=0), tbl)
    return lambda: f(tbl0, perm0)
marginal("gather (2^20,24) rows", mk_g, (2, 8), T)

ks0 = jax.random.randint(key, (T,), 0, 1 << 20, dtype=jnp.uint32)
def mk_s(K):
    @jax.jit
    def f(ks):
        def body(i, ks):
            s, _ = jax.lax.sort_key_val(ks, ks)
            return s[::-1]
        return jax.lax.fori_loop(0, K, body, ks)
    return lambda: f(ks0)
marginal("sort 2^20 u32 kv", mk_s, (2, 8), T)

def mk_tr(K):
    @jax.jit
    def f(tbl):
        def body(i, t):
            tt = t.T  # (24, 2^20) relayout
            return tt.T + jnp.uint32(1)
        return jax.lax.fori_loop(0, K, body, tbl)
    return lambda: f(tbl0)
marginal("transpose rt (2^20,24)", mk_tr, (2, 8), T)
