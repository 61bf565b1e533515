"""A/B: Pallas limb-major Montgomery mul vs existing XLA Fp.mul on TPU.

Layout for the Pallas path: (L, S, 128) uint32 -- limb-major, lanes packed
into (S, 128) vreg tiles.  Fence via device_get (block_until_ready is a
no-op on axon).
"""
import time, sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zkp_tpu.field import bls12_381
from zkp_tpu.field.limbs import FpLimbs, mul_cols, carry_seq

cp = bls12_381()
fq = cp.fq
L = fq.n
fl = FpLimbs(fq.p, L)

def fence(out):
    return jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])

def mont_mul_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    out = fl.mul(a, b)
    for i in range(L):
        o_ref[i] = out[i]

def pallas_mul(a, b, St):
    S = a.shape[1]
    grid = (S // St,)
    spec = pl.BlockSpec((L, St, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b)

# data
M = 1 << 17           # lanes
S = M // 128
xa = fq.random(seed=1, shape=(M,))
xb = fq.random(seed=2, shape=(M,))
ka = jnp.transpose(xa, (1, 0)).reshape(L, S, 128)
kb = jnp.transpose(xb, (1, 0)).reshape(L, S, 128)

# correctness vs fp.py
ref = fq.mul(xa, xb)
for St in (8, 32, 128):
    if S % St:
        continue
    out = pallas_mul(ka, kb, St)
    got = jnp.transpose(out.reshape(L, M), (1, 0))
    ok = bool(jnp.all(got == ref))
    print(f"St={St}: correct={ok}", flush=True)

# marginal timing: K chained muls inside one jit
def mk(K, St):
    @jax.jit
    def f(a, b):
        def body(i, x):
            return pallas_mul(x, b, St)
        return jax.lax.fori_loop(0, K, body, a)
    return lambda: f(ka, kb)

def mk_xla(K):
    @jax.jit
    def f(x, y):
        return jax.lax.fori_loop(0, K, lambda i, x: fq.mul(x, y), x)
    return lambda: f(xa, xb)

def marginal(name, mk_f, Ks, units):
    ts = {}
    for K in Ks:
        f = mk_f(K)
        fence(f())
        best = 1e9
        for _ in range(2):
            t0 = time.time(); fence(f())
            best = min(best, time.time() - t0)
        ts[K] = best
    dt = ts[Ks[-1]] - ts[Ks[0]]
    dK = Ks[-1] - Ks[0]
    rate = dK * units / dt / 1e6 if dt > 1e-6 else float("nan")
    print(f"{name:<30s} {rate:12.2f} M muls/s  (raw { {k: round(v*1e3,1) for k,v in ts.items()} })", flush=True)

for St in (8, 32, 128):
    if S % St:
        continue
    marginal(f"pallas mont-mul St={St}", functools.partial(mk, St=St), (4, 16), M)
marginal("XLA Fp.mul", mk_xla, (4, 16), M)
