"""Correctness (vs Weierstrass/XLA) + marginal perf of the Pallas point kernels."""
import time, sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import KGroup

ops = curve_ops("bls12_381")
fq, fr = ops.fq, ops.fr

def fence(out):
    return jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])

def check(name, a, b):
    ok = bool(jnp.all(a == b))
    print(f"  {name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    return ok

for which, g, genaff in (("g1", ops.g1, ops.g1_gen_affine),
                         ("g2", ops.g2, ops.g2_gen_affine)):
    print(f"== {which} ==", flush=True)
    kg = KGroup(ops.params.q, fq.n, which, st=8)
    N = 1024
    S = N // 128
    ks = fr.random(seed=5, shape=(N,), mont=False)
    gx, gy = genaff
    G = g.from_affine(jnp.broadcast_to(gx, (N,) + gx.shape),
                      jnp.broadcast_to(gy, (N,) + gy.shape))
    P = g.scalar_mul(G, ks)          # varied points, XLA path
    ks2 = fr.random(seed=6, shape=(N,), mont=False)
    Q = g.scalar_mul(G, ks2)

    def flat(coord):   # (N, ..., L) -> (N, R)
        return coord.reshape(N, -1)

    def kpt(Pt):
        return kg.to_klayout(jnp.concatenate([flat(Pt[0]), flat(Pt[1]), flat(Pt[2])], axis=1))

    kP, kQ = kpt(P), kpt(Q)

    # double
    ref = g.double(P)
    out = kg.from_klayout(kg.double(kP))
    check("double", out, jnp.concatenate([flat(ref[0]), flat(ref[1]), flat(ref[2])], axis=1))

    # add (generic + edge cases: P+P, P+(-P), P+inf, inf+Q)
    ref = g.add(P, Q)
    out = kg.from_klayout(kg.add(kP, kQ))
    check("add", out, jnp.concatenate([flat(ref[0]), flat(ref[1]), flat(ref[2])], axis=1))
    ref = g.add(P, P)
    out = kg.from_klayout(kg.add(kP, kP))
    check("add P+P", out, jnp.concatenate([flat(ref[0]), flat(ref[1]), flat(ref[2])], axis=1))
    negQ = g.neg(Q)
    ref = g.add(Q, negQ)
    out = kg.from_klayout(kg.add(kQ, kpt(negQ)))
    check("add P+(-P) -> inf Z", out[:, 2*kg.R:], jnp.zeros_like(out[:, 2*kg.R:]))
    infP = g.infinity((N,))
    ref = g.add(infP, Q)
    out = kg.from_klayout(kg.add(kpt(infP), kQ))
    check("inf+Q", out, jnp.concatenate([flat(ref[0]), flat(ref[1]), flat(ref[2])], axis=1))

    # add_mixed vs XLA path, incl. affine infinity flags
    qx, qy, qinf = g.to_affine(Q)
    qinf = qinf | (jnp.arange(N) % 7 == 0)  # sprinkle infinities
    ref = g.add_mixed(P, qx, qy, q_inf=qinf)
    A = jnp.concatenate([flat(qx), flat(qy), qinf.astype(jnp.uint32)[:, None]], axis=1)
    out = kg.from_klayout(kg.add_mixed(kP, kg.to_klayout(A)))
    check("add_mixed", out, jnp.concatenate([flat(ref[0]), flat(ref[1]), flat(ref[2])], axis=1))

    # perf (TPU): marginal chained adds
    if jax.default_backend() == "tpu":
        M = 1 << 14
        Sm = M // 128
        kPb = kg.to_klayout(jnp.concatenate(
            [flat(P), flat(P), flat(P)], axis=1)[:1].repeat(M, 0) if False else
            jnp.tile(jnp.concatenate([flat(P), flat(P), flat(P)], axis=1)[:1], (M, 1)))
        Ab = jnp.tile(A[:1], (M, 1))
        kAb = kg.to_klayout(Ab)
        def mk(K):
            @jax.jit
            def f(P0, A0):
                return jax.lax.fori_loop(0, K, lambda i, P: kg.add_mixed(P, A0), P0)
            return lambda: f(kPb, kAb)
        ts = {}
        for K in (4, 16):
            f = mk(K)
            fence(f())
            best = 1e9
            for _ in range(2):
                t0 = time.time(); fence(f())
                best = min(best, time.time() - t0)
            ts[K] = best
        dt = ts[16] - ts[4]
        rate = 12 * M / dt / 1e6 if dt > 1e-6 else float("nan")
        print(f"  add_mixed marginal: {rate:10.2f} M adds/s (raw { {k: round(v*1e3,1) for k,v in ts.items()} })", flush=True)
print("DONE", flush=True)
