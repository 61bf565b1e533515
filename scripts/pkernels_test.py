"""Correctness (vs Weierstrass/XLA) + marginal perf of the Pallas point kernels."""
import time, sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import KGroup
from zkp_tpu.ref.pyref import CurveRef

ops = curve_ops("bls12_381")
fq, fr = ops.fq, ops.fr
ref_curve = CurveRef(ops.params)

def fence(out):
    return jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])

def check(name, a, b):
    ok = bool(jnp.all(a == b))
    print(f"  {name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    return ok

N = 512
host_ints = list(range(1, N + 1))

for which in ("g1", "g2"):
    print(f"== {which} ==", flush=True)
    g = ops.g1 if which == "g1" else ops.g2
    kg = KGroup(ops.params.q, fq.n, which, st=8)

    if which == "g1":
        pts = [ref_curve.g1_mul(k, ref_curve.g1) for k in host_ints]
        qts = [ref_curve.g1_mul(3 * k + 7, ref_curve.g1) for k in host_ints]
        enc = fq.encode
    else:
        pts = [ref_curve.g2_mul(k, ref_curve.g2) for k in host_ints]
        qts = [ref_curve.g2_mul(3 * k + 7, ref_curve.g2) for k in host_ints]
        enc = lambda cs: ops.f2.encode([(c.c0, c.c1) for c in cs])
    px, py = enc([p[0] for p in pts]), enc([p[1] for p in pts])
    qx, qy = enc([p[0] for p in qts]), enc([p[1] for p in qts])
    P = g.from_affine(px, py)
    Q = g.from_affine(qx, qy)

    def flat(c):
        return c.reshape(N, -1)

    def pack(Pt):
        return jnp.concatenate([flat(Pt[0]), flat(Pt[1]), flat(Pt[2])], axis=1)

    def kpt(Pt):
        return kg.to_klayout(pack(Pt))

    kP, kQ = kpt(P), kpt(Q)

    ref = g.double(P)
    check("double", kg.from_klayout(kg.double(kP)), pack(ref))
    ref = g.add(P, Q)
    check("add", kg.from_klayout(kg.add(kP, kQ)), pack(ref))
    ref = g.add(P, P)
    check("add P+P", kg.from_klayout(kg.add(kP, kP)), pack(ref))
    negQ = g.neg(Q)
    out = kg.from_klayout(kg.add(kQ, kpt(negQ)))
    check("P+(-P) Z=0", out[:, 2 * kg.R:], jnp.zeros_like(out[:, 2 * kg.R:]))
    infP = g.infinity((N,))
    ref = g.add(infP, Q)
    check("inf+Q", kg.from_klayout(kg.add(kpt(infP), kQ)), pack(ref))

    qinf = jnp.arange(N) % 7 == 0
    ref = g.add_mixed(P, qx, qy, q_inf=qinf)
    A = jnp.concatenate([flat(qx), flat(qy), qinf.astype(jnp.uint32)[:, None]], axis=1)
    check("add_mixed", kg.from_klayout(kg.add_mixed(kP, kg.to_klayout(A))), pack(ref))

    if jax.default_backend() == "tpu":
        M = 1 << 15
        reps = M // N
        kPb = kg.to_klayout(jnp.tile(pack(P), (reps, 1)))
        kAb = kg.to_klayout(jnp.tile(A, (reps, 1)))

        def mk(K):
            @jax.jit
            def f(P0, A0):
                return jax.lax.fori_loop(0, K, lambda i, P: kg.add_mixed(P, A0), P0)
            return lambda: f(kPb, kAb)

        ts = {}
        for K in (4, 32):
            f = mk(K)
            fence(f())
            best = 1e9
            for _ in range(2):
                t0 = time.time(); fence(f())
                best = min(best, time.time() - t0)
            ts[K] = best
        dt = ts[32] - ts[4]
        rate = 28 * M / dt / 1e6 if dt > 1e-6 else float("nan")
        print(f"  add_mixed marginal: {rate:10.2f} M adds/s "
              f"(raw { {k: round(v*1e3,1) for k, v in ts.items()} })", flush=True)
print("DONE", flush=True)
