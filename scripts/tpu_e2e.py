"""TPU end-to-end: kfield ops + kernel NTT A/B vs fp.py, then a full
Groth16 prove+verify round-trip on a synthetic circuit.
"""
import time, sys, os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax, jax.numpy as jnp
# set via jax.config, NOT env vars: the env-var route silently leaves the
# persistent cache disabled in this jax build (round-4 finding)
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np

from zkp_tpu.field import bls12_381
from zkp_tpu.field.kfield import kfield

cp = bls12_381()
fr = cp.fr

def fence(out):
    return jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])

# ---- kfield ops A/B
N = 1 << 14
xa = fr.random(seed=1, shape=(N,))
xb = fr.random(seed=2, shape=(N,))
kf = kfield(fr.p, fr.n)
assert bool(jnp.all(kf.mul(xa, xb) == fr.mul(xa, xb))), "kf.mul"
assert bool(jnp.all(kf.add(xa, xb) == fr.add(xa, xb))), "kf.add"
assert bool(jnp.all(kf.sub(xa, xb) == fr.sub(xa, xb))), "kf.sub"
assert bool(jnp.all(kf.mul_sub(xa, xb, xa) == fr.sub(fr.mul(xa, xb), xa))), "kf.mul_sub"
s, d = kf.butterfly(xa, xb, xa)
assert bool(jnp.all(s == fr.add(xa, fr.mul(xb, xa)))), "bfly s"
assert bool(jnp.all(d == fr.sub(xa, fr.mul(xb, xa)))), "bfly d"
print("kfield ops match fp.py", flush=True)

# ---- NTT: kernel path vs host-int reference
from zkp_tpu.ntt.ntt import domain_for
for log_n in (10, 14):
    dom = domain_for(cp, log_n)
    coeffs_int = fr.random_ints(7, 1 << log_n)
    coeffs = fr.encode(coeffs_int)
    t0 = time.time()
    ev = dom.ntt(coeffs)
    fence(ev); t_first = time.time() - t0
    t0 = time.time(); fence(dom.ntt(coeffs)); t_run = time.time() - t0
    back = dom.intt(ev)
    ok = bool(jnp.all(back == coeffs))
    # spot-check two evaluation points on the host
    p, w = fr.p, dom.omega
    got = [int(v) for v in fr.decode(ev[:2])]
    want = []
    for j in range(2):
        acc, x = 0, pow(w, j, p)
        for c in reversed(coeffs_int):
            acc = (acc * x + c) % p
        want.append(acc)
    print(f"NTT 2^{log_n}: roundtrip={ok} spot={got == want} "
          f"first={t_first:.1f}s run={t_run*1e3:.1f}ms", flush=True)

# ---- full prove/verify at 2^12 constraints
from zkp_tpu.examples import synthetic_mult_circuit
from zkp_tpu.groth16.groth16 import (SetupParams, Witness, generate_crs,
                                     Prover, Verifier)
from zkp_tpu.qap.qap import QAP
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.utils.profiling import StageTimer

ops = curve_ops("bls12_381")
nc = 1 << 12
t0 = time.time()
r1cs, assignment = synthetic_mult_circuit(nc, "bls12_381", seed=3)
qap = QAP.from_r1cs(ops.params, r1cs)
print(f"r1cs+qap built: {time.time()-t0:.1f}s  (V={qap.num_variables}, n={qap.n})", flush=True)

t0 = time.time()
crs = generate_crs(ops, qap, SetupParams.random(ops.params, 3))
jax.block_until_ready(crs.pk.a_g1[0])
print(f"setup (device fixed-base): {time.time()-t0:.1f}s", flush=True)

witness = Witness(qap, assignment)
prover = Prover(ops)
tm = StageTimer()
t0 = time.time()
proof = prover.prove(crs.pk, witness, seed=9, timer=tm)
print(f"prove (first, incl compile): {time.time()-t0:.1f}s", flush=True)
print(tm.report(), flush=True)
tm2 = StageTimer()
t0 = time.time()
proof = prover.prove(crs.pk, witness, seed=10, timer=tm2)
print(f"prove (warm): {time.time()-t0:.1f}s", flush=True)
print(tm2.report(), flush=True)

ver = Verifier(ops)
ok = ver.verify(crs.vk, proof, witness.public_inputs)
print(f"verify: {ok}", flush=True)
assert ok
bad = ver.verify(crs.vk, proof, [x + 1 for x in witness.public_inputs])
print(f"verify wrong input rejected: {not bad}", flush=True)
assert not bad
print("E2E OK", flush=True)
