"""/verify drive: library surface + CLI round trip (CPU)."""
import sys
sys.path.insert(0, '/root/repo')
import zkp_tpu
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.groth16.groth16 import (SetupParams, Witness, generate_crs,
                                     Prover, Verifier, BatchVerifier)
from zkp_tpu.qap.qap import QAP
from zkp_tpu.examples import cubic_circuit

ops = curve_ops("bls12_381")
fq = ops.fq
xa = fq.random(seed=1, shape=(8,)); xb = fq.random(seed=2, shape=(8,))
ia, ib = fq.decode(xa), fq.decode(xb)
assert list(fq.decode(fq.mul(xa, xb))) == [a*b % fq.p for a, b in zip(ia, ib)]
assert list(fq.decode(fq.add(xa, xb))) == [(a+b) % fq.p for a, b in zip(ia, ib)]
print("field ok", flush=True)

r1cs, assignment = cubic_circuit()
qap = QAP.from_r1cs(ops.params, r1cs)
crs = generate_crs(ops, qap, SetupParams.random(ops.params, 42))
w = Witness(qap, assignment)
proof = Prover(ops).prove(crs.pk, w, seed=5)
v = Verifier(ops)
assert v.verify(crs.vk, proof, w.public_inputs())
assert not v.verify(crs.vk, proof, [x + 1 for x in w.public_inputs()])
print("prove/verify ok", flush=True)

p2 = Prover(ops).prove(crs.pk, w, seed=5)
assert (proof.a, proof.b, proof.c) == (p2.a, p2.b, p2.c)
print("determinism ok", flush=True)

proofs = [Prover(ops).prove(crs.pk, w, seed=s) for s in (5, 6)]
assert BatchVerifier(ops).verify_batch(crs.vk, proofs,
                                       [w.public_inputs()] * 2, seed=9)
print("batch ok", flush=True)

import subprocess, os
env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
def run(*args):
    r = subprocess.run([sys.executable, "-m", "zkp_tpu.cli", *args],
                       capture_output=True, text=True, env=env, cwd="/tmp")
    assert r.returncode == 0, (args, r.stdout[-500:], r.stderr[-1000:])
    return r.stdout
run("generate-crs", "--num-constraints", "4", "--output", "/tmp/vcrs")
print("cli generate-crs ok", flush=True)
print("VERIFY DRIVE OK", flush=True)
