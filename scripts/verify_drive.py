"""/verify drive: library surface + full CLI prove/verify round trip (CPU).

Runs on toy_bn3 (same code paths as the production curves; BLS12-381 CPU
compiles are unaffordable -- tests/test_groth16.py header).  Field ops are
cross-checked against python-int arithmetic on BOTH toy_bn3 and BLS12-381.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, '/root/repo')
import jax
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")  # sitecustomize override

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.groth16.groth16 import (SetupParams, Witness, generate_crs,
                                     Prover, Verifier, BatchVerifier)
from zkp_tpu.qap.qap import QAP
from zkp_tpu.examples import cubic_circuit

T0 = time.time()


def stage(msg):
    print(f"[{time.time()-T0:6.1f}s] {msg}", flush=True)


# field surface, production width + toy width, vs python ints
for cname in ("bls12_381", "toy_bn3"):
    f = curve_ops(cname).fq
    xa = f.random(seed=1, shape=(8,)); xb = f.random(seed=2, shape=(8,))
    ia, ib = f.decode(xa), f.decode(xb)
    assert list(f.decode(f.mul(xa, xb))) == [int(a)*int(b) % f.p for a, b in zip(ia, ib)]
    assert list(f.decode(f.add(xa, xb))) == [(int(a)+int(b)) % f.p for a, b in zip(ia, ib)]
stage("field ok (bls12_381 + toy_bn3)")

CURVE = "toy_bn3"
ops = curve_ops(CURVE)
r1cs, assignment = cubic_circuit(CURVE)
qap = QAP.from_r1cs(ops.params, r1cs)
crs = generate_crs(ops, qap, SetupParams.random(ops.params, 42))
w = Witness(qap, assignment)
proof = Prover(ops).prove(crs.pk, w, seed=5)
v = Verifier(ops)
assert v.verify(crs.vk, proof, w.public_inputs)
assert not v.verify(crs.vk, proof, [x + 1 for x in w.public_inputs])
stage("prove/verify ok")

p2 = Prover(ops).prove(crs.pk, w, seed=5)
assert (proof.a, proof.b, proof.c) == (p2.a, p2.b, p2.c)
stage("determinism ok")

proofs = [Prover(ops).prove(crs.pk, w, seed=s) for s in (5, 6)]
assert BatchVerifier(ops).verify_batch(crs.vk, proofs,
                                       [w.public_inputs] * 2, seed=9)
stage("batch ok")

# CLI round trip, in-process (a subprocess would recompile every module)
from zkp_tpu import cli
from zkp_tpu.examples import synthetic_mult_circuit

tmp = tempfile.mkdtemp(prefix="zkp_drive_")
pfx = os.path.join(tmp, "crs")
assert cli.main(["--curve", CURVE, "generate-crs", "--num-constraints", "4",
                 "--output", pfx, "--seed", "5"]) == 0
stage("cli generate-crs ok")
_, asg = synthetic_mult_circuit(4, CURVE, 5)
wit, pub = os.path.join(tmp, "w.json"), os.path.join(tmp, "p.json")
prf = os.path.join(tmp, "proof.json")
json.dump({"values": [hex(x) for x in asg[1:]]}, open(wit, "w"))
json.dump({"values": []}, open(pub, "w"))
assert cli.main(["prove", "--pk", pfx + "_pk.npz", "--witness", wit,
                 "--output", prf, "--seed", "6"]) == 0
stage("cli prove ok")
assert cli.main(["verify", "--vk", pfx + "_vk.npz", "--public-inputs", pub,
                 "--proof", prf]) == 0
d = json.load(open(prf)); d["a"], d["c"] = d["c"], d["a"]
bad = os.path.join(tmp, "bad.json")
json.dump(d, open(bad, "w"))
assert cli.main(["verify", "--vk", pfx + "_vk.npz", "--public-inputs", pub,
                 "--proof", bad]) == 1
stage("cli verify accept+reject ok")
print("VERIFY DRIVE OK", flush=True)
