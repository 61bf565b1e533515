"""Generate cross-implementation test-vector fixtures (tests/vectors/*.json).

Provenance (BASELINE.md:29 bit-exactness requirement; no network egress in
this environment, so "external" anchors are the public constants below):

  - field / NTT / pairing vectors are computed with host python-int
    arithmetic (pow/%%) -- a fully independent oracle from the JAX limb
    code, committed so future changes are pinned bit-exactly,
  - the zcash-format BLS12-381 generator encodings are PUBLIC constants
    (zcash librustzcash / IETF BLS signature draft); the G2 one is verified
    here by decompressing and comparing against the independently published
    generator coordinates in field/params.py,
  - the fixed-seed proof pins the whole prove pipeline byte-exactly.

Run:  python scripts/gen_vectors.py      (writes tests/vectors/*.json)
"""
import hashlib
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

# host/CPU only -- never touch the (single-client) TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(_ROOT, "tests", "vectors")
os.makedirs(OUT, exist_ok=True)

from zkp_tpu.field.params import get_curve
from zkp_tpu.ref.pyref import CurveRef, ntt_ref
from zkp_tpu.curve import serialize as ser


def det_ints(seed: int, n: int, mod: int):
    """Deterministic pseudo-random ints < mod via SHA-256 counter stream
    (independent of numpy/jax RNG)."""
    out = []
    i = 0
    nb = (mod.bit_length() + 7) // 8 + 8
    while len(out) < n:
        h = b""
        while len(h) < nb:
            h += hashlib.sha256(f"{seed}:{i}:{len(h)}".encode()).digest()
            i += 1
        out.append(int.from_bytes(h[:nb], "big") % mod)
    return out


def field_vectors():
    data = {}
    for name in ("bls12_381", "bn254"):
        p = get_curve(name)
        ents = {}
        for fname, mod in (("fr", p.r), ("fq", p.q)):
            avs = det_ints(1000, 8, mod)
            bvs = det_ints(2000, 8, mod)
            rows = []
            for a, b in zip(avs, bvs):
                rows.append({
                    "a": hex(a), "b": hex(b),
                    "add": hex((a + b) % mod),
                    "sub": hex((a - b) % mod),
                    "mul": hex(a * b % mod),
                    "inv_a": hex(pow(a, -1, mod)) if a else "0x0",
                    "pow_a_b": hex(pow(a, b, mod)),
                })
            ents[fname] = {"modulus": hex(mod), "cases": rows}
        data[name] = ents
    with open(os.path.join(OUT, "field_vectors.json"), "w") as f:
        json.dump(data, f, indent=1)
    print("field_vectors.json")


def ntt_vectors():
    data = {}
    for name in ("bls12_381",):
        p = get_curve(name)
        r = p.r
        for log_n in (10, 14):
            n = 1 << log_n
            vals = det_ints(3000 + log_n, n, r)
            omega = p.domain_root(log_n)
            out = ntt_ref(vals, omega, r)
            ent = {
                "curve": name, "log_n": log_n, "omega": hex(omega),
                "input_seed": 3000 + log_n,
                "output_sha256": hashlib.sha256(
                    ",".join(hex(v) for v in out).encode()).hexdigest(),
                "output_head": [hex(v) for v in out[:4]],
                "output_tail": [hex(v) for v in out[-4:]],
            }
            if log_n <= 10:
                ent["input"] = [hex(v) for v in vals]
                ent["output"] = [hex(v) for v in out]
            data[f"{name}_2^{log_n}"] = ent
    with open(os.path.join(OUT, "ntt_vectors.json"), "w") as f:
        json.dump(data, f, indent=1)
    print("ntt_vectors.json")


# PUBLIC zcash-format compressed generator encodings (librustzcash /
# draft-irtf-cfrg-bls-signature-05 "BLS12-381" section)
ZCASH_G1_GEN = ("97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171b"
                "ac586c55e83ff97a1aeffb3af00adb22c6bb")
ZCASH_G2_GEN = ("93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f"
                "5049334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a9126080527"
                "2dc51051c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd480"
                "56c8c121bdb8")


def serialize_vectors():
    data = {}
    for name in ("bls12_381", "bn254"):
        p = get_curve(name)
        ref = CurveRef(p)
        ent = {"g1": {}, "g2": {}}
        for k in (1, 2, 5):
            g1 = ref.g1_mul(k, ref.g1)
            g2p = ref.g2_mul(k, ref.g2)
            g2 = ((g2p[0].c0, g2p[0].c1), (g2p[1].c0, g2p[1].c1))
            ent["g1"][str(k)] = {
                "x": hex(g1[0]), "y": hex(g1[1]),
                "arkworks": ser.g1_compress(g1, p).hex(),
                "zcash": ser.g1_compress_zcash(g1, p).hex(),
            }
            ent["g2"][str(k)] = {
                "x": [hex(g2[0][0]), hex(g2[0][1])],
                "y": [hex(g2[1][0]), hex(g2[1][1])],
                "arkworks": ser.g2_compress(g2, p).hex(),
                "zcash": ser.g2_compress_zcash(g2, p).hex(),
            }
        data[name] = ent
    # anchor check: the public zcash generator hexes decode to the published
    # generator coordinates
    p = get_curve("bls12_381")
    assert data["bls12_381"]["g1"]["1"]["zcash"] == ZCASH_G1_GEN, \
        "G1 zcash generator encoding mismatch"
    g2dec = ser.g2_decompress_zcash(bytes.fromhex(ZCASH_G2_GEN), p)
    assert g2dec == p.g2_generator, "G2 zcash generator encoding mismatch"
    assert data["bls12_381"]["g2"]["1"]["zcash"] == ZCASH_G2_GEN
    data["public_anchors"] = {"zcash_g1_gen": ZCASH_G1_GEN,
                              "zcash_g2_gen": ZCASH_G2_GEN}
    with open(os.path.join(OUT, "serialize_vectors.json"), "w") as f:
        json.dump(data, f, indent=1)
    print("serialize_vectors.json (public anchors verified)")


def pairing_vectors():
    data = {}
    for name in ("bls12_381", "bn254", "toy_bn3"):
        p = get_curve(name)
        ref = CurveRef(p)
        e = ref.pairing(ref.g1, ref.g2)
        # bilinearity sanity at generation time: e(aP, bQ) == e(P,Q)^(ab)
        a, b = 5, 7
        lhs = ref.pairing(ref.g1_mul(a, ref.g1), ref.g2_mul(b, ref.g2))
        assert lhs == e.pow(a * b % p.r), f"bilinearity failed for {name}"
        coeffs = []
        for c6 in (e.c0, e.c1):
            for c2 in (c6.c0, c6.c1, c6.c2):
                coeffs.append([hex(c2.c0), hex(c2.c1)])
        data[name] = {"e_g1_g2": coeffs}
    with open(os.path.join(OUT, "pairing_vectors.json"), "w") as f:
        json.dump(data, f, indent=1)
    print("pairing_vectors.json (bilinearity verified)")


def proof_vector():
    """Fixed-seed proof on toy_bn3 via the HOST oracle pipeline only --
    generate_crs_host + Prover (device parts at toy width compile in
    seconds, and determinism ties device/host paths together)."""
    from zkp_tpu.curve.curves import curve_ops
    from zkp_tpu.examples import cubic_circuit
    from zkp_tpu.groth16.groth16 import (Prover, SetupParams, Verifier,
                                         Witness, generate_crs_host,
                                         proof_to_dict)
    from zkp_tpu.qap.qap import QAP

    ops = curve_ops("toy_bn3")
    r1cs, assignment = cubic_circuit("toy_bn3")
    qap = QAP.from_r1cs(ops.params, r1cs)
    crs = generate_crs_host(ops, qap, SetupParams.random(ops.params, 42))
    w = Witness(qap, assignment)
    proof = Prover(ops).prove(crs.pk, w, seed=7)
    assert Verifier(ops).verify(crs.vk, proof, w.public_inputs)
    data = {
        "curve": "toy_bn3", "circuit": "cubic x^3+x+5=35",
        "setup_seed": 42, "prove_seed": 7, "public_inputs": [35],
        "proof": proof_to_dict(proof, "toy_bn3"),
    }
    with open(os.path.join(OUT, "proof_vector.json"), "w") as f:
        json.dump(data, f, indent=1)
    print("proof_vector.json (verified)")


if __name__ == "__main__":
    field_vectors()
    ntt_vectors()
    serialize_vectors()
    pairing_vectors()
    proof_vector()
