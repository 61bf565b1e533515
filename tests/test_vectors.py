"""Committed cross-check vectors (tests/vectors/*.json) asserted bit-exact.

Fixture provenance (scripts/gen_vectors.py): host python-int arithmetic
(independent of the JAX limb code) + the PUBLIC zcash/IETF BLS12-381
generator encodings as external anchors.  These pin the field, NTT,
serialization, pairing, and prove pipelines byte-exactly across versions
(BASELINE.md:29).
"""

import hashlib
import json
import os

import pytest

VEC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vectors")


def load(name):
    with open(os.path.join(VEC, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("curve", ["bls12_381", "bn254"])
@pytest.mark.parametrize("field", ["fr", "fq"])
def test_field_vectors(curve, field):
    from zkp_tpu.curve.curves import curve_ops
    ops = curve_ops(curve)
    f = ops.fr if field == "fr" else ops.fq
    ent = load("field_vectors.json")[curve][field]
    assert int(ent["modulus"], 16) == f.p
    avs = [int(c["a"], 16) for c in ent["cases"]]
    bvs = [int(c["b"], 16) for c in ent["cases"]]
    xa, xb = f.encode(avs), f.encode(bvs)
    adds = [int(v) for v in f.decode(f.add(xa, xb))]
    subs = [int(v) for v in f.decode(f.sub(xa, xb))]
    muls = [int(v) for v in f.decode(f.mul(xa, xb))]
    invs = [int(v) for v in f.decode(f.inv(xa))]
    for i, c in enumerate(ent["cases"]):
        assert adds[i] == int(c["add"], 16)
        assert subs[i] == int(c["sub"], 16)
        assert muls[i] == int(c["mul"], 16)
        if avs[i]:
            assert invs[i] == int(c["inv_a"], 16)


def test_ntt_vector_2_10():
    """Full 2^10 NTT output vs the committed host-int transform."""
    from zkp_tpu.field.params import bls12_381
    from zkp_tpu.ntt.ntt import domain_for
    ent = load("ntt_vectors.json")["bls12_381_2^10"]
    curve = bls12_381()
    f = curve.fr
    d = domain_for(curve, ent["log_n"])
    assert int(ent["omega"], 16) == d.omega
    vals = [int(v, 16) for v in ent["input"]]
    out = [int(v) for v in f.decode(d.ntt(f.encode(vals)))]
    assert out == [int(v, 16) for v in ent["output"]]
    assert hashlib.sha256(",".join(hex(v) for v in out).encode()).hexdigest() \
        == ent["output_sha256"]


@pytest.mark.skipif(os.environ.get("ZKP_TESTS_SLOW", "") != "1",
                    reason="2^14 BLS12-381 NTT on XLA:CPU is slow cold")
def test_ntt_vector_2_14():
    from zkp_tpu.field.params import bls12_381
    from zkp_tpu.ntt.ntt import domain_for
    from scripts.gen_vectors import det_ints
    ent = load("ntt_vectors.json")["bls12_381_2^14"]
    curve = bls12_381()
    f = curve.fr
    d = domain_for(curve, 14)
    vals = det_ints(ent["input_seed"], 1 << 14, f.p)
    out = [int(v) for v in f.decode(d.ntt(f.encode(vals)))]
    assert [hex(v) for v in out[:4]] == ent["output_head"]
    assert hashlib.sha256(",".join(hex(v) for v in out).encode()).hexdigest() \
        == ent["output_sha256"]


@pytest.mark.parametrize("curve", ["bls12_381", "bn254"])
def test_serialize_vectors(curve):
    from zkp_tpu.curve import serialize as ser
    from zkp_tpu.field.params import get_curve
    p = get_curve(curve)
    ent = load("serialize_vectors.json")[curve]
    for k, rec in ent["g1"].items():
        pt = (int(rec["x"], 16), int(rec["y"], 16))
        assert ser.g1_compress(pt, p).hex() == rec["arkworks"]
        assert ser.g1_compress_zcash(pt, p).hex() == rec["zcash"]
        assert ser.g1_decompress(bytes.fromhex(rec["arkworks"]), p) == pt
        assert ser.g1_decompress_zcash(bytes.fromhex(rec["zcash"]), p) == pt
    for k, rec in ent["g2"].items():
        pt = ((int(rec["x"][0], 16), int(rec["x"][1], 16)),
              (int(rec["y"][0], 16), int(rec["y"][1], 16)))
        assert ser.g2_compress(pt, p).hex() == rec["arkworks"]
        assert ser.g2_compress_zcash(pt, p).hex() == rec["zcash"]
        assert ser.g2_decompress(bytes.fromhex(rec["arkworks"]), p) == pt
        assert ser.g2_decompress_zcash(bytes.fromhex(rec["zcash"]), p) == pt


def test_public_generator_anchors():
    """The PUBLIC zcash-format generator encodings (librustzcash / IETF BLS
    signature draft constants) decode to the params.py generator coords."""
    from zkp_tpu.curve import serialize as ser
    from zkp_tpu.field.params import bls12_381
    p = bls12_381()
    anchors = load("serialize_vectors.json")["public_anchors"]
    g1 = ser.g1_decompress_zcash(bytes.fromhex(anchors["zcash_g1_gen"]), p)
    assert g1 == p.g1_generator
    g2 = ser.g2_decompress_zcash(bytes.fromhex(anchors["zcash_g2_gen"]), p)
    assert g2 == p.g2_generator


def test_pairing_vector_oracle():
    """pyref host pairing reproduces the committed e(G1, G2) coefficients
    (the device engine is A/B-tested against pyref in tests/test_pairing)."""
    from zkp_tpu.field.params import get_curve
    from zkp_tpu.ref.pyref import CurveRef
    for curve in ("toy_bn3",):
        ent = load("pairing_vectors.json")[curve]
        ref = CurveRef(get_curve(curve))
        e = ref.pairing(ref.g1, ref.g2)
        coeffs = []
        for c6 in (e.c0, e.c1):
            for c2 in (c6.c0, c6.c1, c6.c2):
                coeffs.append([hex(c2.c0), hex(c2.c1)])
        assert coeffs == ent["e_g1_g2"]


def test_proof_vector():
    """Fixed-seed toy_bn3 proof: byte-identical across versions, and the
    committed bytes verify."""
    from zkp_tpu.curve.curves import curve_ops
    from zkp_tpu.examples import cubic_circuit
    from zkp_tpu.groth16.groth16 import (Prover, SetupParams, Verifier,
                                         Witness, generate_crs_host,
                                         proof_from_dict, proof_to_dict)
    from zkp_tpu.qap.qap import QAP

    ent = load("proof_vector.json")
    ops = curve_ops(ent["curve"])
    r1cs, assignment = cubic_circuit(ent["curve"])
    qap = QAP.from_r1cs(ops.params, r1cs)
    crs = generate_crs_host(ops, qap, SetupParams.random(ops.params,
                                                        ent["setup_seed"]))
    w = Witness(qap, assignment)
    proof = Prover(ops).prove(crs.pk, w, seed=ent["prove_seed"])
    assert proof_to_dict(proof, ent["curve"]) == ent["proof"]
    back = proof_from_dict(ent["proof"], ent["curve"])
    assert Verifier(ops).verify(crs.vk, back, ent["public_inputs"])
