"""Point compression round trips (arkworks + zcash formats) and key I/O."""

import os

import pytest

from zkp_tpu.curve import serialize as ser
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.field import bls12_381, bn254
from zkp_tpu.ref.pyref import CurveRef


@pytest.fixture(scope="module", params=["bls12_381", "bn254"])
def setup(request):
    ops = curve_ops(request.param)
    return ops.params, CurveRef(ops.params)


def test_g1_roundtrip(setup):
    params, ref = setup
    for k in [1, 2, 3, 12345, params.r - 1]:
        pt = ref.g1_mul(k, ref.g1)
        data = ser.g1_compress(pt, params)
        assert len(data) == (params.q.bit_length() + 7) // 8
        back = ser.g1_decompress(data, params)
        assert back == pt
        dz = ser.g1_compress_zcash(pt, params)
        assert ser.g1_decompress_zcash(dz, params) == pt


def test_g1_infinity(setup):
    params, ref = setup
    for comp, decomp in [(ser.g1_compress, ser.g1_decompress),
                         (ser.g1_compress_zcash, ser.g1_decompress_zcash)]:
        data = comp(None, params)
        assert decomp(data, params) is None


def test_g1_both_y_signs(setup):
    params, ref = setup
    pt = ref.g1_mul(7, ref.g1)
    neg = ref.g1_neg(pt)
    d1 = ser.g1_compress(pt, params)
    d2 = ser.g1_compress(neg, params)
    assert d1 != d2
    assert ser.g1_decompress(d1, params) == pt
    assert ser.g1_decompress(d2, params) == neg


def test_g2_roundtrip(setup):
    params, ref = setup
    for k in [1, 5, 99]:
        pt = ref.g2_mul(k, ref.g2)
        tup = ((pt[0].c0, pt[0].c1), (pt[1].c0, pt[1].c1))
        data = ser.g2_compress(tup, params)
        back = ser.g2_decompress(data, params)
        assert back == tup
        dz = ser.g2_compress_zcash(tup, params)
        assert ser.g2_decompress_zcash(dz, params) == tup
    assert ser.g2_decompress(ser.g2_compress(None, params), params) is None


def test_invalid_points_rejected(setup):
    params, ref = setup
    nb = (params.q.bit_length() + 7) // 8
    with pytest.raises(ser.SerializationError):
        ser.g1_decompress(b"\x00" * (nb - 1), params)
    # x = q (out of range)
    bad = bytearray(params.q.to_bytes(nb, "little"))
    with pytest.raises(ser.SerializationError):
        ser.g1_decompress(bytes(bad), params)


def test_bls_zcash_generator_vector():
    """Known zcash-format BLS12-381 G1 generator encoding (public vector)."""
    params = bls12_381()
    ref = CurveRef(params)
    data = ser.g1_compress_zcash(ref.g1, params)
    assert data.hex() == (
        "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
        "6c55e83ff97a1aeffb3af00adb22c6bb")


def test_key_io_roundtrip(tmp_path):
    from zkp_tpu.examples import cubic_circuit
    from zkp_tpu.groth16 import keys_io
    from zkp_tpu.groth16.groth16 import (
        Prover, SetupParams, Verifier, Witness, generate_crs_host)
    from zkp_tpu.qap.qap import QAP

    ops = curve_ops("bls12_381")
    r1cs, assignment = cubic_circuit()
    qap = QAP.from_r1cs(ops.params, r1cs)
    # host-only setup: the device fixed-base path is covered by test_groth16 /
    # the TPU scripts; XLA:CPU explodes (>100GB) compiling it cold
    crs = generate_crs_host(ops, qap, SetupParams.random(ops.params, 77))
    prefix = str(tmp_path / "keys")
    pk_path, vk_path = keys_io.save_crs(crs, prefix)
    assert os.path.exists(pk_path) and os.path.exists(vk_path)

    pk2 = keys_io.load_proving_key(pk_path)
    vk2 = keys_io.load_verification_key(vk_path)
    w = Witness(pk2.qap, assignment)
    proof = Prover(ops).prove(pk2, w, seed=3)
    assert Verifier(ops).verify(vk2, proof, w.public_inputs)
    # and the loaded key produces byte-identical proofs to the original
    proof_orig = Prover(ops).prove(crs.pk, Witness(qap, assignment), seed=3)
    assert proof.a == proof_orig.a and proof.b == proof_orig.b and proof.c == proof_orig.c


def _find_non_subgroup_g1(params):
    """Deterministic on-curve point OUTSIDE the order-r subgroup (only
    exists when the G1 cofactor > 1, e.g. BLS12-381; BN curves have h=1)."""
    q = params.q
    for x in range(1, 2000):
        rhs = (pow(x, 3, q) + params.b) % q
        y = ser._sqrt_fq(rhs, q)
        if y is None:
            continue
        if not ser.g1_in_subgroup((x, y), params):
            return (x, y)
    return None


def _find_non_subgroup_g2(params):
    q = params.q
    for x0 in range(1, 500):
        x = (x0, 1)
        y = ser._sqrt_fq2(ser._g2_rhs(x, params), q)
        if y is None:
            continue
        if not ser.g2_in_subgroup((x, y), params):
            return (x, y)
    return None


def test_g1_subgroup_check_rejects_cofactor_point():
    """arkworks validates r-torsion on deserialize (reference gets this via
    CanonicalDeserialize on Proof, groth16-core/src/lib.rs:28-36)."""
    params = bls12_381()
    pt = _find_non_subgroup_g1(params)
    assert pt is not None, "BLS12-381 G1 cofactor > 1: test point must exist"
    data = ser.g1_compress(pt, params)
    with pytest.raises(ser.SerializationError):
        ser.g1_decompress(data, params)
    # opt-out path still returns the raw point
    assert ser.g1_decompress(data, params, check_subgroup=False) == pt
    dz = ser.g1_compress_zcash(pt, params)
    with pytest.raises(ser.SerializationError):
        ser.g1_decompress_zcash(dz, params)


def test_g2_subgroup_check_rejects_cofactor_point():
    params = bls12_381()
    pt = _find_non_subgroup_g2(params)
    assert pt is not None, "BLS12-381 G2 cofactor > 1: test point must exist"
    data = ser.g2_compress(pt, params)
    with pytest.raises(ser.SerializationError):
        ser.g2_decompress(data, params)
    assert ser.g2_decompress(data, params, check_subgroup=False) == pt
    dz = ser.g2_compress_zcash(pt, params)
    with pytest.raises(ser.SerializationError):
        ser.g2_decompress_zcash(dz, params)


def test_proof_from_dict_rejects_cofactor_point():
    """A proof whose A point is on-curve but out of subgroup must not load."""
    from zkp_tpu.groth16.groth16 import proof_from_dict

    params = bls12_381()
    ref = CurveRef(params)
    pt = _find_non_subgroup_g1(params)
    good_g2 = ((ref.g2[0].c0, ref.g2[0].c1), (ref.g2[1].c0, ref.g2[1].c1))
    d = {
        "a": ser.g1_compress(pt, params).hex(),
        "b": ser.g2_compress(good_g2, params).hex(),
        "c": ser.g1_compress(ref.g1, params).hex(),
    }
    with pytest.raises(ser.SerializationError):
        proof_from_dict(d, "bls12_381")
