"""FieldVec parity API, Pallas kernel (interpret), native host lib, profiling."""

import numpy as np
import pytest

from zkp_tpu.field import bls12_381
from zkp_tpu.field.fieldvec import (
    FieldVec, InvalidLength, evaluate_polynomial, field_vec_from_u64,
    random_field_vec,
)

FR = bls12_381().fr


def test_fieldvec_ops():
    a_i = FR.random_ints(1, 16)
    b_i = FR.random_ints(2, 16)
    a, b = FieldVec(FR, a_i), FieldVec(FR, b_i)
    assert a.inner_product(b) == sum(x * y for x, y in zip(a_i, b_i)) % FR.p
    s = 12345
    assert a.scalar_mul(s).to_ints() == [x * s % FR.p for x in a_i]
    assert a.add_vec(b).to_ints() == [(x + y) % FR.p for x, y in zip(a_i, b_i)]
    with pytest.raises(InvalidLength):
        a.add_vec(FieldVec(FR, [1, 2]))


def test_fieldvec_utils():
    v = random_field_vec(FR, 8, seed=42)
    assert len(v) == 8
    u = field_vec_from_u64(FR, [5, 1 << 63])
    assert u.to_ints() == [5, 1 << 63]
    coeffs = [3, 0, 2]  # 3 + 2x^2
    assert evaluate_polynomial(FR, coeffs, 5) == (3 + 2 * 25) % FR.p


def test_pallas_mont_mul_interpret():
    from zkp_tpu.field.pallas_kernels import PallasFieldOps
    po = PallasFieldOps(FR, tile=16)
    a_i = FR.random_ints(3, 16)
    b_i = FR.random_ints(4, 16)
    got = FR.decode(po.mul(FR.encode(a_i), FR.encode(b_i)))
    assert all(int(g) == x * y % FR.p for g, x, y in zip(got, a_i, b_i))
    # non-multiple-of-tile batch exercises padding
    got2 = FR.decode(po.mul(FR.encode(a_i[:5]), FR.encode(b_i[:5])))
    assert all(int(g) == x * y % FR.p for g, x, y in zip(got2, a_i[:5], b_i[:5]))


def test_native_host_lib():
    from zkp_tpu.native.host import HostField, available
    if not available():
        pytest.skip("no native toolchain")
    hf = HostField(FR.p)
    a_i = FR.random_ints(5, 64)
    b_i = FR.random_ints(6, 64)
    A, B = hf.encode(a_i), hf.encode(b_i)
    assert hf.decode(hf.mul(A, B)) == [x * y % FR.p for x, y in zip(a_i, b_i)]
    assert hf.decode(hf.add(A, B)) == [(x + y) % FR.p for x, y in zip(a_i, b_i)]
    # horner
    coeffs = hf.encode(a_i)
    pt = 7
    expect = 0
    for c in reversed(a_i):
        expect = (expect * pt + c) % FR.p
    assert hf.horner(coeffs, pt) == expect


def test_stage_timer():
    from zkp_tpu.utils.profiling import Metrics, StageTimer
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert set(t.as_dict()) == {"a", "b"}
    assert "total" in t.report()
    m = Metrics()
    m.record("x", 1.5, "ops/s", tag="t")
    assert "x" in m.summary()


def test_fixed_base_scalar_mul():
    from zkp_tpu.curve.curves import curve_ops
    from zkp_tpu.ref.pyref import CurveRef
    ops = curve_ops("bls12_381")
    ref = CurveRef(ops.params)
    tab = ops.g1_fixed_base()
    scalars = [0, 1, 2, 31337, ops.params.r - 1]
    P = tab.scalar_mul(ops.encode_scalars(scalars))
    px, py, pinf = ops.g1.to_affine(P)
    for i, s in enumerate(scalars):
        expect = ref.g1_mul(s, ref.g1)
        if expect is None:
            assert bool(pinf[i])
        else:
            assert int(ops.fq.decode(px[i])) == expect[0]
            assert int(ops.fq.decode(py[i])) == expect[1]
