"""R1CS builder + QAP conversion tests.

Mirrors the reference test surface (SURVEY.md section 4): LC evaluation,
constraint satisfaction, builder end-to-end, boolean gadget negative case,
QAP shapes, evaluation at omega, quotient existence + random-point H.Z
identity, invalid witness rejection."""

import pytest

from zkp_tpu.field import bls12_381
from zkp_tpu.qap.qap import QAP, QAPError
from zkp_tpu.r1cs.r1cs import (
    R1CS, LinearCombination, Variable, ONE, R1CSError, AssignmentMismatch,
    boolean_constraint, bit_decomposition, assign_bits,
)

CURVE = bls12_381()
P = CURVE.r


def mult_circuit():
    """x * y = z with z public (reference examples/lib.rs:14-61)."""
    r = R1CS(P, num_public=1)
    z = r.public_variable(0)
    x = r.allocate_variable()
    y = r.allocate_variable()
    r.enforce_multiplication(x, y, z)
    return r, z, x, y


def cubic_circuit():
    """x^3 + x + 5 = 35 (BASELINE.json toy config). One public output (35)."""
    r = R1CS(P, num_public=1)
    out = r.public_variable(0)
    x = r.allocate_variable()
    x2 = r.allocate_variable()
    x3 = r.allocate_variable()
    r.enforce_multiplication(x, x, x2)        # x * x = x2
    r.enforce_multiplication(x2, x, x3)       # x2 * x = x3
    lhs = r.lc(x3, x).add_term(ONE, 5)        # x3 + x + 5
    r.enforce_equal(lhs, r.lc(out))
    return r


def test_lc_evaluate():
    lc = LinearCombination(P)
    lc.add_term(Variable(0), 3)
    lc.add_term(Variable(2), 5)
    assert lc.evaluate([1, 10, 2]) == 13
    lc.add_term(Variable(2), P - 5)  # cancels -> pruned
    assert 2 not in lc.terms
    assert lc.mul_scalar(4).evaluate([1, 0, 7]) == 12


def test_constraint_satisfaction():
    r, z, x, y = mult_circuit()
    good = r.create_assignment([42], [6, 7])
    bad = r.create_assignment([43], [6, 7])
    assert r.is_satisfied(good)
    assert not r.is_satisfied(bad)
    assert r.first_unsatisfied(bad) == 0


def test_builder_end_to_end():
    r = cubic_circuit()
    w = r.create_assignment([35], [3, 9, 27])
    assert r.is_satisfied(w)
    assert not r.is_satisfied(r.create_assignment([35], [4, 16, 64]))
    with pytest.raises(AssignmentMismatch):
        r.create_assignment([35], [3, 9])


def test_boolean_gadget():
    r = R1CS(P)
    v = r.allocate_variable()
    boolean_constraint(r, v)
    assert r.is_satisfied([1, 0])
    assert r.is_satisfied([1, 1])
    assert not r.is_satisfied([1, 2])  # reference negative case value=2


def test_bit_decomposition():
    r = R1CS(P)
    v = r.allocate_variable()
    bits = bit_decomposition(r, v, 8)
    assert len(bits) == 8
    z = r.create_assignment([], [173] + assign_bits(173, 8))
    assert r.is_satisfied(z)
    z_bad = r.create_assignment([], [173] + assign_bits(172, 8))
    assert not r.is_satisfied(z_bad)


# ------------------------------------------------------------------- QAP


def test_qap_shapes():
    r = cubic_circuit()
    qap = QAP(CURVE, r)
    assert qap.n == 4  # 3 constraints -> next pow2
    assert qap.num_variables == 5
    assert qap.num_public == 1


def test_qap_satisfaction_and_quotient():
    r = cubic_circuit()
    qap = QAP(CURVE, r)
    f = CURVE.fr
    z = f.encode(r.create_assignment([35], [3, 9, 27]))
    assert qap.is_satisfied(z)
    # H.Z identity at a random point off the domain
    s = f.random_ints(80, 1, nonzero=True)[0]
    assert qap.verify_evaluation(s, z)
    # invalid witness: A.B - C does not vanish
    z_bad = f.encode(r.create_assignment([35], [4, 16, 64]))
    assert not qap.is_satisfied(z_bad)
    assert not qap.verify_evaluation(s, z_bad)


def test_qap_eval_vectors_match_host():
    r = cubic_circuit()
    qap = QAP(CURVE, r)
    f = CURVE.fr
    assignment = r.create_assignment([35], [3, 9, 27])
    z = f.encode(assignment)
    a_v, b_v, c_v = qap.eval_vectors(z)
    a_host = [con.a.evaluate(assignment) for con in r.constraints] + [0]
    b_host = [con.b.evaluate(assignment) for con in r.constraints] + [0]
    c_host = [con.c.evaluate(assignment) for con in r.constraints] + [0]
    assert [int(v) for v in f.decode(a_v)] == a_host
    assert [int(v) for v in f.decode(b_v)] == b_host
    assert [int(v) for v in f.decode(c_v)] == c_host


def test_qap_evaluate_all_at_matches_dense():
    """Sparse transposed-matvec setup path == dense per-variable polys."""
    r = cubic_circuit()
    qap = QAP(CURVE, r)
    f = CURVE.fr
    s = f.random_ints(81, 1, nonzero=True)[0]
    a_s, b_s, c_s = (f.decode(x) for x in qap.evaluate_all_at(s))
    for name, got in (("a", a_s), ("b", b_s), ("c", c_s)):
        polys = f.decode(qap.variable_polys(name))  # (V, n) coeffs
        for i in range(qap.num_variables):
            direct = 0
            for c in reversed(list(polys[i])):
                direct = (direct * s + int(c)) % f.p
            assert int(got[i]) == direct, (name, i)


def test_qap_field_mismatch():
    import zkp_tpu
    r = R1CS(zkp_tpu.bn254().r, num_public=0)
    with pytest.raises(QAPError):
        QAP(CURVE, r)


def test_qap_dense_linear_combination():
    """A constraint with > MAX_LC_TERMS terms (e.g. a big public-input sum)
    exercises the two-level segmented reduction -- the reference has no
    density cap (round-3 verdict flagged the old hard failure)."""
    from zkp_tpu.field.params import get_curve
    from zkp_tpu.qap.qap import MAX_LC_TERMS

    curve = get_curve("toy_bn3")
    p = curve.r
    nterms = MAX_LC_TERMS + 300
    r = R1CS(p, num_public=0)
    vs = [r.allocate_variable() for _ in range(nterms)]
    out = r.allocate_variable()
    # sum_i (i+1)*v_i * 1 = out
    lc = r.lc()
    for i, v in enumerate(vs):
        lc = lc.add_term(v, i + 1)
    r.add_constraint(lc, r.lc(ONE), r.lc(out))
    vals = [(7 * i + 3) % p for i in range(nterms)]
    total = sum((i + 1) * v for i, v in enumerate(vals)) % p
    assignment = r.create_assignment([], vals + [total])
    assert r.is_satisfied(assignment)

    qap = QAP(curve, r)
    assert qap._seg_plans[("a", False)] is not None  # dense row plan built
    f = curve.fr
    z = f.encode(assignment)
    assert qap.is_satisfied(z)
    a_v, _, _ = qap.eval_vectors(z)
    assert int(f.decode(a_v)[0]) == total
    # transposed orientation: the dense row is a dense COLUMN when the
    # matrix is read variable-major (setup path)
    s = f.random_ints(83, 1, nonzero=True)[0]
    a_s, b_s, c_s = qap.evaluate_all_at(s)
    lag = [int(v) for v in f.decode(qap.domain.lagrange_coeffs_at(s))]
    # A_i(s) = coeff_i * L_0(s) for each summand variable
    got = f.decode(a_s)
    for i in range(0, nterms, 199):
        assert int(got[1 + i]) == (i + 1) * lag[0] % f.p
