"""Example circuits (reference: crates/groth16-examples/src/lib.rs:14-211).

Each builder returns (R1CS, assignment) for its canonical witness; the
``run_*`` helpers do what the reference examples do (build -> QAP ->
satisfaction check) *plus* a full prove -> verify round trip, which the
reference never wires up (its only full round trips are unit tests,
SURVEY.md 3.5).  ``range_check`` is implemented for real -- the reference's
``examples/range_check.rs:1-5`` is an explicit TODO placeholder.
"""

from __future__ import annotations

from .curve.curves import curve_ops
from .groth16.groth16 import (
    CRS, Prover, SetupParams, Verifier, Witness, generate_crs,
)
from .qap.qap import QAP
from .r1cs.r1cs import ONE, R1CS, boolean_constraint, bit_decomposition, assign_bits


def multiplication_circuit(curve_name: str = "bls12_381"):
    """x * y = z with z public; witness (x, y) = (6, 7) (reference :14-61)."""
    p = curve_ops(curve_name).params.r
    r = R1CS(p, num_public=1)
    z = r.public_variable(0)
    x = r.allocate_variable()
    y = r.allocate_variable()
    r.enforce_multiplication(x, y, z)
    return r, r.create_assignment([42], [6, 7])


def quadratic_circuit(curve_name: str = "bls12_381"):
    """x^2 + y^2 = z, 3 constraints (reference :64-134)."""
    p = curve_ops(curve_name).params.r
    r = R1CS(p, num_public=1)
    z = r.public_variable(0)
    x = r.allocate_variable()
    y = r.allocate_variable()
    x2 = r.allocate_variable()
    y2 = r.allocate_variable()
    r.enforce_multiplication(x, x, x2)
    r.enforce_multiplication(y, y, y2)
    r.enforce_equal(r.lc(x2, y2), r.lc(z))
    return r, r.create_assignment([25], [3, 4, 9, 16])


def boolean_circuit(curve_name: str = "bls12_381"):
    """Boolean AND with booleanity constraints (reference :137-199)."""
    p = curve_ops(curve_name).params.r
    r = R1CS(p, num_public=1)
    c = r.public_variable(0)
    a = r.allocate_variable()
    b = r.allocate_variable()
    boolean_constraint(r, a)
    boolean_constraint(r, b)
    r.enforce_multiplication(a, b, c)
    return r, r.create_assignment([1], [1, 1])


def cubic_circuit(curve_name: str = "bls12_381"):
    """x^3 + x + 5 = 35 (BASELINE.json toy config); witness x = 3."""
    p = curve_ops(curve_name).params.r
    r = R1CS(p, num_public=1)
    out = r.public_variable(0)
    x = r.allocate_variable()
    x2 = r.allocate_variable()
    x3 = r.allocate_variable()
    r.enforce_multiplication(x, x, x2)
    r.enforce_multiplication(x2, x, x3)
    r.enforce_equal(r.lc(x3, x).add_term(ONE, 5), r.lc(out))
    return r, r.create_assignment([35], [3, 9, 27])


def range_check_circuit(value: int = 200, bits: int = 8,
                        curve_name: str = "bls12_381"):
    """Prove 0 <= value < 2^bits via bit decomposition (reference TODO)."""
    p = curve_ops(curve_name).params.r
    r = R1CS(p, num_public=0)
    v = r.allocate_variable()
    bit_decomposition(r, v, bits)
    return r, r.create_assignment([], [value] + assign_bits(value, bits))


def synthetic_mult_circuit(num_constraints: int, curve_name: str = "bls12_381",
                           seed: int = 1):
    """N multiplication constraints (the reference CLI's dummy circuit shape,
    groth16-cli/src/lib.rs:57-70) -- used for benchmarking at scale."""
    params = curve_ops(curve_name).params
    p = params.r
    r = R1CS(p, num_public=0)
    fr = params.fr
    xs = fr.random_ints(seed, num_constraints)
    ys = fr.random_ints(seed + 1, num_constraints)
    witness = []
    for i in range(num_constraints):
        a = r.allocate_variable()
        b = r.allocate_variable()
        c = r.allocate_variable()
        r.enforce_multiplication(a, b, c)
        witness += [xs[i], ys[i], xs[i] * ys[i] % p]
    return r, r.create_assignment([], witness)


def run_example(builder, curve_name: str = "bls12_381", seed: int = 42,
                verbose: bool = True):
    """Build -> QAP check -> setup -> prove -> verify one example circuit."""
    ops = curve_ops(curve_name)
    r1cs, assignment = builder(curve_name) if builder is not range_check_circuit \
        else builder(curve_name=curve_name)
    assert r1cs.is_satisfied(assignment), "R1CS unsatisfied"
    qap = QAP(ops.params, r1cs)
    witness = Witness(qap, assignment)
    witness.validate()
    crs = generate_crs(ops, qap, SetupParams.random(ops.params, seed))
    proof = Prover(ops).prove(crs.pk, witness, seed + 1)
    ok = Verifier(ops).verify(crs.vk, proof, witness.public_inputs)
    if verbose:
        print(f"  constraints={r1cs.num_constraints} vars={r1cs.num_variables} "
              f"domain={qap.n} -> proof verifies: {ok}")
    if not ok:
        raise RuntimeError("proof did not verify")
    return proof


def run_all_examples(curve_name: str = "bls12_381"):
    """(reference run_all_examples, examples/lib.rs:202-211 -- but end-to-end)."""
    for name, builder in [
        ("multiplication x*y=z", multiplication_circuit),
        ("quadratic x^2+y^2=z", quadratic_circuit),
        ("boolean AND", boolean_circuit),
        ("cubic x^3+x+5=35", cubic_circuit),
        ("range check 8-bit", range_check_circuit),
    ]:
        print(f"[{name}]")
        run_example(builder, curve_name)


if __name__ == "__main__":
    run_all_examples()
