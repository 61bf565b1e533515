"""R1CS constraint-system frontend (host-side, python-int coefficients).

API mirrors the reference's ``crates/groth16-r1cs/src/lib.rs``:
``Variable`` (:19-35), sparse ``LinearCombination`` (:45-184),
``Constraint`` (:186-225), ``R1CS`` builder (:227-358) and the
boolean / bit-decomposition gadgets (:425-471) — with the same
``z = [1 | public | witness]`` convention (:16-18, z[0] = 1).

Circuit synthesis is inherently host logic; the TPU boundary starts at
``R1CS.to_coo`` which lowers the sparse matrices to device arrays for the
QAP/NTT/MSM pipeline (SURVEY.md section 7 stage 3: "host logic, device math").
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

import numpy as np


class R1CSError(Exception):
    """Typed error taxonomy (reference: R1CSError, groth16-r1cs/src/lib.rs:366-419)."""


class InvalidVariable(R1CSError):
    pass


class UnsatisfiedConstraint(R1CSError):
    pass


class AssignmentMismatch(R1CSError):
    pass


@dataclass(frozen=True, order=True)
class Variable:
    """Index into the assignment vector z; Variable(0) is the constant 1."""

    index: int

    def __post_init__(self):
        if self.index < 0:
            raise InvalidVariable(f"negative variable index {self.index}")


ONE = Variable(0)
Variable.ONE = ONE


class LinearCombination:
    """Sparse sum of coeff * variable over the scalar field (python ints)."""

    __slots__ = ("p", "terms")

    def __init__(self, p: int, terms: Optional[Dict[int, int]] = None):
        self.p = p
        self.terms: Dict[int, int] = {}
        if terms:
            for idx, c in terms.items():
                self.add_term(Variable(idx) if isinstance(idx, int) else idx, c)

    @classmethod
    def zero(cls, p: int) -> "LinearCombination":
        return cls(p)

    @classmethod
    def from_variable(cls, p: int, v: Variable, coeff: int = 1) -> "LinearCombination":
        lc = cls(p)
        lc.add_term(v, coeff)
        return lc

    @classmethod
    def constant(cls, p: int, c: int) -> "LinearCombination":
        lc = cls(p)
        lc.add_term(ONE, c)
        return lc

    def add_term(self, v: Variable, coeff: int) -> "LinearCombination":
        """Add coeff * v, pruning zero results (reference :76-92)."""
        idx = v.index if isinstance(v, Variable) else int(v)
        c = (self.terms.get(idx, 0) + coeff) % self.p
        if c == 0:
            self.terms.pop(idx, None)
        else:
            self.terms[idx] = c
        return self

    def mul_scalar(self, s: int) -> "LinearCombination":
        s = s % self.p
        out = LinearCombination(self.p)
        if s != 0:
            for idx, c in self.terms.items():
                out.terms[idx] = (c * s) % self.p
        return out

    def add_lc(self, other: "LinearCombination") -> "LinearCombination":
        out = LinearCombination(self.p, dict(self.terms))
        for idx, c in other.terms.items():
            out.add_term(Variable(idx), c)
        return out

    def sub_lc(self, other: "LinearCombination") -> "LinearCombination":
        return self.add_lc(other.mul_scalar(self.p - 1))

    def evaluate(self, z: List[int]) -> int:
        acc = 0
        for idx, c in self.terms.items():
            if idx >= len(z):
                raise InvalidVariable(f"variable {idx} out of range (len {len(z)})")
            acc += c * (z[idx] % self.p)
        return acc % self.p

    def is_empty(self) -> bool:
        return not self.terms

    def __add__(self, other):
        if isinstance(other, Variable):
            other = LinearCombination.from_variable(self.p, other)
        return self.add_lc(other)

    def __sub__(self, other):
        if isinstance(other, Variable):
            other = LinearCombination.from_variable(self.p, other)
        return self.sub_lc(other)

    def __mul__(self, scalar: int):
        return self.mul_scalar(scalar)

    __rmul__ = __mul__

    def __repr__(self):
        inner = " + ".join(f"{c}*z{i}" for i, c in sorted(self.terms.items()))
        return f"LC({inner or '0'})"


@dataclass
class Constraint:
    """<a,z> * <b,z> = <c,z> (reference :186-225)."""

    a: LinearCombination
    b: LinearCombination
    c: LinearCombination

    def is_satisfied(self, z: List[int]) -> bool:
        p = self.a.p
        return (self.a.evaluate(z) * self.b.evaluate(z) - self.c.evaluate(z)) % p == 0


class R1CS:
    """Rank-1 constraint system builder.

    z = [1 | public inputs | private witness]; num_variables counts the
    constant-one slot (reference convention, groth16-r1cs/src/lib.rs:16-18).
    """

    def __init__(self, p: int, num_public: int = 0):
        self.p = p
        self.num_public = num_public
        self.num_variables = 1 + num_public  # constant + publics
        self.constraints: List[Constraint] = []

    # ------------------------------------------------------------- building

    def lc(self, *terms) -> LinearCombination:
        """Convenience: lc((var, coeff), ...) or lc(var, ...)."""
        out = LinearCombination(self.p)
        for t in terms:
            if isinstance(t, Variable):
                out.add_term(t, 1)
            else:
                v, c = t
                out.add_term(v, c)
        return out

    def constant(self, c: int) -> LinearCombination:
        return LinearCombination.constant(self.p, c)

    def public_variable(self, i: int) -> Variable:
        if not (0 <= i < self.num_public):
            raise InvalidVariable(f"public index {i} out of range")
        return Variable(1 + i)

    def allocate_variable(self) -> Variable:
        """Allocate a private witness variable (reference :252-257)."""
        v = Variable(self.num_variables)
        self.num_variables += 1
        return v

    def add_constraint(self, a, b, c) -> None:
        for x in (a, b, c):
            for idx in x.terms:
                if idx >= self.num_variables:
                    raise InvalidVariable(f"variable {idx} not allocated")
        self.constraints.append(Constraint(a, b, c))

    def enforce_equal(self, left, right) -> None:
        """(left - right) * 1 = 0 (reference :269-283)."""
        one = LinearCombination.constant(self.p, 1)
        self.add_constraint(left.sub_lc(right), one, LinearCombination.zero(self.p))

    def enforce_multiplication(self, a: Variable, b: Variable, c: Variable) -> None:
        """a * b = c over variables (reference :285-293)."""
        self.add_constraint(
            LinearCombination.from_variable(self.p, a),
            LinearCombination.from_variable(self.p, b),
            LinearCombination.from_variable(self.p, c),
        )

    # ------------------------------------------------------------ assignment

    @property
    def num_constraints(self) -> int:
        return len(self.constraints)

    @property
    def num_witness(self) -> int:
        return self.num_variables - 1 - self.num_public

    def create_assignment(self, public_inputs: List[int], witness: List[int]) -> List[int]:
        """Build z = [1 | public | witness] with validation (reference :331-357)."""
        if len(public_inputs) != self.num_public:
            raise AssignmentMismatch(
                f"expected {self.num_public} public inputs, got {len(public_inputs)}")
        if len(witness) != self.num_witness:
            raise AssignmentMismatch(
                f"expected {self.num_witness} witness values, got {len(witness)}")
        return [1] + [x % self.p for x in public_inputs] + [x % self.p for x in witness]

    def is_satisfied(self, z: List[int]) -> bool:
        """Size + z[0]=1 + per-constraint check (reference :296-316).

        Large systems route through the native host library (C++ Montgomery
        spmv, zkp_tpu.native.host) when available."""
        if len(z) != self.num_variables:
            return False
        if z[0] % self.p != 1:
            return False
        if self.num_constraints > 4096 and self.p.bit_length() <= 256:
            try:
                from ..native.host import available, fast_r1cs_satisfied
                if available():
                    return fast_r1cs_satisfied(self, z)
            except Exception:
                pass
        return all(con.is_satisfied(z) for con in self.constraints)

    def first_unsatisfied(self, z: List[int]) -> Optional[int]:
        for i, con in enumerate(self.constraints):
            if not con.is_satisfied(z):
                return i
        return None

    # ---------------------------------------------------------- TPU lowering

    def to_coo(self):
        """Lower the three sparse matrices to COO numpy arrays.

        Returns dict m -> (rows int32, cols int32, coeffs list[int]) for
        m in 'a','b','c'.  Rows index constraints, cols index variables.
        This is the device handoff point: coefficients become Montgomery limb
        arrays in the QAP layer.
        """
        out = {}
        for name in ("a", "b", "c"):
            rows, cols, coeffs = [], [], []
            for i, con in enumerate(self.constraints):
                lc = getattr(con, name)
                for idx, c in sorted(lc.terms.items()):
                    rows.append(i)
                    cols.append(idx)
                    coeffs.append(c)
            out[name] = (
                np.asarray(rows, dtype=np.int32),
                np.asarray(cols, dtype=np.int32),
                coeffs,
            )
        return out


# ------------------------------------------------------------------ gadgets


def boolean_constraint(r1cs: R1CS, v: Variable) -> None:
    """v * v = v  =>  v in {0, 1} (reference utils :425-437)."""
    lv = LinearCombination.from_variable(r1cs.p, v)
    r1cs.add_constraint(lv, lv, lv)


def bit_decomposition(r1cs: R1CS, v: Variable, num_bits: int) -> List[Variable]:
    """Allocate bits b_i, enforce booleanity and sum 2^i b_i = v (reference :439-471)."""
    bits = [r1cs.allocate_variable() for _ in range(num_bits)]
    for b in bits:
        boolean_constraint(r1cs, b)
    acc = LinearCombination(r1cs.p)
    for i, b in enumerate(bits):
        acc.add_term(b, pow(2, i, r1cs.p))
    r1cs.enforce_equal(acc, LinearCombination.from_variable(r1cs.p, v))
    return bits


def assign_bits(value: int, num_bits: int) -> List[int]:
    """Witness helper matching bit_decomposition's allocation order."""
    return [(value >> i) & 1 for i in range(num_bits)]
