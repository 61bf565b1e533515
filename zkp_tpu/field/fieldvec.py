"""FieldVec + field utils: parity with the reference's groth16-field API.

Reference surface (crates/groth16-field/src/lib.rs):
  - ``FieldVec`` with ``inner_product`` / ``scalar_mul`` / ``add_vec`` (:79-120),
  - ``utils::random_field_vec`` (:148-153), ``utils::field_vec_from_u64``
    (:156-158), Horner ``utils::evaluate_polynomial`` (:161-171),
  - ``FieldError`` (:123-141).

Vectors are device Montgomery limb arrays (n, L); mismatched lengths raise
``FieldError`` like the reference's ``FieldError::InvalidLength``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fp import Fp


class FieldError(Exception):
    pass


class InvalidLength(FieldError):
    pass


class FieldVec:
    """A device vector of field elements with the reference's vector ops."""

    def __init__(self, field: Fp, data):
        self.field = field
        if hasattr(data, "shape"):
            assert data.shape[-1] == field.n
            self.data = jnp.asarray(data)
        else:
            self.data = field.encode(list(data))

    def __len__(self):
        return self.data.shape[0]

    def _check(self, other: "FieldVec"):
        if len(self) != len(other):
            raise InvalidLength(f"length mismatch: {len(self)} vs {len(other)}")

    def inner_product(self, other: "FieldVec"):
        """sum_i a_i * b_i -> single field element (host int)."""
        self._check(other)
        f = self.field
        prods = f.mul(self.data, other.data)
        # lazy limb-wise sum + wide reduce (exact for < 2^16 terms per limb)
        if len(self) >= (1 << 16):
            raise InvalidLength("inner_product limited to < 65536 terms")
        acc = jnp.sum(prods, axis=0, dtype=jnp.uint32)[None]
        carried, _ = f._carry(acc, f.n + 2)
        return int(f.decode(f.reduce_wide(carried))[0])

    def scalar_mul(self, s: int) -> "FieldVec":
        f = self.field
        return FieldVec(f, f.mul(self.data, f.const(s)))

    def add_vec(self, other: "FieldVec") -> "FieldVec":
        self._check(other)
        return FieldVec(self.field, self.field.add(self.data, other.data))

    def to_ints(self):
        return [int(v) for v in self.field.decode(self.data)]


def random_field_vec(field: Fp, n: int, seed: int) -> FieldVec:
    return FieldVec(field, field.random(seed, (n,)))


def field_vec_from_u64(field: Fp, vals) -> FieldVec:
    return FieldVec(field, [int(v) & 0xFFFFFFFFFFFFFFFF for v in vals])


def evaluate_polynomial(field: Fp, coeffs, point: int) -> int:
    """Horner evaluation over host ints (reference utils :161-171)."""
    acc = 0
    p = field.p
    for c in reversed([int(v) % p for v in coeffs]):
        acc = (acc * point + c) % p
    return acc
