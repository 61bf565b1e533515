"""Short-Weierstrass (a=0) Jacobian curve arithmetic, generic over the field.

Replaces ark-ec's group ops (reference uses them throughout setup/prover,
e.g. crates/groth16-setup/src/lib.rs:162-241).  The same code instantiates
G1 (backend = Fq) and G2 (backend = Fq2) because the tower classes share a
duck-typed surface (zkp_tpu.field.tower).

Points are (X, Y, Z) tuples of limb arrays in Jacobian coordinates
(x = X/Z^2, y = Y/Z^3), infinity encoded as Z = 0.  All ops are branch-free
(jnp.where-selected complete formulas) and batch over leading axes — point
lanes are the TPU vectorization axis (SURVEY.md section 7 stage 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field.fp import Fp


class Weierstrass:
    """y^2 = x^3 + b over a duck-typed field backend ``k``."""

    def __init__(self, k, b_int_or_elem, name="curve"):
        self.k = k
        self.name = name
        self._b = b_int_or_elem  # device element of k (broadcastable)

    # ----------------------------------------------------------- point utils

    def infinity(self, shape=()):
        k = self.k
        return (k.ones(shape), k.ones(shape), k.zeros(shape))

    def is_inf(self, P):
        return self.k.is_zero(P[2])

    def from_affine(self, x, y, inf=None):
        """(x, y) + optional infinity mask -> Jacobian point."""
        k = self.k
        z = jnp.broadcast_to(k.ones(), x.shape)
        if inf is not None:
            z = k.select(inf, jnp.zeros_like(z), z)
        return (x, y, z)

    def to_affine(self, P):
        """-> (x, y, inf_mask); uses one batched inversion over axis 0."""
        k = self.k
        X, Y, Z = P
        inf = self.is_inf(P)
        zinv = k.batch_inv(Z) if Z.ndim > k.suffix_ndim else k.inv(Z)
        zinv2 = k.sqr(zinv)
        zinv3 = k.mul(zinv2, zinv)
        x = k.mul(X, zinv2)
        y = k.mul(Y, zinv3)
        x = k.select(inf, jnp.zeros_like(x), x)
        y = k.select(inf, jnp.zeros_like(y), y)
        return x, y, inf

    def neg(self, P):
        X, Y, Z = P
        return (X, self.k.neg(Y), Z)

    def on_curve(self, x, y):
        k = self.k
        lhs = k.sqr(y)
        rhs = k.add(k.mul(k.sqr(x), x), jnp.broadcast_to(self._b, x.shape))
        return k.eq(lhs, rhs)

    def eq_points(self, P, Q):
        """Projective equality: X1 Z2^2 == X2 Z1^2 and Y1 Z2^3 == Y2 Z1^3."""
        k = self.k
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1, Z2Z2 = k.sqr(Z1), k.sqr(Z2)
        ex = k.eq(k.mul(X1, Z2Z2), k.mul(X2, Z1Z1))
        ey = k.eq(k.mul(Y1, k.mul(Z2, Z2Z2)), k.mul(Y2, k.mul(Z1, Z1Z1)))
        both_inf = self.is_inf(P) & self.is_inf(Q)
        one_inf = self.is_inf(P) ^ self.is_inf(Q)
        return (ex & ey & ~one_inf) | both_inf

    # ------------------------------------------------------------- group law

    def double(self, P):
        """dbl-2009-l (a=0): 2M + 5S.  Complete: doubles infinity to infinity,
        2-torsion (Y=0) to infinity."""
        k = self.k
        X, Y, Z = P
        A = k.sqr(X)
        B = k.sqr(Y)
        C = k.sqr(B)
        D = k.double(k.sub(k.sqr(k.add(X, B)), k.add(A, C)))
        E = k.add(k.double(A), A)
        F = k.sqr(E)
        X3 = k.sub(F, k.double(D))
        Y3 = k.sub(k.mul(E, k.sub(D, X3)), k.mul_small(C, 8))
        Z3 = k.double(k.mul(Y, Z))
        return (X3, Y3, Z3)

    def add(self, P, Q):
        """add-2007-bl with where-based edge handling (11M + 5S + dbl)."""
        k = self.k
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = k.sqr(Z1)
        Z2Z2 = k.sqr(Z2)
        U1 = k.mul(X1, Z2Z2)
        U2 = k.mul(X2, Z1Z1)
        S1 = k.mul(Y1, k.mul(Z2, Z2Z2))
        S2 = k.mul(Y2, k.mul(Z1, Z1Z1))
        H = k.sub(U2, U1)
        rhalf = k.sub(S2, S1)
        I = k.sqr(k.double(H))
        J = k.mul(H, I)
        r = k.double(rhalf)
        V = k.mul(U1, I)
        X3 = k.sub(k.sub(k.sqr(r), J), k.double(V))
        Y3 = k.sub(k.mul(r, k.sub(V, X3)), k.double(k.mul(S1, J)))
        Z3 = k.mul(k.sub(k.sqr(k.add(Z1, Z2)), k.add(Z1Z1, Z2Z2)), H)

        inf1 = self.is_inf(P)
        inf2 = self.is_inf(Q)
        same_x = k.is_zero(H) & ~inf1 & ~inf2
        same_y = k.is_zero(rhalf)
        dX, dY, dZ = self.double(P)
        iX, iY, iZ = self.infinity()
        X3 = k.select(same_x & same_y, dX, X3)
        Y3 = k.select(same_x & same_y, dY, Y3)
        Z3 = k.select(same_x & same_y, dZ, Z3)
        X3 = k.select(same_x & ~same_y, jnp.broadcast_to(iX, X3.shape), X3)
        Y3 = k.select(same_x & ~same_y, jnp.broadcast_to(iY, Y3.shape), Y3)
        Z3 = k.select(same_x & ~same_y, jnp.broadcast_to(iZ, Z3.shape), Z3)
        X3 = k.select(inf1, X2, X3)
        Y3 = k.select(inf1, Y2, Y3)
        Z3 = k.select(inf1, Z2, Z3)
        X3 = k.select(inf2, X1, X3)
        Y3 = k.select(inf2, Y1, Y3)
        Z3 = k.select(inf2, Z1, Z3)
        return (X3, Y3, Z3)

    def add_mixed(self, P, xq, yq, q_inf=None):
        """P (Jacobian) + Q (affine): madd-2007-bl, 7M + 4S + edge selects."""
        k = self.k
        X1, Y1, Z1 = P
        Z1Z1 = k.sqr(Z1)
        U2 = k.mul(xq, Z1Z1)
        S2 = k.mul(yq, k.mul(Z1, Z1Z1))
        H = k.sub(U2, X1)
        rhalf = k.sub(S2, Y1)
        HH = k.sqr(H)
        I = k.mul_small(HH, 4)
        J = k.mul(H, I)
        r = k.double(rhalf)
        V = k.mul(X1, I)
        X3 = k.sub(k.sub(k.sqr(r), J), k.double(V))
        Y3 = k.sub(k.mul(r, k.sub(V, X3)), k.double(k.mul(Y1, J)))
        Z3 = k.sub(k.sub(k.sqr(k.add(Z1, H)), Z1Z1), HH)

        inf1 = self.is_inf(P)
        inf2 = q_inf if q_inf is not None else (k.is_zero(xq) & k.is_zero(yq))
        same_x = k.is_zero(H) & ~inf1 & ~inf2
        same_y = k.is_zero(rhalf)
        dX, dY, dZ = self.double(P)
        iX, iY, iZ = self.infinity()
        X3 = k.select(same_x & same_y, dX, X3)
        Y3 = k.select(same_x & same_y, dY, Y3)
        Z3 = k.select(same_x & same_y, dZ, Z3)
        X3 = k.select(same_x & ~same_y, jnp.broadcast_to(iX, X3.shape), X3)
        Y3 = k.select(same_x & ~same_y, jnp.broadcast_to(iY, Y3.shape), Y3)
        Z3 = k.select(same_x & ~same_y, jnp.broadcast_to(iZ, Z3.shape), Z3)
        one = jnp.broadcast_to(k.ones(), X3.shape)
        X3 = k.select(inf1, xq, X3)
        Y3 = k.select(inf1, yq, Y3)
        Z3 = k.select(inf1, one, Z3)  # both-inf case is fixed by the inf2 selects below
        X3 = k.select(inf2, X1, X3)
        Y3 = k.select(inf2, Y1, Y3)
        Z3 = k.select(inf2, Z1, Z3)
        return (X3, Y3, Z3)

    # --------------------------------------------------------- scalar muls

    def scalar_mul(self, P, scalar_limbs):
        """Batched double-and-add: scalars (..., nl) uint32 standard-form limbs."""
        k = self.k
        bits = self._scalar_bits(scalar_limbs)

        Xb, Yb, Zb = P
        batch = bits.shape[1:]
        acc0 = self.infinity(tuple(batch))

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, (Xb, Yb, Zb))
            acc = tuple(k.select(bit, a2, a1) for a1, a2 in zip(acc, added))
            return acc, None

        acc, _ = jax.lax.scan(body, acc0, bits)
        return acc

    @staticmethod
    def _scalar_bits(scalar_limbs):
        """(..., nl) 16-bit limbs -> (nbits, ...) bit array, MSB first."""
        nl = scalar_limbs.shape[-1]
        bits = []
        for li in range(nl - 1, -1, -1):
            limb = scalar_limbs[..., li]
            for j in range(15, -1, -1):
                bits.append((limb >> j) & 1)
        return jnp.stack(bits, axis=0)

    def scalar_mul_affine(self, xq, yq, q_inf, scalar_limbs):
        """Double-and-add against an AFFINE base: mixed adds only.

        ~17% fewer field muls in the scan body than ``scalar_mul`` -- this is
        the small-N MSM path, where XLA:CPU compile time of the body is what
        the driver's multi-chip dryrun budget is spent on.
        """
        k = self.k
        bits = self._scalar_bits(scalar_limbs)
        acc0 = self.infinity(tuple(bits.shape[1:]))

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add_mixed(acc, xq, yq, q_inf=q_inf)
            acc = tuple(k.select(bit, a2, a1) for a1, a2 in zip(acc, added))
            return acc, None

        acc, _ = jax.lax.scan(body, acc0, bits)
        return acc

    def reduce_sum(self, P):
        """Tree-reduce a batch of Jacobian points along axis 0 to one point."""
        X, Y, Z = P
        while X.shape[0] > 1:
            n = X.shape[0]
            if n % 2 == 1:
                iX, iY, iZ = self.infinity()
                X = jnp.concatenate([X, jnp.broadcast_to(iX, (1,) + X.shape[1:])], axis=0)
                Y = jnp.concatenate([Y, jnp.broadcast_to(iY, (1,) + Y.shape[1:])], axis=0)
                Z = jnp.concatenate([Z, jnp.broadcast_to(iZ, (1,) + Z.shape[1:])], axis=0)
                n += 1
            h = n // 2
            X, Y, Z = self.add((X[:h], Y[:h], Z[:h]), (X[h:], Y[h:], Z[h:]))
        return (X[0], Y[0], Z[0])
