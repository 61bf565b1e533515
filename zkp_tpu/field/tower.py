"""Extension-field towers Fq2 / Fq6 / Fq12 over the limb base field.

Replaces the ark-ff tower arithmetic the reference inherits through
ark-bls12-381 (SURVEY.md 2.2: pairing engine needs Fq2/Fq6/Fq12).
Element layouts (all uint32 Montgomery limbs, batch axes in front):

    Fq2  : (..., 2, L)          a0 + a1*u,          u^2 = -1
    Fq6  : (..., 3, 2, L)       a0 + a1*v + a2*v^2, v^3 = xi
    Fq12 : (..., 2, 3, 2, L)    a0 + a1*w,          w^2 = v

with xi the curve's quadratic non-residue (1+u for BLS12-381, 9+u for
BN254).  Every backend exposes the same duck-typed surface (add/sub/neg/
mul/sqr/inv/is_zero/select/zeros/ones/batch_inv) so the Weierstrass curve
kernels are generic over Fq (G1) and Fq2 (G2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fp import Fp


class F2:
    """Fq2 = Fq[u]/(u^2 + 1), elements (..., 2, L)."""

    def __init__(self, fq: Fp, xi=(1, 1)):
        self.fq = fq
        self.xi = tuple(int(c) for c in xi)  # non-residue for the Fq6 above us
        self.suffix_ndim = 2

    # -- construction
    def zeros(self, shape=()):
        return self.fq.zeros(tuple(shape) + (2,))

    def ones(self, shape=()):
        one = self.fq.ones(tuple(shape))
        zero = self.fq.zeros(tuple(shape))
        return jnp.stack([one, zero], axis=-2)

    def make(self, c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def c0(self, a):
        return a[..., 0, :]

    def c1(self, a):
        return a[..., 1, :]

    def encode(self, pairs, mont=True):
        """Host: list of (c0, c1) int tuples -> array."""
        import numpy as np
        arr = np.asarray(pairs, dtype=object)
        return self.fq.encode(arr, mont=mont)

    def decode(self, a, mont=True):
        return self.fq.decode(a, mont=mont)

    # -- linear ops (componentwise)
    def add(self, a, b):
        return self.fq.add(a, b)

    def sub(self, a, b):
        return self.fq.sub(a, b)

    def neg(self, a):
        return self.fq.neg(a)

    def double(self, a):
        return self.fq.add(a, a)

    def mul_small(self, a, k: int):
        return self.fq.mul_small(a, k)

    # -- multiplicative
    def mul(self, a, b):
        f = self.fq
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = f.mul(a0, b0)
        t1 = f.mul(a1, b1)
        t2 = f.mul(f.add(a0, a1), f.add(b0, b1))
        c0 = f.sub(t0, t1)
        c1 = f.sub(t2, f.add(t0, t1))
        return jnp.stack([c0, c1], axis=-2)

    def sqr(self, a):
        f = self.fq
        a0, a1 = a[..., 0, :], a[..., 1, :]
        s = f.mul(f.add(a0, a1), f.sub(a0, a1))  # a0^2 - a1^2
        d = f.double(f.mul(a0, a1))
        return jnp.stack([s, d], axis=-2)

    def conj(self, a):
        f = self.fq
        return jnp.stack([a[..., 0, :], f.neg(a[..., 1, :])], axis=-2)

    def norm(self, a):
        f = self.fq
        a0, a1 = a[..., 0, :], a[..., 1, :]
        return f.add(f.mul(a0, a0), f.mul(a1, a1))

    def inv(self, a):
        f = self.fq
        ninv = f.inv(self.norm(a))
        return jnp.stack([f.mul(a[..., 0, :], ninv), f.neg(f.mul(a[..., 1, :], ninv))], axis=-2)

    def batch_inv(self, a):
        """Batched inverse along axis 0 via one Fq batch inversion of norms."""
        f = self.fq
        ninv = f.batch_inv(self.norm(a))
        return jnp.stack([f.mul(a[..., 0, :], ninv), f.neg(f.mul(a[..., 1, :], ninv))], axis=-2)

    def mul_by_xi(self, a):
        """Multiply by the sextic non-residue xi = xi0 + xi1*u."""
        f = self.fq
        xi0, xi1 = self.xi
        a0, a1 = a[..., 0, :], a[..., 1, :]
        c0 = f.sub(f.mul_small(a0, xi0), f.mul_small(a1, xi1))
        c1 = f.add(f.mul_small(a1, xi0), f.mul_small(a0, xi1))
        return jnp.stack([c0, c1], axis=-2)

    # -- predicates / select
    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def select(self, cond, x, y):
        return jnp.where(cond[..., None, None] != 0, x, y)


class F6:
    """Fq6 = Fq2[v]/(v^3 - xi), elements (..., 3, 2, L)."""

    def __init__(self, f2: F2):
        self.f2 = f2
        self.suffix_ndim = 3

    def zeros(self, shape=()):
        return self.f2.zeros(tuple(shape) + (3,))

    def ones(self, shape=()):
        return jnp.stack([self.f2.ones(tuple(shape)),
                          self.f2.zeros(tuple(shape)),
                          self.f2.zeros(tuple(shape))], axis=-3)

    def make(self, c0, c1, c2):
        return jnp.stack([c0, c1, c2], axis=-3)

    def add(self, a, b):
        return self.f2.fq.add(a, b)

    def sub(self, a, b):
        return self.f2.fq.sub(a, b)

    def neg(self, a):
        return self.f2.fq.neg(a)

    def mul(self, a, b):
        k = self.f2
        a0, a1, a2 = a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]
        b0, b1, b2 = b[..., 0, :, :], b[..., 1, :, :], b[..., 2, :, :]
        m00 = k.mul(a0, b0)
        m11 = k.mul(a1, b1)
        m22 = k.mul(a2, b2)
        m01 = k.sub(k.sub(k.mul(k.add(a0, a1), k.add(b0, b1)), m00), m11)  # a0b1+a1b0
        m02 = k.sub(k.sub(k.mul(k.add(a0, a2), k.add(b0, b2)), m00), m22)  # a0b2+a2b0
        m12 = k.sub(k.sub(k.mul(k.add(a1, a2), k.add(b1, b2)), m11), m22)  # a1b2+a2b1
        c0 = k.add(m00, k.mul_by_xi(m12))
        c1 = k.add(m01, k.mul_by_xi(m22))
        c2 = k.add(m02, m11)
        return jnp.stack([c0, c1, c2], axis=-3)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_by_v(self, a):
        """a * v: (xi*a2, a0, a1)."""
        k = self.f2
        return jnp.stack([k.mul_by_xi(a[..., 2, :, :]), a[..., 0, :, :], a[..., 1, :, :]], axis=-3)

    def inv(self, a):
        k = self.f2
        a0, a1, a2 = a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]
        t0 = k.sub(k.sqr(a0), k.mul_by_xi(k.mul(a1, a2)))
        t1 = k.sub(k.mul_by_xi(k.sqr(a2)), k.mul(a0, a1))
        t2 = k.sub(k.sqr(a1), k.mul(a0, a2))
        denom = k.add(k.mul(a0, t0),
                      k.add(k.mul_by_xi(k.mul(a2, t1)), k.mul_by_xi(k.mul(a1, t2))))
        dinv = k.inv(denom)
        return jnp.stack([k.mul(t0, dinv), k.mul(t1, dinv), k.mul(t2, dinv)], axis=-3)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2, -3))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2, -3))

    def select(self, cond, x, y):
        return jnp.where(cond[..., None, None, None] != 0, x, y)


class F12:
    """Fq12 = Fq6[w]/(w^2 - v), elements (..., 2, 3, 2, L)."""

    def __init__(self, f6: F6):
        self.f6 = f6
        self.f2 = f6.f2
        self.fq = f6.f2.fq
        self.suffix_ndim = 4

    def zeros(self, shape=()):
        return self.f6.zeros(tuple(shape) + (2,))

    def ones(self, shape=()):
        return jnp.stack([self.f6.ones(tuple(shape)), self.f6.zeros(tuple(shape))], axis=-4)

    def make(self, c0, c1):
        return jnp.stack([c0, c1], axis=-4)

    def add(self, a, b):
        return self.fq.add(a, b)

    def sub(self, a, b):
        return self.fq.sub(a, b)

    def neg(self, a):
        return self.fq.neg(a)

    def mul(self, a, b):
        h = self.f6
        a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
        b0, b1 = b[..., 0, :, :, :], b[..., 1, :, :, :]
        t0 = h.mul(a0, b0)
        t1 = h.mul(a1, b1)
        tm = h.mul(h.add(a0, a1), h.add(b0, b1))
        c0 = h.add(t0, h.mul_by_v(t1))
        c1 = h.sub(tm, h.add(t0, t1))
        return jnp.stack([c0, c1], axis=-4)

    def sqr(self, a):
        return self.mul(a, a)

    def conj(self, a):
        h = self.f6
        return jnp.stack([a[..., 0, :, :, :], h.neg(a[..., 1, :, :, :])], axis=-4)

    def inv(self, a):
        h = self.f6
        a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
        d = h.sub(h.sqr(a0), h.mul_by_v(h.sqr(a1)))
        dinv = h.inv(d)
        return jnp.stack([h.mul(a0, dinv), h.neg(h.mul(a1, dinv))], axis=-4)

    def pow_static(self, a, exp: int):
        """a^exp for host-known exp via scan (used by the final exponentiation)."""
        from .fp import bits_msb_first
        bits = jnp.asarray(bits_msb_first(int(exp)))
        one = jnp.broadcast_to(self.ones(), a.shape)

        def body(acc, bit):
            acc = self.sqr(acc)
            acc = self.select(bit, self.mul(acc, a), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, one, bits)
        return acc

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2, -3, -4))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2, -3, -4))

    def is_one(self, a):
        return self.eq(a, jnp.broadcast_to(self.ones(), a.shape))

    def select(self, cond, x, y):
        return jnp.where(cond[..., None, None, None, None] != 0, x, y)

    # -- embeddings
    def from_fq(self, a):
        """Fq (..., L) -> Fq12 with batch shape preserved."""
        batch = a.shape[:-1]
        out = self.zeros(batch)
        return out.at[..., 0, 0, 0, :].set(a)

    def from_fq2(self, a):
        batch = a.shape[:-2]
        out = self.zeros(batch)
        return out.at[..., 0, 0, :, :].set(a)


def make_tower(fq: Fp, xi=(1, 1)):
    f2 = F2(fq, xi)
    f6 = F6(f2)
    f12 = F12(f6)
    return f2, f6, f12
