"""Limb-list prime-field arithmetic: the shared core for Pallas kernels.

Replaces the hot-path role of ``fp.py``'s vectorized (..., L) ops.  Here a
field element is a **python list of L uint32 arrays**, each array holding one
16-bit limb for a whole batch of elements.  Inside a Pallas TPU kernel each
limb is a (S, 128)-shaped vreg-resident vector, so every operation below
lowers to full-width VPU ops with zero layout waste; the same functions also
run under plain jnp (CPU tests, interpret mode).

Everything is pure and shape-polymorphic: limbs just need a common shape.
Constants (modulus, pinv) are python ints, splatted as u32 scalars so Mosaic
keeps them in registers.

Reference semantics: ark-ff Montgomery representation (4x64 limbs) —
crates/groth16-field/src/lib.rs:14-17 delegates to it; we use 16-bit limbs
(24 for BLS12-381 Fq, 16 for Fr) because the TPU VPU does exact 32x32->32
multiplies and 16x16 products plus column sums stay far below 2^32.
"""

from __future__ import annotations

import jax.numpy as jnp

LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def const_limbs(x: int, L: int):
    """Python int -> list of L python-int 16-bit limbs."""
    return [(int(x) >> (LIMB_BITS * i)) & MASK for i in range(L)]


def splat(vals, like):
    """List of python ints -> list of u32 scalars broadcastable against `like`."""
    return [jnp.uint32(v) for v in vals]


# --------------------------------------------------------------------- carries

def carry_seq(cols, n_out: int):
    """Ripple-carry normalize: list of u32 column sums -> n_out 16-bit limbs.

    cols[k] < 2^32 - 2^16 required (so cols[k] + carry cannot overflow u32:
    carries stay < 2^16 as long as every column sum is < 2^32 - 2^16).
    Returns (limbs, carry_out).
    """
    out = []
    c = None
    for k in range(len(cols)):
        t = cols[k] if c is None else cols[k] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    while len(out) < n_out:
        if c is None:
            out.append(jnp.zeros_like(cols[0]))
        else:
            out.append(c & MASK)
            c = c >> LIMB_BITS
    return out[:n_out], (c if c is not None else jnp.zeros_like(cols[0]))


def add_limbs(a, b):
    """Limbwise add + ripple carry.  Returns (limbs, carry_out in {0,1})."""
    return carry_seq([x + y for x, y in zip(a, b)], len(a))


def sub_limbs(a, b):
    """a - b with borrow: a + (~b) + 1.  Returns (limbs, borrow in {0,1})."""
    n = len(a)
    cols = [x + (MASK - y) for x, y in zip(a, b)]
    cols[0] = cols[0] + 1
    out, c = carry_seq(cols, n)
    return out, 1 - c


def select(cond, a, b):
    """Per-element select between two limb lists.  cond: bool/int array."""
    return [jnp.where(cond != 0, x, y) for x, y in zip(a, b)]


def is_zero(a):
    z = a[0] == 0
    for x in a[1:]:
        z = z & (x == 0)
    return z


def eq(a, b):
    z = a[0] == b[0]
    for x, y in zip(a[1:], b[1:]):
        z = z & (x == y)
    return z


# ------------------------------------------------------------------ column mul

def mul_cols(x, y, out_len: int):
    """Column sums of the product: cols[k] = sum_{i+j=k} x_i*y_j, lo/hi split.

    Each 16x16 product is exact in u32; its low half goes to column k, the
    high half to column k+1.  With len <= 24 terms per column every column
    sum stays < 24 * 2 * 2^16 < 2^22.
    """
    cols = [None] * out_len
    for i in range(len(x)):
        xi = x[i]
        for j in range(len(y)):
            k = i + j
            if k >= out_len:
                continue
            prod = xi * y[j]
            lo = prod & MASK
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < out_len:
                hi = prod >> LIMB_BITS
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    zero = jnp.zeros_like(x[0])
    return [c if c is not None else zero for c in cols]


def sqr_cols(x, out_len: int):
    """Column sums of x*x exploiting symmetry: ~half the multiplies."""
    n = len(x)
    cols = [None] * out_len

    def acc(k, v):
        if k < out_len:
            cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(n):
        prod = x[i] * x[i]
        acc(2 * i, prod & MASK)
        acc(2 * i + 1, prod >> LIMB_BITS)
    for i in range(n):
        for j in range(i + 1, n):
            k = i + j
            if k >= out_len:
                continue
            prod = x[i] * x[j]
            acc(k, (prod & MASK) * 2)
            acc(k + 1, (prod >> LIMB_BITS) * 2)
    zero = jnp.zeros_like(x[0])
    return [c if c is not None else zero for c in cols]


# --------------------------------------------------------------------- modular

class FpLimbs:
    """Field-op namespace bound to one modulus, over limb lists."""

    def __init__(self, p: int, L: int):
        self.p = int(p)
        self.L = int(L)
        self.R = 1 << (LIMB_BITS * L)
        assert 2 * p < self.R, "need one spare bit for single-pass cond-sub"
        self.p_limbs = const_limbs(p, L)
        self.pinv_limbs = const_limbs((-pow(p, -1, self.R)) % self.R, L)
        self.r2 = (self.R * self.R) % p
        self.r2_limbs = const_limbs(self.r2, L)
        self.one_mont = const_limbs(self.R % p, L)

    # -- helpers -----------------------------------------------------------

    def consts(self, vals):
        return splat(vals, None)

    def zero(self, like):
        z = jnp.zeros_like(like[0])
        return [z for _ in range(self.L)]

    def one(self, like):
        z = jnp.zeros_like(like[0])
        return [z + jnp.uint32(v) for v in self.one_mont]

    def const_mont(self, x: int, like):
        v = (int(x) % self.p) * self.R % self.p
        z = jnp.zeros_like(like[0])
        return [z + jnp.uint32(c) for c in const_limbs(v, self.L)]

    # -- ring ops ------------------------------------------------------------

    def cond_sub_p(self, limbs, extra_carry=None):
        """Reduce a value < 2p (plus optional carry bit meaning +R) to < p."""
        pl = splat(self.p_limbs, limbs)
        d, borrow = sub_limbs(limbs, pl)
        take_d = borrow == 0
        if extra_carry is not None:
            take_d = take_d | (extra_carry == 1)
        return select(take_d, d, limbs)

    def add(self, a, b):
        s, c = add_limbs(a, b)
        return self.cond_sub_p(s, extra_carry=c)

    def sub(self, a, b):
        d, borrow = sub_limbs(a, b)
        dp, _ = add_limbs(d, splat(self.p_limbs, a))
        return select(borrow == 1, dp, d)

    def neg(self, a):
        d, _ = sub_limbs(splat(self.p_limbs, a), a)
        return select(is_zero(a), a, d)

    def double(self, a):
        return self.add(a, a)

    def mont_reduce_cols(self, t_cols):
        """Montgomery reduce raw column sums (len 2L, each < 2^22) -> limbs < p."""
        L = self.L
        t_limbs, _ = carry_seq(t_cols, 2 * L)
        m = mul_cols(t_limbs[:L], splat(self.pinv_limbs, t_limbs), L)
        m_limbs, _ = carry_seq(m, L)
        mp = mul_cols(m_limbs, splat(self.p_limbs, t_limbs), 2 * L)
        u_cols = [a + b for a, b in zip(t_limbs, mp)]
        u, c = carry_seq(u_cols, 2 * L)
        # low L limbs are zero by construction; result = u[L:] (+ c*R), < 2p
        return self.cond_sub_p(u[L:], extra_carry=c)

    def mul(self, a, b):
        return self.mont_reduce_cols(mul_cols(a, b, 2 * self.L))

    def sqr(self, a):
        return self.mont_reduce_cols(sqr_cols(a, 2 * self.L))

    def mul_small(self, a, k: int):
        """a * small host constant via binary double/add (k <= 16 in practice)."""
        k = int(k)
        if k == 0:
            return self.zero(a)
        acc = None
        base = list(a)
        while k:
            if k & 1:
                acc = base if acc is None else self.add(acc, base)
            k >>= 1
            if k:
                base = self.add(base, base)
        return acc


class Fp2Limbs:
    """Quadratic tower Fq2 = Fq[u]/(u^2 + 1) over limb lists (BLS12-381 form).

    Elements are (c0, c1) pairs of limb lists.  nonresidue = -1, so
    (a0 + a1 u)(b0 + b1 u) = (a0 b0 - a1 b1) + ((a0+a1)(b0+b1) - a0b0 - a1b1) u
    (3 base muls, Karatsuba).
    """

    def __init__(self, base: FpLimbs):
        self.k = base

    def add(self, a, b):
        return (self.k.add(a[0], b[0]), self.k.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.k.sub(a[0], b[0]), self.k.sub(a[1], b[1]))

    def neg(self, a):
        return (self.k.neg(a[0]), self.k.neg(a[1]))

    def double(self, a):
        return (self.k.double(a[0]), self.k.double(a[1]))

    def mul(self, a, b):
        k = self.k
        t0 = k.mul(a[0], b[0])
        t1 = k.mul(a[1], b[1])
        s = k.mul(k.add(a[0], a[1]), k.add(b[0], b[1]))
        c0 = k.sub(t0, t1)
        c1 = k.sub(k.sub(s, t0), t1)
        return (c0, c1)

    def sqr(self, a):
        # (a0^2 - a1^2) + 2 a0 a1 u = (a0+a1)(a0-a1) + 2 a0 a1 u
        k = self.k
        t = k.mul(k.add(a[0], a[1]), k.sub(a[0], a[1]))
        c1 = k.double(k.mul(a[0], a[1]))
        return (t, c1)

    def mul_small(self, a, s: int):
        return (self.k.mul_small(a[0], s), self.k.mul_small(a[1], s))

    def select(self, cond, a, b):
        return (select(cond, a[0], b[0]), select(cond, a[1], b[1]))

    def is_zero(self, a):
        return is_zero(a[0]) & is_zero(a[1])

    def zero(self, like):
        return (self.k.zero(like[0]), self.k.zero(like[0]))

    def one(self, like):
        return (self.k.one(like[0]), self.k.zero(like[0]))
