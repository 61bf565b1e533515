"""Pure-python (arbitrary-precision int) reference implementation.

This is the bit-exactness oracle for the TPU framework: field arithmetic,
Fq2/Fq6/Fq12 towers, affine curve arithmetic, the optimal-ate pairing and the
radix-2 NTT, all over python ints.  It mirrors the *mathematical semantics*
of the Rust reference's arkworks dependencies (ark-ff / ark-ec / ark-poly,
see SURVEY.md section 2.2) without sharing any code with it.

It is deliberately slow and simple; tests compare the JAX limb kernels
against it element-by-element.
"""

from __future__ import annotations

from ..field.params import CurveParams


# ------------------------------------------------------------------ Fq tower


class Fq2:
    """a0 + a1*u with u^2 = -1 over Fq."""

    __slots__ = ("q", "c0", "c1")

    def __init__(self, q, c0, c1):
        self.q = q
        self.c0 = c0 % q
        self.c1 = c1 % q

    def _new(self, c0, c1):
        return Fq2(self.q, c0, c1)

    def __add__(self, o):
        return self._new(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return self._new(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return self._new(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, int):
            return self._new(self.c0 * o, self.c1 * o)
        a, b, c, d = self.c0, self.c1, o.c0, o.c1
        return self._new(a * c - b * d, a * d + b * c)

    __rmul__ = __mul__

    def conj(self):
        return self._new(self.c0, -self.c1)

    def inv(self):
        norm = (self.c0 * self.c0 + self.c1 * self.c1) % self.q
        ninv = pow(norm, -1, self.q)
        return self._new(self.c0 * ninv, -self.c1 * ninv)

    def is_zero(self):
        return self.c0 == 0 and self.c1 == 0

    def __eq__(self, o):
        return self.q == o.q and self.c0 == o.c0 and self.c1 == o.c1

    def __repr__(self):
        return f"Fq2({hex(self.c0)}, {hex(self.c1)})"

    @staticmethod
    def zero(q):
        return Fq2(q, 0, 0)

    @staticmethod
    def one(q):
        return Fq2(q, 1, 0)


class Fq6:
    """a0 + a1*v + a2*v^2 with v^3 = xi over Fq2."""

    __slots__ = ("xi", "c0", "c1", "c2")

    def __init__(self, xi, c0, c1, c2):
        self.xi = xi
        self.c0, self.c1, self.c2 = c0, c1, c2

    def _new(self, c0, c1, c2):
        return Fq6(self.xi, c0, c1, c2)

    def __add__(self, o):
        return self._new(self.c0 + o.c0, self.c1 + o.c1, self.c2 + o.c2)

    def __sub__(self, o):
        return self._new(self.c0 - o.c0, self.c1 - o.c1, self.c2 - o.c2)

    def __neg__(self):
        return self._new(-self.c0, -self.c1, -self.c2)

    def __mul__(self, o):
        a0, a1, a2 = self.c0, self.c1, self.c2
        b0, b1, b2 = o.c0, o.c1, o.c2
        xi = self.xi
        t0 = a0 * b0
        t1 = a0 * b1 + a1 * b0
        t2 = a0 * b2 + a1 * b1 + a2 * b0
        t3 = a1 * b2 + a2 * b1
        t4 = a2 * b2
        return self._new(t0 + t3 * xi, t1 + t4 * xi, t2)

    def mul_by_v(self):
        return self._new(self.c2 * self.xi, self.c0, self.c1)

    def inv(self):
        # standard tower inversion over Fq2
        a, b, c = self.c0, self.c1, self.c2
        xi = self.xi
        t0 = a * a - (b * c) * xi
        t1 = (c * c) * xi - a * b
        t2 = b * b - a * c
        denom = a * t0 + (c * t1) * xi + (b * t2) * xi
        dinv = denom.inv()
        return self._new(t0 * dinv, t1 * dinv, t2 * dinv)

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero() and self.c2.is_zero()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1 and self.c2 == o.c2

    @staticmethod
    def zero(q, xi):
        return Fq6(xi, Fq2.zero(q), Fq2.zero(q), Fq2.zero(q))

    @staticmethod
    def one(q, xi):
        return Fq6(xi, Fq2.one(q), Fq2.zero(q), Fq2.zero(q))


class Fq12:
    """a0 + a1*w with w^2 = v over Fq6."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0, c1):
        self.c0, self.c1 = c0, c1

    def _new(self, c0, c1):
        return Fq12(c0, c1)

    def __add__(self, o):
        return self._new(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return self._new(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return self._new(-self.c0, -self.c1)

    def __mul__(self, o):
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        t0 = a0 * b0
        t1 = a0 * b1 + a1 * b0
        return self._new(t0 + (a1 * b1).mul_by_v(), t1)

    def conj(self):
        return self._new(self.c0, -self.c1)

    def inv(self):
        d = self.c0 * self.c0 - (self.c1 * self.c1).mul_by_v()
        dinv = d.inv()
        return self._new(self.c0 * dinv, -(self.c1 * dinv))

    def pow(self, e: int):
        if e < 0:
            return self.inv().pow(-e)
        q = self.c0.c0.q
        xi = self.c0.xi
        acc = Fq12.one(q, xi)
        base = self
        while e:
            if e & 1:
                acc = acc * base
            base = base * base
            e >>= 1
        return acc

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    @staticmethod
    def zero(q, xi):
        return Fq12(Fq6.zero(q, xi), Fq6.zero(q, xi))

    @staticmethod
    def one(q, xi):
        return Fq12(Fq6.one(q, xi), Fq6.zero(q, xi))

    @staticmethod
    def w(q, xi):
        z6 = Fq6.zero(q, xi)
        return Fq12(z6, Fq6.one(q, xi))


def fq12_from_fq(q, xi, a: int) -> Fq12:
    f = Fq12.zero(q, xi)
    return Fq12(Fq6(xi, Fq2(q, a, 0), Fq2.zero(q), Fq2.zero(q)), f.c1)


def fq12_from_fq2(q, xi, a: Fq2) -> Fq12:
    z = Fq12.zero(q, xi)
    return Fq12(Fq6(xi, a, Fq2.zero(q), Fq2.zero(q)), z.c1)


# ------------------------------------------------------------ affine curves


class CurveRef:
    """Reference affine curve + pairing over a CurveParams."""

    def __init__(self, params: CurveParams):
        self.p = params
        self.q = params.q
        self.r = params.r
        c0, c1 = params.fq2_nonresidue
        self.xi = Fq2(self.q, c0, c1)
        self.g1 = params.g1_generator  # (x, y) or None for infinity
        (x0, x1), (y0, y1) = params.g2_generator
        self.g2 = (Fq2(self.q, x0, x1), Fq2(self.q, y0, y1))
        # twist of E': y^2 = x^3 + b*xi (M-type for our curves' generators)
        self.b = params.b
        self.b2 = self.xi * params.b
        if not self.g2_on_curve(self.g2):
            # D-type twist: y^2 = x^3 + b/xi
            self.b2 = self.xi.inv() * params.b
            assert self.g2_on_curve(self.g2), "G2 generator not on either twist"

    # ---- G1 (affine points = (x, y) ints, None = infinity)

    def g1_on_curve(self, pt):
        if pt is None:
            return True
        x, y = pt
        return (y * y - (x * x * x + self.b)) % self.q == 0

    def g1_add(self, a, b):
        if a is None:
            return b
        if b is None:
            return a
        x1, y1 = a
        x2, y2 = b
        q = self.q
        if x1 == x2:
            if (y1 + y2) % q == 0:
                return None
            lam = (3 * x1 * x1) * pow(2 * y1, -1, q) % q
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, q) % q
        x3 = (lam * lam - x1 - x2) % q
        y3 = (lam * (x1 - x3) - y1) % q
        return (x3, y3)

    def g1_neg(self, a):
        if a is None:
            return None
        return (a[0], (-a[1]) % self.q)

    def g1_mul(self, k: int, pt):
        k %= self.r
        acc = None
        add = pt
        while k:
            if k & 1:
                acc = self.g1_add(acc, add)
            add = self.g1_add(add, add)
            k >>= 1
        return acc

    # ---- G2 (affine points = (Fq2, Fq2), None = infinity)

    def g2_on_curve(self, pt):
        if pt is None:
            return True
        x, y = pt
        return (y * y - (x * x * x + self.b2)).is_zero()

    def g2_add(self, a, b):
        if a is None:
            return b
        if b is None:
            return a
        x1, y1 = a
        x2, y2 = b
        if x1 == x2:
            if (y1 + y2).is_zero():
                return None
            lam = (3 * (x1 * x1)) * (2 * y1).inv()
        else:
            lam = (y2 - y1) * (x2 - x1).inv()
        x3 = lam * lam - x1 - x2
        y3 = lam * (x1 - x3) - y1
        return (x3, y3)

    def g2_neg(self, a):
        if a is None:
            return None
        return (a[0], -a[1])

    def g2_mul(self, k: int, pt):
        k %= self.r
        acc = None
        add = pt
        while k:
            if k & 1:
                acc = self.g2_add(acc, add)
            add = self.g2_add(add, add)
            k >>= 1
        return acc

    # ---- pairing (optimal ate, computed in full Fq12 via untwist)

    def untwist(self, pt):
        """E'(Fq2) -> E(Fq12): (x, y) -> (x * w^-2, y * w^-3) for M-twist
        with w^6 = xi; for D-twist (x * w^2, y * w^3)."""
        q, xi = self.q, self.xi
        x, y = pt
        w = Fq12.w(q, xi)
        if self.b2 == self.xi * self.b:      # M-twist
            w2i = (w * w).inv()
            w3i = (w * w * w).inv()
            return (fq12_from_fq2(q, xi, x) * w2i, fq12_from_fq2(q, xi, y) * w3i)
        else:                                 # D-twist
            return (fq12_from_fq2(q, xi, x) * (w * w), fq12_from_fq2(q, xi, y) * (w * w * w))

    def miller_loop(self, p1, p2) -> Fq12:
        """Miller loop f_{|m|,Q}(P) in full Fq12 arithmetic (slow, simple).

        p1: G1 affine (ints); p2: G2 affine (Fq2).  For BLS curves m = x;
        for BN curves m = 6x+2 with the two extra Frobenius line steps.
        """
        q, xi = self.q, self.xi
        xp = fq12_from_fq(q, xi, p1[0])
        yp = fq12_from_fq(q, xi, p1[1])
        Q = self.untwist(p2)

        bls = self.p.name.startswith("bls")
        m = self.p.x_param if bls else 6 * self.p.x_param + 2
        neg = m < 0
        m = abs(m)

        f = Fq12.one(q, xi)
        T = Q

        def line_eval(A, B):
            """slope line through A (and B or tangent) evaluated at P."""
            x1, y1 = A
            if B is None:  # tangent
                lam = (fq12_from_fq(q, xi, 3) * x1 * x1) * (fq12_from_fq(q, xi, 2) * y1).inv()
            else:
                x2, y2 = B
                if x1 == x2 and y1 == y2:
                    lam = (fq12_from_fq(q, xi, 3) * x1 * x1) * (fq12_from_fq(q, xi, 2) * y1).inv()
                elif x1 == x2:
                    # vertical line x - x1 evaluated at P
                    return xp - x1, None
                else:
                    lam = (y2 - y1) * (x2 - x1).inv()
            l = (yp - y1) - lam * (xp - x1)
            return l, lam

        def pt_add(A, B):
            if A is None:
                return B
            if B is None:
                return A
            x1, y1 = A
            x2, y2 = B
            if x1 == x2:
                if (y1 + y2).is_zero():
                    return None
                lam = (fq12_from_fq(q, xi, 3) * x1 * x1) * (fq12_from_fq(q, xi, 2) * y1).inv()
            else:
                lam = (y2 - y1) * (x2 - x1).inv()
            x3 = lam * lam - x1 - x2
            y3 = lam * (x1 - x3) - y1
            return (x3, y3)

        for bit in bin(m)[3:]:  # skip MSB
            l, _ = line_eval(T, None)
            f = f * f * l
            T = pt_add(T, T)
            if bit == "1":
                l, _ = line_eval(T, Q)
                f = f * l
                T = pt_add(T, Q)
        if neg:
            f = f.conj()
            # T = -[m]Q; keep consistent for BN extra steps
            T = (T[0], -T[1]) if T is not None else None
        if not bls:
            # BN254 extra steps: lines through frobenius images of Q
            piQ = self._frob_g2(p2, 1)
            pi2Q = self._frob_g2(p2, 2)
            Q1 = self.untwist(piQ)
            Q2 = self.untwist(self.g2_neg(pi2Q))
            l, _ = line_eval(T, Q1)
            f = f * l
            T = pt_add(T, Q1)
            l, _ = line_eval(T, Q2)
            f = f * l
        return f

    def _frob_g2(self, pt, power) -> tuple:
        """Frobenius endomorphism on E'(Fq2) (via untwist-frob-twist constants)."""
        x, y = pt
        gx, gy = self._gamma12()
        for _ in range(power):
            x = x.conj() * gx
            y = y.conj() * gy
        return (x, y)

    def _gamma12(self):
        """(xi^((q-1)/3), xi^((q-1)/2)) used by G2 Frobenius (cached)."""
        if not hasattr(self, "_g12"):
            e3 = (self.q - 1) // 3
            e2 = (self.q - 1) // 2
            if self.b2 == self.xi * self.b:   # M-twist: x' = conj(x) * xi^((q-1)/3) ... adjust sign
                gx = _fq2_pow(self.xi, e3)
                gy = _fq2_pow(self.xi, e2)
                gx = gx.inv()
                gy = gy.inv()
            else:
                gx = _fq2_pow(self.xi, e3)
                gy = _fq2_pow(self.xi, e2)
            self._g12 = (gx, gy)
        return self._g12

    def final_exponentiation(self, f: Fq12) -> Fq12:
        e = (self.q ** 12 - 1) // self.r
        return f.pow(e)

    def pairing(self, p1, p2) -> Fq12:
        if p1 is None or p2 is None:
            return Fq12.one(self.q, self.xi)
        return self.final_exponentiation(self.miller_loop(p1, p2))

    def multi_pairing(self, g1s, g2s) -> Fq12:
        f = Fq12.one(self.q, self.xi)
        for a, b in zip(g1s, g2s):
            if a is None or b is None:
                continue
            f = f * self.miller_loop(a, b)
        return self.final_exponentiation(f)


def _fq2_pow(a: Fq2, e: int) -> Fq2:
    acc = Fq2.one(a.q)
    base = a
    while e:
        if e & 1:
            acc = acc * base
        base = base * base
        e >>= 1
    return acc


# ------------------------------------------------------------------ NTT ref


def ntt_ref(vals, omega: int, p: int):
    """O(n log n) recursive radix-2 NTT over ints (test oracle)."""
    n = len(vals)
    if n == 1:
        return list(vals)
    even = ntt_ref(vals[0::2], omega * omega % p, p)
    odd = ntt_ref(vals[1::2], omega * omega % p, p)
    out = [0] * n
    w = 1
    for k in range(n // 2):
        t = w * odd[k] % p
        out[k] = (even[k] + t) % p
        out[k + n // 2] = (even[k] - t) % p
        w = w * omega % p
    return out


def intt_ref(vals, omega: int, p: int):
    n = len(vals)
    winv = pow(omega, -1, p)
    out = ntt_ref(vals, winv, p)
    ninv = pow(n, -1, p)
    return [v * ninv % p for v in out]
