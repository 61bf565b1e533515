"""Compressed point serialization (host-side python ints).

Two wire formats:
  - "arkworks" (default): little-endian field bytes, flags in the top bits of
    the LAST byte (infinity = 0x40, y-largest = 0x80), matching
    ark-serialize's CanonicalSerialize for short Weierstrass points -- the
    format the reference derives on Proof (crates/groth16-core/src/lib.rs:28)
    and keys (groth16-setup/src/lib.rs:17).
  - "zcash": big-endian with flags in the top bits of the FIRST byte
    (0x80 compressed | 0x40 infinity | 0x20 y-largest), G2 as c1 || c0.

Points are affine python tuples: G1 (x, y) or None; G2 ((x0,x1),(y0,y1)) or
None.  Decompression solves y^2 = x^3 + b with sqrt via (q+1)/4 (both
supported curves have q = 3 mod 4) and the complex method over Fq2.
"""

from __future__ import annotations

from ..field.params import CurveParams, bls12_381


class SerializationError(Exception):
    pass


def _nbytes(q: int) -> int:
    return (q.bit_length() + 7) // 8


def _sqrt_fq(a: int, q: int):
    if a == 0:
        return 0
    assert q % 4 == 3, "sqrt path assumes q = 3 mod 4"
    y = pow(a, (q + 1) // 4, q)
    return y if (y * y) % q == a % q else None


def _sqrt_fq2(c, q: int):
    """sqrt of c = (a, b) in Fq[u]/(u^2+1) via the complex method."""
    a, b = c[0] % q, c[1] % q
    if b == 0:
        r = _sqrt_fq(a, q)
        if r is not None:
            return (r, 0)
        r = _sqrt_fq((-a) % q, q)
        if r is None:
            return None
        return (0, r)
    alpha = (a * a + b * b) % q
    n = _sqrt_fq(alpha, q)
    if n is None:
        return None
    inv2 = pow(2, -1, q)
    delta = (a + n) * inv2 % q
    x0 = _sqrt_fq(delta, q)
    if x0 is None:
        delta = (a - n) * inv2 % q
        x0 = _sqrt_fq(delta, q)
        if x0 is None:
            return None
    x1 = b * pow(2 * x0, -1, q) % q
    return (x0, x1)


# --------------------------------------------------- subgroup membership
#
# arkworks validates r-torsion on every CanonicalDeserialize (the reference
# gets this for free on Proof, crates/groth16-core/src/lib.rs:28-36); an
# on-curve point in the cofactor subgroup must be REJECTED or the verifier
# processes adversarial proof points.  Checked the direct way: [r]P == O
# (affine double-and-add on host ints -- deserialization handles O(1)
# points, so the ~1.5 log2(r) modinvs per point are irrelevant; the fast
# endomorphism checks are a device-path optimization we don't need here).


def _affine_add(a, b, q, add, sub, mul, inv, neg, is_zero):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if is_zero(add(y1, y2)):
            return None
        lam = mul(mul(mul(x1, x1), 3), inv(mul(y1, 2)))
    else:
        lam = mul(sub(y2, y1), inv(sub(x2, x1)))
    x3 = sub(sub(mul(lam, lam), x1), x2)
    y3 = sub(mul(lam, sub(x1, x3)), y1)
    return (x3, y3)


def _mul_raw(k: int, pt, q, ops):
    """Double-and-add with an UNREDUCED scalar (pyref's g1_mul reduces mod r,
    which would make [r]P trivially None)."""
    acc, add_pt = None, pt
    while k:
        if k & 1:
            acc = _affine_add(acc, add_pt, q, *ops)
        add_pt = _affine_add(add_pt, add_pt, q, *ops)
        k >>= 1
    return acc


def _fq_ops(q):
    return (lambda a, b: (a + b) % q,
            lambda a, b: (a - b) % q,
            lambda a, b: (a * b) % q,
            lambda a: pow(a, -1, q),
            lambda a: (-a) % q,
            lambda a: a % q == 0)


def _fq2_ops(q):
    def mul(a, b):
        if isinstance(b, int):
            return (a[0] * b % q, a[1] * b % q)
        return ((a[0] * b[0] - a[1] * b[1]) % q,
                (a[0] * b[1] + a[1] * b[0]) % q)

    def inv(a):
        n = pow((a[0] * a[0] + a[1] * a[1]) % q, -1, q)
        return (a[0] * n % q, (-a[1]) * n % q)

    return (lambda a, b: ((a[0] + b[0]) % q, (a[1] + b[1]) % q),
            lambda a, b: ((a[0] - b[0]) % q, (a[1] - b[1]) % q),
            mul,
            inv,
            lambda a: ((-a[0]) % q, (-a[1]) % q),
            lambda a: a[0] % q == 0 and a[1] % q == 0)


def g1_in_subgroup(pt, params: CurveParams | None = None) -> bool:
    """True iff pt (affine ints or None) is in the order-r subgroup."""
    params = params or bls12_381()
    if pt is None:
        return True
    return _mul_raw(params.r, pt, params.q, _fq_ops(params.q)) is None


def g2_in_subgroup(pt, params: CurveParams | None = None) -> bool:
    params = params or bls12_381()
    if pt is None:
        return True
    return _mul_raw(params.r, pt, params.q, _fq2_ops(params.q)) is None


def _check_g1_subgroup(pt, params):
    if not g1_in_subgroup(pt, params):
        raise SerializationError("point not in the order-r subgroup")
    return pt


def _check_g2_subgroup(pt, params):
    if not g2_in_subgroup(pt, params):
        raise SerializationError("point not in the order-r subgroup")
    return pt


def _y_is_largest_fq(y: int, q: int) -> bool:
    return y > q - y  # equivalently y > (q-1)/2 for y != 0


def _y_is_largest_fq2(y, q: int) -> bool:
    """Lexicographic with c1 taking priority (arkworks/zcash convention)."""
    y0, y1 = y[0] % q, y[1] % q
    ny0, ny1 = (-y0) % q, (-y1) % q
    return (y1, y0) > (ny1, ny0)


# --------------------------------------------------------------- arkworks


def g1_compress(pt, params: CurveParams | None = None) -> bytes:
    params = params or bls12_381()
    q = params.q
    nb = _nbytes(q)
    if pt is None:
        out = bytearray(nb)
        out[-1] |= 0x40
        return bytes(out)
    x, y = pt[0] % q, pt[1] % q
    out = bytearray(x.to_bytes(nb, "little"))
    if _y_is_largest_fq(y, q):
        out[-1] |= 0x80
    return bytes(out)


def g1_decompress(data: bytes, params: CurveParams | None = None,
                  check_subgroup: bool = True):
    params = params or bls12_381()
    q = params.q
    nb = _nbytes(q)
    if len(data) != nb:
        raise SerializationError(f"expected {nb} bytes, got {len(data)}")
    raw = bytearray(data)
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    x = int.from_bytes(bytes(raw), "little")
    if flags & 0x40:
        return None
    if x >= q:
        raise SerializationError("x out of range")
    rhs = (pow(x, 3, q) + params.b) % q
    y = _sqrt_fq(rhs, q)
    if y is None:
        raise SerializationError("x not on curve")
    if bool(flags & 0x80) != _y_is_largest_fq(y, q):
        y = (-y) % q
    return _check_g1_subgroup((x, y), params) if check_subgroup else (x, y)


def g2_compress(pt, params: CurveParams | None = None) -> bytes:
    params = params or bls12_381()
    q = params.q
    nb = _nbytes(q)
    if pt is None:
        out = bytearray(2 * nb)
        out[-1] |= 0x40
        return bytes(out)
    (x0, x1), y = (pt[0][0] % q, pt[0][1] % q), pt[1]
    out = bytearray(x0.to_bytes(nb, "little") + x1.to_bytes(nb, "little"))
    if _y_is_largest_fq2(y, q):
        out[-1] |= 0x80
    return bytes(out)


def _g2_rhs(x, params):
    """x^3 + b' on the twist (b' recomputed like curves.CurveOps)."""
    from .curves import curve_ops
    ops = curve_ops(params.name)
    q = params.q

    def m(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % q, (a[0] * b[1] + a[1] * b[0]) % q)

    x3 = m(m(x, x), x)
    b2 = ops.b2_int
    return ((x3[0] + b2[0]) % q, (x3[1] + b2[1]) % q)


def g2_decompress(data: bytes, params: CurveParams | None = None,
                  check_subgroup: bool = True):
    params = params or bls12_381()
    q = params.q
    nb = _nbytes(q)
    if len(data) != 2 * nb:
        raise SerializationError(f"expected {2*nb} bytes, got {len(data)}")
    raw = bytearray(data)
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    x0 = int.from_bytes(bytes(raw[:nb]), "little")
    x1 = int.from_bytes(bytes(raw[nb:]), "little")
    if flags & 0x40:
        return None
    if x0 >= q or x1 >= q:
        raise SerializationError("x out of range")
    y = _sqrt_fq2(_g2_rhs((x0, x1), params), q)
    if y is None:
        raise SerializationError("x not on twist")
    if bool(flags & 0x80) != _y_is_largest_fq2(y, q):
        y = ((-y[0]) % q, (-y[1]) % q)
    pt = ((x0, x1), y)
    return _check_g2_subgroup(pt, params) if check_subgroup else pt


# ------------------------------------------------------------------ zcash


def g1_compress_zcash(pt, params: CurveParams | None = None) -> bytes:
    params = params or bls12_381()
    q = params.q
    nb = _nbytes(q)
    if pt is None:
        out = bytearray(nb)
        out[0] |= 0xC0
        return bytes(out)
    x, y = pt[0] % q, pt[1] % q
    out = bytearray(x.to_bytes(nb, "big"))
    out[0] |= 0x80
    if _y_is_largest_fq(y, q):
        out[0] |= 0x20
    return bytes(out)


def g1_decompress_zcash(data: bytes, params: CurveParams | None = None,
                        check_subgroup: bool = True):
    params = params or bls12_381()
    q = params.q
    nb = _nbytes(q)
    if len(data) != nb:
        raise SerializationError(f"expected {nb} bytes")
    raw = bytearray(data)
    flags = raw[0] & 0xE0
    if not flags & 0x80:
        raise SerializationError("uncompressed zcash points unsupported")
    raw[0] &= 0x1F
    x = int.from_bytes(bytes(raw), "big")
    if flags & 0x40:
        return None
    rhs = (pow(x, 3, q) + params.b) % q
    y = _sqrt_fq(rhs, q)
    if y is None:
        raise SerializationError("x not on curve")
    if bool(flags & 0x20) != _y_is_largest_fq(y, q):
        y = (-y) % q
    return _check_g1_subgroup((x, y), params) if check_subgroup else (x, y)


def g2_compress_zcash(pt, params: CurveParams | None = None) -> bytes:
    params = params or bls12_381()
    q = params.q
    nb = _nbytes(q)
    if pt is None:
        out = bytearray(2 * nb)
        out[0] |= 0xC0
        return bytes(out)
    (x0, x1), y = (pt[0][0] % q, pt[0][1] % q), pt[1]
    out = bytearray(x1.to_bytes(nb, "big") + x0.to_bytes(nb, "big"))
    out[0] |= 0x80
    if _y_is_largest_fq2(y, q):
        out[0] |= 0x20
    return bytes(out)


def g2_decompress_zcash(data: bytes, params: CurveParams | None = None,
                        check_subgroup: bool = True):
    params = params or bls12_381()
    q = params.q
    nb = _nbytes(q)
    if len(data) != 2 * nb:
        raise SerializationError(f"expected {2*nb} bytes")
    raw = bytearray(data)
    flags = raw[0] & 0xE0
    raw[0] &= 0x1F
    x1 = int.from_bytes(bytes(raw[:nb]), "big")
    x0 = int.from_bytes(bytes(raw[nb:]), "big")
    if flags & 0x40:
        return None
    y = _sqrt_fq2(_g2_rhs((x0, x1), params), q)
    if y is None:
        raise SerializationError("x not on twist")
    if bool(flags & 0x20) != _y_is_largest_fq2(y, q):
        y = ((-y[0]) % q, (-y[1]) % q)
    pt = ((x0, x1), y)
    return _check_g2_subgroup(pt, params) if check_subgroup else pt
