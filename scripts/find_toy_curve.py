"""Search for a 3-limb (< 2^47) toy BN curve for fast XLA:CPU compiles.

The multichip dryrun compiles the whole sharded prove graph on a 2-vCPU
host; HLO-pass time scales with the limb-graph size, so a 3-limb field
(vs toy_bn's 5) roughly halves the G2 compile.  Same recipe as toy_bn
(params.py): BN family q = 36u^4+36u^3+24u^2+6u+1, r = q - 6u^2 (t = 6u^2+1),
q = 3 mod 4 (Fq2 = Fq[i]), v2(r-1) >= 6, xi = c0 + c1*i a sextic nonresidue,
twist with #E'(Fq2) = r * (q - 1 + t).
"""
import sys
from sympy import isprime


def v2(x):
    s = 0
    while x % 2 == 0:
        x //= 2
        s += 1
    return s


# ---------------- Fq2 helpers (c0 + c1*i, i^2 = -1)
def f2_mul(a, b, q):
    return ((a[0] * b[0] - a[1] * b[1]) % q, (a[0] * b[1] + a[1] * b[0]) % q)


def f2_pow(a, e, q):
    r = (1, 0)
    while e:
        if e & 1:
            r = f2_mul(r, a, q)
        a = f2_mul(a, a, q)
        e >>= 1
    return r


def f2_inv(a, q):
    d = pow((a[0] * a[0] + a[1] * a[1]) % q, -1, q)
    return (a[0] * d % q, (-a[1]) * d % q)


# ---------------- curve helpers over Fq and Fq2 (affine, None = infinity)
def ec_add(P, Q, add, sub, mul, inv):
    if P is None:
        return Q
    if Q is None:
        return P
    if P[0] == Q[0]:
        if P[1] == Q[1] and P[1] != (0, 0) and P[1] != 0:
            num = mul(mul(P[0], P[0]), 3 if isinstance(P[0], int) else (3, 0))
            den = mul(P[1], 2 if isinstance(P[1], int) else (2, 0))
        else:
            return None
    else:
        num = sub(Q[1], P[1])
        den = sub(Q[0], P[0])
    lam = mul(num, inv(den))
    x3 = sub(sub(mul(lam, lam), P[0]), Q[0])
    y3 = sub(mul(lam, sub(P[0], x3)), P[1])
    return (x3, y3)


def ec_mul(k, P, add_, sub_, mul_, inv_):
    R = None
    while k:
        if k & 1:
            R = ec_add(R, P, add_, sub_, mul_, inv_)
        P = ec_add(P, P, add_, sub_, mul_, inv_)
        k >>= 1
    return R


def search():
    found = None
    cands = []
    for au in range(30, 1404):
        for u in (au, -au):
            q = 36 * u**4 + 36 * u**3 + 24 * u**2 + 6 * u + 1
            if not (1 << 25) < q < (1 << 47) or q % 4 != 3:
                continue
            t = 6 * u**2 + 1
            r = q + 1 - t
            if v2(r - 1) < 6:
                continue
            if not (isprime(q) and isprime(r)):
                continue
            L = 2 if 2 * q < (1 << 32) else 3
            cands.append((u, q, r, t, v2(r - 1), L))
    print(f"{len(cands)} prime pairs found")
    for u, q, r, t, ad, L in sorted(cands, key=lambda c: (c[5], -c[4]))[:10]:
        print(f"u={u} q={q:#x} ({q.bit_length()}b, L={L}) r={r:#x} two_adicity={ad}")

    u, q, r, t, ad, L = min(cands, key=lambda c: (c[5], -c[4]))

    i_add = lambda a, b: (a + b) % q
    i_sub = lambda a, b: (a - b) % q
    i_mul = lambda a, b: (a * b) % q
    i_inv = lambda a: pow(a, -1, q)

    # find b with #E(Fq) = r (cofactor 1): pick x, solve y^2 = x^3 + b
    def find_b():
        for b in range(1, 200):
            # find a point
            for x in range(1, 200):
                rhs = (x**3 + b) % q
                y = pow(rhs, (q + 1) // 4, q)  # q = 3 mod 4 sqrt
                if y * y % q != rhs:
                    continue
                P = (x, y)
                if ec_mul(r, P, i_add, i_sub, i_mul, i_inv) is None:
                    # confirm order exactly r (r prime: P != O suffices)
                    return b, P
                break  # wrong order for this b: curve is the twist
        raise RuntimeError("no b found")

    b, G1 = find_b()
    print(f"b = {b}, G1 = {G1}")

    # sextic nonresidue xi in Fq2: xi^((q^2-1)/2) != 1 and xi^((q^2-1)/3) != 1
    q2 = q * q
    xi = None
    for c0 in range(1, 12):
        for c1 in range(1, 12):
            cand = (c0, c1)
            if f2_pow(cand, (q2 - 1) // 2, q) == (1, 0):
                continue
            if (q2 - 1) % 3 == 0 and f2_pow(cand, (q2 - 1) // 3, q) == (1, 0):
                continue
            xi = cand
            break
        if xi:
            break
    print(f"xi = {xi}")

    f_add = lambda a, b: ((a[0] + b[0]) % q, (a[1] + b[1]) % q)
    f_sub = lambda a, b: ((a[0] - b[0]) % q, (a[1] - b[1]) % q)
    f_mul = lambda a, b: f2_mul(a, b, q)
    f_inv = lambda a: f2_inv(a, q)

    # twist: M-type y^2 = x^3 + b*xi with target order r * (q - 1 + t)
    cof = q - 1 + t
    n_target = r * cof
    for btw_name, btw in (("b*xi", f2_mul((b, 0), xi, q)),
                          ("b/xi", f2_mul((b, 0), f2_inv(xi, q), q))):
        # find a point on it
        P2 = None
        for x0 in range(1, 60):
            for x1 in range(0, 60):
                x = (x0, x1)
                rhs = f_add(f_mul(f_mul(x, x), x), btw)
                # sqrt in Fq2 via exponent (q^2+7)/8 method won't always work;
                # use the norm trick: a is a QR iff norm(a)^((q-1)/2) == 1
                nrm = (rhs[0] * rhs[0] + rhs[1] * rhs[1]) % q
                if pow(nrm, (q - 1) // 2, q) != 1:
                    continue
                # Tonelli in Fq2 via generic pow when q^2 = 3 mod 4? q^2 = 1 mod 4 always.
                # use algorithm: s = rhs^((q-1)/2)... simpler: find y by complex sqrt:
                # y = sqrt((a0 + sqrt(a0^2+a1^2))/2) + i*a1/(2*that)
                alpha = pow(nrm, (q + 1) // 4, q)
                for al in (alpha, (-alpha) % q):
                    h = (rhs[0] + al) * pow(2, -1, q) % q
                    if pow(h, (q - 1) // 2, q) != 1:
                        continue
                    y0 = pow(h, (q + 1) // 4, q)
                    if y0 * y0 % q != h:
                        continue
                    if rhs[1] == 0:
                        y = (y0, 0) if (y0 * y0 % q == rhs[0]) else None
                        if y is None:
                            y1 = pow((rhs[0] * pow(-1, -1, q)) % q, (q + 1) // 4, q)
                            y = (0, y1)
                    else:
                        y1 = rhs[1] * pow(2 * y0 % q, -1, q) % q
                        y = (y0, y1)
                    if f_mul(y, y) == rhs:
                        P2 = (x, y)
                        break
                if P2:
                    break
            if P2:
                break
        if P2 is None:
            continue
        # order check: n_target * P2 == O?
        if ec_mul(n_target, P2, f_add, f_sub, f_mul, f_inv) is None:
            G2 = ec_mul(cof, P2, f_add, f_sub, f_mul, f_inv)
            if G2 is not None and ec_mul(r, G2, f_add, f_sub, f_mul, f_inv) is None:
                print(f"twist type {btw_name}: b' = {btw}")
                print(f"G2 = {G2}")
                found = dict(u=u, q=q, r=r, b=b, g1=G1, g2=G2, xi=xi,
                             cof_g2=cof, twist=btw_name)
                break
    if not found:
        raise RuntimeError("no valid twist/generator found")
    print("\nRESULT:")
    for k, v in found.items():
        print(f"  {k} = {v!r}" if not isinstance(v, int) else f"  {k} = {v:#x}" if v > 1000 else f"  {k} = {v}")
    return found


if __name__ == "__main__":
    search()
