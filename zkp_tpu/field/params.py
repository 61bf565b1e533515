"""Curve and field constants for BLS12-381 and BN254.

The reference pins BLS12-381 (``crates/groth16-field/src/lib.rs:9-17`` uses
``ark_bls12_381::Fr``); BN254 is included per the driver's BASELINE.json
("BN254/BLS12-381 prime-field ... arithmetic").  All derived constants
(Montgomery parameters, NTT roots, Frobenius data) are computed at import
time with python ints -- nothing is hardcoded beyond the published curve
parameters.
"""

from __future__ import annotations

import functools

from .fp import Fp


class CurveParams:
    """Static parameters for a pairing-friendly curve (host-side)."""

    def __init__(self, name, q, r, b_coeff, g1_gen, g2_gen, x_param, fq2_nonresidue,
                 cofactor_g1, cofactor_g2):
        self.name = name
        self.q = q                  # base field modulus
        self.r = r                  # scalar field modulus (subgroup order)
        self.b = b_coeff            # E: y^2 = x^3 + b  over Fq
        self.g1_generator = g1_gen  # (x, y) python ints
        self.g2_generator = g2_gen  # ((x0, x1), (y0, y1)) python ints (Fq2 coords)
        self.x_param = x_param      # BLS/BN parameter (signed)
        self.fq2_nonresidue = fq2_nonresidue  # xi = c0 + c1*u defining Fq6 = Fq2[v]/(v^3 - xi)
        self.cofactor_g1 = cofactor_g1
        self.cofactor_g2 = cofactor_g2

        self.fq = Fp(q, name + ".Fq")
        self.fr = Fp(r, name + ".Fr")

        # scalar-field NTT data: r - 1 = 2^s * t with t odd
        t = r - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.two_adicity = s
        g = self._multiplicative_generator(r)
        self.fr_generator = g
        self.root_of_unity = pow(g, t, r)   # order 2^s

    @staticmethod
    def _multiplicative_generator(p):
        # smallest generator of Fr^*; factor p-1 enough for the small curves' smooth parts
        factors = set()
        n = p - 1
        d = 2
        m = n
        while d * d <= m and d < 1_000_000:
            while m % d == 0:
                factors.add(d)
                m //= d
            d += 1
        if m > 1:
            factors.add(m)
        for g in range(2, 100):
            if all(pow(g, n // f, p) != 1 for f in factors):
                return g
        raise RuntimeError("no generator found")

    def domain_root(self, log_n: int) -> int:
        """Primitive 2^log_n-th root of unity in Fr."""
        if log_n > self.two_adicity:
            raise ValueError(f"domain 2^{log_n} exceeds two-adicity {self.two_adicity}")
        w = self.root_of_unity
        for _ in range(self.two_adicity - log_n):
            w = (w * w) % self.r
        return w


# ----------------------------------------------------------------- BLS12-381

_BLS_Q = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
_BLS_R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
_BLS_X = -0xD201000000010000

_BLS_G1_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
_BLS_G1_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

_BLS_G2_X0 = 0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8
_BLS_G2_X1 = 0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E
_BLS_G2_Y0 = 0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801
_BLS_G2_Y1 = 0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE

_BLS_H1 = 0x396C8C005555E1568C00AAAB0000AAAB
_BLS_H2 = 0x5D543A95414E7F1091D50792876A202CD91DE4547085ABAA68A205B2E5A7DDFA628F1CB4D9E82EF21537E293A6691AE1616EC6E786F0C70CF1C38E31C7238E5


@functools.lru_cache(maxsize=None)
def bls12_381() -> CurveParams:
    return CurveParams(
        name="bls12_381",
        q=_BLS_Q,
        r=_BLS_R,
        b_coeff=4,
        g1_gen=(_BLS_G1_X, _BLS_G1_Y),
        g2_gen=((_BLS_G2_X0, _BLS_G2_X1), (_BLS_G2_Y0, _BLS_G2_Y1)),
        x_param=_BLS_X,
        fq2_nonresidue=(1, 1),  # xi = 1 + u ; Fq2 = Fq[u]/(u^2 + 1)
        cofactor_g1=_BLS_H1,
        cofactor_g2=_BLS_H2,
    )


# -------------------------------------------------------------------- BN254

_BN_X = 4965661367192848881
_BN_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
_BN_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

_BN_G2_X0 = 10857046999023057135944570762232829481370756359578518086990519993285655852781
_BN_G2_X1 = 11559732032986387107991004021392285783925812861821192530917403151452391805634
_BN_G2_Y0 = 8495653923123431417604973247489272438418190587263600148770280649306958101930
_BN_G2_Y1 = 4082367875863433681332203403145435568316851327593401208105741076214120093531


@functools.lru_cache(maxsize=None)
def bn254() -> CurveParams:
    return CurveParams(
        name="bn254",
        q=_BN_Q,
        r=_BN_R,
        b_coeff=3,
        g1_gen=(1, 2),
        g2_gen=((_BN_G2_X0, _BN_G2_X1), (_BN_G2_Y0, _BN_G2_Y1)),
        x_param=_BN_X,
        fq2_nonresidue=(9, 1),  # xi = 9 + u ; Fq2 = Fq[u]/(u^2 + 1)
        cofactor_g1=1,
        cofactor_g2=21888242871839275222246405745257275088844257914179612981679871602714643921549,
    )


# ----------------------------------------------------------------- toy BN65
# A tiny (65-bit q) BN curve for fast tests: same family/machinery as BN254
# (u = 28657; p = 36u^4+36u^3+24u^2+6u+1 and r both prime, p = 3 mod 4,
# v2(r-1) = 10, xi = 2+u a sextic non-residue, M-type twist, G2 cofactor
# p - 1 + t).  Field elements are 5 sixteen-bit limbs instead of 24, so the
# XLA graphs that dominate test compile time shrink ~25x.  Found by
# exhaustive search over the BN parameter; NOT cryptographically secure --
# tests only.

_TOY_X = 28657
_TOY_Q = 0x150F245E1C5D7E947
_TOY_R = 0x150F245E0A026A401


@functools.lru_cache(maxsize=None)
def toy_bn() -> CurveParams:
    return CurveParams(
        name="toy_bn",
        q=_TOY_Q,
        r=_TOY_R,
        b_coeff=10,
        g1_gen=(2, 3546074668005433179),
        g2_gen=((6877641324615910799, 4013842116062004279),
                (17687969620651214333, 16696216940102317850)),
        x_param=_TOY_X,
        fq2_nonresidue=(2, 1),  # xi = 2 + u ; Fq2 = Fq[u]/(u^2 + 1)
        cofactor_g1=1,
        cofactor_g2=24279545382024326797,  # p - 1 + t
    )


# An even smaller (34-bit q, 3 sixteen-bit limbs) BN curve, same recipe as
# toy_bn (u = -143; q = 36u^4+36u^3+24u^2+6u+1 and r = q - 6u^2 both prime,
# q = 3 mod 4, v2(r-1) = 8, xi = 1 + 2u sextic nonresidue, M-type twist
# b' = b*xi, G2 cofactor q - 1 + t).  Exists because the multichip dryrun
# compiles the full sharded prove graph on a 2-vCPU host and XLA:CPU pass
# time scales with the limb-graph size (L=3 vs toy_bn's L=5 roughly halves
# the G2 compile).  Search: scripts/find_toy_curve.py.  NOT secure -- tests.

_TOY3_U = -143
_TOY3_Q = 0x37B083047
_TOY3_R = 0x37B065101


@functools.lru_cache(maxsize=None)
def toy_bn3() -> CurveParams:
    return CurveParams(
        name="toy_bn3",
        q=_TOY3_Q,
        r=_TOY3_R,
        b_coeff=10,
        g1_gen=(2, 6750507323),
        g2_gen=((3951954152, 5972611030), (7732970265, 11864895823)),
        x_param=_TOY3_U,
        fq2_nonresidue=(1, 2),  # xi = 1 + 2u ; Fq2 = Fq[u]/(u^2 + 1)
        cofactor_g1=1,
        cofactor_g2=0x37B0A0F8D,  # q - 1 + t
    )


def get_curve(name: str) -> CurveParams:
    name = name.lower().replace("-", "_")
    if name in ("bls12_381", "bls12381", "bls"):
        return bls12_381()
    if name in ("bn254", "bn_254", "bn"):
        return bn254()
    if name in ("toy_bn", "toybn", "toy"):
        return toy_bn()
    if name in ("toy_bn3", "toybn3", "toy3"):
        return toy_bn3()
    raise ValueError(f"unknown curve {name}")
