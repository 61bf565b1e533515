"""Per-curve instantiation: G1/G2 groups, towers, generators, twist data.

Binds the generic Weierstrass kernels to a CurveParams (BLS12-381 / BN254),
detecting the G2 twist type from the published generator the same way the
arithmetic oracle does (zkp_tpu.ref.pyref.CurveRef).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..field.fp import Fp
from ..field.params import CurveParams, get_curve
from ..field.tower import make_tower
from .weierstrass import Weierstrass


class CurveOps:
    def __init__(self, params: CurveParams):
        self.params = params
        self.fq = params.fq
        self.fr = params.fr
        self.f2, self.f6, self.f12 = make_tower(self.fq, params.fq2_nonresidue)

        q = params.q
        xi0, xi1 = params.fq2_nonresidue

        # twist type: E' : y^2 = x^3 + b' with b' = b*xi (M) or b/xi (D)
        def fq2_mul(a, b):
            return ((a[0] * b[0] - a[1] * b[1]) % q, (a[0] * b[1] + a[1] * b[0]) % q)

        def fq2_inv(a):
            n = pow((a[0] * a[0] + a[1] * a[1]) % q, -1, q)
            return (a[0] * n % q, (-a[1]) * n % q)

        xi = (xi0 % q, xi1 % q)
        b_m = fq2_mul(xi, (params.b % q, 0))
        b_d = fq2_mul(fq2_inv(xi), (params.b % q, 0))
        (gx, gy) = params.g2_generator

        def on_twist(bb):
            y2 = fq2_mul(gy, gy)
            x3 = fq2_mul(fq2_mul(gx, gx), gx)
            return y2 == ((x3[0] + bb[0]) % q, (x3[1] + bb[1]) % q)

        if on_twist(b_m):
            self.twist_is_m = True
            self.b2_int = b_m
        elif on_twist(b_d):
            self.twist_is_m = False
            self.b2_int = b_d
        else:
            raise ValueError("G2 generator on neither twist")

        b1 = self.fq.const(params.b)
        b2 = self.fq.encode(list(self.b2_int))  # (2, L) = one Fq2 element
        self.g1 = Weierstrass(self.fq, b1, params.name + ".G1")
        self.g2 = Weierstrass(self.f2, b2, params.name + ".G2")

        # generators as affine device arrays
        g1x, g1y = params.g1_generator
        self.g1_gen_affine = (self.fq.const(g1x), self.fq.const(g1y))
        self.g2_gen_affine = (self.fq.encode(list(gx)), self.fq.encode(list(gy)))

    def g1_generator(self):
        x, y = self.g1_gen_affine
        return self.g1.from_affine(x, y)

    def g2_generator(self):
        x, y = self.g2_gen_affine
        return self.g2.from_affine(x, y)

    def encode_scalars(self, ints):
        """Host ints -> (N, L) standard-form limb scalars for scalar_mul/MSM."""
        return self.fr.encode([int(v) % self.fr.p for v in ints], mont=False)

    def g1_fixed_base(self):
        """Cached window table over the G1 generator (setup fast path)."""
        if not hasattr(self, "_g1_table"):
            from .fixed_base import FixedBaseTable
            self._g1_table = FixedBaseTable(self.g1, self.g1_gen_affine,
                                            c=8, nbits=16 * self.fr.n)
        return self._g1_table

    def g2_fixed_base(self):
        if not hasattr(self, "_g2_table"):
            from .fixed_base import FixedBaseTable
            self._g2_table = FixedBaseTable(self.g2, self.g2_gen_affine,
                                            c=8, nbits=16 * self.fr.n)
        return self._g2_table


@functools.lru_cache(maxsize=4)
def curve_ops(name: str) -> CurveOps:
    return CurveOps(get_curve(name))
