"""Limb-list field core (zkp_tpu.field.limbs) vs python-int ground truth.

These are the building blocks of every Pallas kernel (curve/pkernels.py,
field/kfield.py); here they run as plain jnp on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkp_tpu.field.limbs import FpLimbs, Fp2Limbs, LIMB_BITS
from zkp_tpu.field.params import get_curve

N = 64


def _enc(fl, vals):
    vs = [(v * fl.R) % fl.p for v in vals]
    return [jnp.asarray(np.array([(v >> (LIMB_BITS * i)) & 0xFFFF for v in vs],
                                 np.uint32)) for i in range(fl.L)]


def _dec(fl, limbs):
    cols = [np.asarray(x) for x in limbs]
    rinv = pow(fl.R, -1, fl.p)
    out = []
    for n in range(cols[0].shape[0]):
        v = 0
        for i in range(fl.L - 1, -1, -1):
            v = (v << LIMB_BITS) | int(cols[i][n])
        out.append(v * rinv % fl.p)
    return out


@pytest.fixture(scope="module", params=["bls12_381", "bn254"])
def fixture(request):
    params = get_curve(request.param)
    p = params.q
    L = params.fq.n
    fl = FpLimbs(p, L)
    rng = np.random.default_rng(42)
    xs = [int.from_bytes(rng.bytes(L * 2), "little") % p for _ in range(N)]
    ys = [int.from_bytes(rng.bytes(L * 2), "little") % p for _ in range(N)]
    return fl, p, xs, ys


def test_mul(fixture):
    fl, p, xs, ys = fixture
    assert _dec(fl, fl.mul(_enc(fl, xs), _enc(fl, ys))) == [x * y % p for x, y in zip(xs, ys)]


def test_sqr(fixture):
    fl, p, xs, _ = fixture
    assert _dec(fl, fl.sqr(_enc(fl, xs))) == [x * x % p for x in xs]


def test_add_sub_neg(fixture):
    fl, p, xs, ys = fixture
    a, b = _enc(fl, xs), _enc(fl, ys)
    assert _dec(fl, fl.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert _dec(fl, fl.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert _dec(fl, fl.neg(a)) == [(-x) % p for x in xs]
    z = fl.zero(a)
    assert _dec(fl, fl.neg(z)) == [0] * N


def test_mul_small(fixture):
    fl, p, xs, _ = fixture
    a = _enc(fl, xs)
    for k in (0, 1, 2, 3, 4, 8):
        assert _dec(fl, fl.mul_small(a, k)) == [k * x % p for x in xs]


def test_fq2(fixture):
    fl, p, xs, ys = fixture
    f2 = Fp2Limbs(fl)
    a = (_enc(fl, xs), _enc(fl, ys))
    b = (_enc(fl, ys), _enc(fl, xs))
    g = f2.mul(a, b)
    assert _dec(fl, g[0]) == [(x0 * y0 - x1 * y1) % p
                              for x0, x1, y0, y1 in zip(xs, ys, ys, xs)]
    assert _dec(fl, g[1]) == [(x0 * y1 + x1 * y0) % p
                              for x0, x1, y0, y1 in zip(xs, ys, ys, xs)]
    s = f2.sqr(a)
    assert _dec(fl, s[0]) == [(x * x - y * y) % p for x, y in zip(xs, ys)]
    assert _dec(fl, s[1]) == [2 * x * y % p for x, y in zip(xs, ys)]
