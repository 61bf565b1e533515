"""G1/G2 Jacobian arithmetic vs the python-int affine oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.ref.pyref import CurveRef, Fq2
from zkp_tpu.field import bls12_381, bn254


@pytest.fixture(scope="module", params=["bls12_381", "bn254"])
def setup(request):
    ops = curve_ops(request.param)
    ref = CurveRef(ops.params)
    return ops, ref


def _g1_points(ops, ref, ks):
    """Affine device arrays + oracle points for k*G1 for k in ks."""
    pts = [ref.g1_mul(k, ref.g1) for k in ks]
    xs = ops.fq.encode([p[0] for p in pts])
    ys = ops.fq.encode([p[1] for p in pts])
    return (xs, ys), pts


def test_g1_generator_on_curve(setup):
    ops, ref = setup
    x, y = ops.g1_gen_affine
    assert bool(ops.g1.on_curve(x, y))
    gx2, gy2 = ops.g2_gen_affine
    assert bool(ops.g2.on_curve(gx2, gy2))


def test_g1_add_double_matches_oracle(setup):
    ops, ref = setup
    ks = [1, 2, 3, 5, 7, 11, 100]
    (xs, ys), pts = _g1_points(ops, ref, ks)
    P = ops.g1.from_affine(xs, ys)
    # pairwise adds: [k1+k2, k2+k3, ...]
    Q = tuple(jnp.roll(c, -1, axis=0) for c in P)
    S = ops.g1.add(P, Q)
    sx, sy, sinf = ops.g1.to_affine(S)
    for i in range(len(ks)):
        j = (i + 1) % len(ks)
        expect = ref.g1_add(pts[i], pts[j])
        assert not bool(sinf[i])
        assert int(ops.fq.decode(sx[i])) == expect[0]
        assert int(ops.fq.decode(sy[i])) == expect[1]
    # doubling (same-x same-y path of add must also work)
    D = ops.g1.add(P, P)
    D2 = ops.g1.double(P)
    dx, dy, _ = ops.g1.to_affine(D)
    d2x, d2y, _ = ops.g1.to_affine(D2)
    for i, k in enumerate(ks):
        expect = ref.g1_mul(2 * k, ref.g1)
        assert int(ops.fq.decode(dx[i])) == expect[0]
        assert int(ops.fq.decode(d2x[i])) == expect[0]
        assert int(ops.fq.decode(dy[i])) == expect[1]
        assert int(ops.fq.decode(d2y[i])) == expect[1]


def test_g1_add_inverse_gives_infinity(setup):
    ops, ref = setup
    (xs, ys), pts = _g1_points(ops, ref, [3, 9])
    P = ops.g1.from_affine(xs, ys)
    N = ops.g1.neg(P)
    S = ops.g1.add(P, N)
    assert bool(jnp.all(ops.g1.is_inf(S)))
    # adding infinity is identity
    S2 = ops.g1.add(S, P)
    sx, sy, _ = ops.g1.to_affine(S2)
    for i, p in enumerate(pts):
        assert int(ops.fq.decode(sx[i])) == p[0]


def test_g1_mixed_add(setup):
    ops, ref = setup
    (xs, ys), pts = _g1_points(ops, ref, [4, 6, 8])
    (xs2, ys2), pts2 = _g1_points(ops, ref, [10, 20, 30])
    P = ops.g1.from_affine(xs, ys)
    S = ops.g1.add_mixed(P, xs2, ys2)
    sx, sy, _ = ops.g1.to_affine(S)
    for i in range(3):
        expect = ref.g1_add(pts[i], pts2[i])
        assert int(ops.fq.decode(sx[i])) == expect[0]
        assert int(ops.fq.decode(sy[i])) == expect[1]
    # mixed add with q infinity mask
    inf_mask = jnp.array([1, 0, 0], dtype=jnp.uint32) != 0
    S3 = ops.g1.add_mixed(P, xs2, ys2, q_inf=inf_mask)
    s3x, _, _ = ops.g1.to_affine(S3)
    assert int(ops.fq.decode(s3x[0])) == pts[0][0]  # unchanged where q inf


def test_g1_scalar_mul(setup):
    ops, ref = setup
    scalars = [0, 1, 2, 12345, ops.params.r - 1, ops.fr.random_ints(5, 1)[0]]
    x, y = ops.g1_gen_affine
    G = ops.g1.from_affine(
        jnp.broadcast_to(x, (len(scalars),) + x.shape),
        jnp.broadcast_to(y, (len(scalars),) + y.shape))
    S = ops.g1.scalar_mul(G, ops.encode_scalars(scalars))
    sx, sy, sinf = ops.g1.to_affine(S)
    for i, k in enumerate(scalars):
        expect = ref.g1_mul(k, ref.g1)
        if expect is None:
            assert bool(sinf[i])
        else:
            assert int(ops.fq.decode(sx[i])) == expect[0]
            assert int(ops.fq.decode(sy[i])) == expect[1]


def test_g2_add_and_scalar_mul(setup):
    ops, ref = setup
    ks = [1, 2, 7]
    pts = [ref.g2_mul(k, ref.g2) for k in ks]
    xs = ops.fq.encode([[p[0].c0, p[0].c1] for p in pts])  # (3, 2, L)
    ys = ops.fq.encode([[p[1].c0, p[1].c1] for p in pts])
    P = ops.g2.from_affine(xs, ys)
    Q = tuple(jnp.roll(c, -1, axis=0) for c in P)
    S = ops.g2.add(P, Q)
    sx, sy, _ = ops.g2.to_affine(S)
    sx_h, sy_h = ops.fq.decode(sx), ops.fq.decode(sy)
    for i in range(len(ks)):
        j = (i + 1) % len(ks)
        ex, ey = ref.g2_add(pts[i], pts[j])
        assert int(sx_h[i][0]) == ex.c0 and int(sx_h[i][1]) == ex.c1
        assert int(sy_h[i][0]) == ey.c0 and int(sy_h[i][1]) == ey.c1
    # scalar mul on G2
    k = 31337
    S2 = ops.g2.scalar_mul(ops.g2_generator(), ops.encode_scalars([k])[0])
    s2x, s2y, _ = ops.g2.to_affine((S2[0][None], S2[1][None], S2[2][None]))
    expect = ref.g2_mul(k, ref.g2)
    got_x = ops.fq.decode(s2x[0])
    assert int(got_x[0]) == expect[0].c0 and int(got_x[1]) == expect[0].c1


def test_reduce_sum(setup):
    ops, ref = setup
    ks = [3, 1, 4, 1, 5, 9, 2]  # odd count exercises padding
    (xs, ys), pts = _g1_points(ops, ref, ks)
    P = ops.g1.from_affine(xs, ys)
    S = ops.g1.reduce_sum(P)
    sx, sy, _ = ops.g1.to_affine((S[0][None], S[1][None], S[2][None]))
    expect = ref.g1_mul(sum(ks), ref.g1)
    assert int(ops.fq.decode(sx[0])) == expect[0]
    assert int(ops.fq.decode(sy[0])) == expect[1]
