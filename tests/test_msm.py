"""Pippenger MSM vs naive double-and-add and the python-int oracle.

Runs on the 3-limb toy BN curve (identical code paths; BLS12-381 compile
on XLA:CPU is unaffordable -- see tests/test_groth16.py header).  The
full-width curves are A/B-tested on hardware by scripts/msm_tpu_test.py.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.msm.pippenger import MSM, extract_digits, default_window_bits
from zkp_tpu.ref.pyref import CurveRef

TEST_CURVE = os.environ.get("ZKP_TEST_CURVE", "toy_bn3")


@pytest.fixture(scope="module")
def setup():
    ops = curve_ops(TEST_CURVE)
    ref = CurveRef(ops.params)
    return ops, ref


def _rand_g1(ops, ref, seed, n):
    """n distinct G1 points (multiples of the generator) + their oracle forms."""
    ks = [k % ops.params.r for k in ops.fr.random_ints(seed, n, nonzero=True)]
    pts = [ref.g1_mul(k, ref.g1) for k in ks]
    xs = ops.fq.encode([p[0] for p in pts])
    ys = ops.fq.encode([p[1] for p in pts])
    inf = jnp.zeros((n,), dtype=bool)
    return xs, ys, inf, pts


def test_digit_extraction(setup):
    ops, _ = setup
    # encode_scalars reduces mod r, so compare digits of the reduced values
    vals = [v % ops.params.r for v in [0, 1, (1 << 255) - 19, ops.params.r - 1]]
    limbs = ops.encode_scalars(vals)
    c = 13
    for w in range(0, 20, 3):
        got = np.asarray(extract_digits(limbs, w, c))
        for i, v in enumerate(vals):
            assert got[i] == (v >> (w * c)) & ((1 << c) - 1)


def test_window_digits_recompose(setup):
    ops, _ = setup
    v = ops.fr.random_ints(3, 4)
    limbs = ops.encode_scalars(v)
    for c in (4, 13, 16):
        nwin = -(-256 // c)
        recomposed = [0] * 4
        for w in range(nwin):
            d = np.asarray(extract_digits(limbs, w, c))
            for i in range(4):
                recomposed[i] += int(d[i]) << (w * c)
        assert recomposed == v


@pytest.mark.parametrize("n,c", [(8, 3), (33, 4), (64, 8)])
def test_msm_matches_oracle(setup, n, c):
    ops, ref = setup
    xs, ys, inf, pts = _rand_g1(ops, ref, 100 + n, n)
    scalars = ops.fr.random_ints(200 + n, n)
    scalars[0] = 0           # zero scalar contributes nothing
    limbs = ops.encode_scalars(scalars)
    msm = MSM(ops.g1)
    got = msm(xs, ys, inf, limbs, c=c, block=8)
    gx, gy, ginf = ops.g1.to_affine(tuple(v[None] for v in got))
    expect = None
    for k, p in zip(scalars, pts):
        expect = ref.g1_add(expect, ref.g1_mul(k, p))
    if expect is None:
        assert bool(ginf[0])
    else:
        assert int(ops.fq.decode(gx[0])) == expect[0]
        assert int(ops.fq.decode(gy[0])) == expect[1]


def test_msm_with_infinity_points(setup):
    ops, ref = setup
    n = 16
    xs, ys, inf, pts = _rand_g1(ops, ref, 7, n)
    inf = inf.at[3].set(True).at[10].set(True)
    scalars = ops.fr.random_ints(8, n)
    limbs = ops.encode_scalars(scalars)
    got = MSM(ops.g1)(xs, ys, inf, limbs, c=4, block=8)
    gx, gy, _ = ops.g1.to_affine(tuple(v[None] for v in got))
    expect = None
    for i, (k, p) in enumerate(zip(scalars, pts)):
        if i in (3, 10):
            continue
        expect = ref.g1_add(expect, ref.g1_mul(k, p))
    assert int(ops.fq.decode(gx[0])) == expect[0]
    assert int(ops.fq.decode(gy[0])) == expect[1]


def test_msm_matches_naive(setup):
    ops, ref = setup
    n = 20
    xs, ys, inf, _ = _rand_g1(ops, ref, 9, n)
    scalars = ops.fr.random_ints(10, n)
    limbs = ops.encode_scalars(scalars)
    msm = MSM(ops.g1)
    fast = msm(xs, ys, inf, limbs, c=5, block=4)
    slow = msm.naive(xs, ys, inf, limbs)
    assert bool(ops.g1.eq_points(fast, slow))


def test_msm_all_same_bucket(setup):
    """Adversarial: every scalar equal -> one giant bucket run."""
    ops, ref = setup
    n = 24
    xs, ys, inf, pts = _rand_g1(ops, ref, 11, n)
    scalars = [5] * n
    limbs = ops.encode_scalars(scalars)
    got = MSM(ops.g1)(xs, ys, inf, limbs, c=4, block=4)
    gx, gy, _ = ops.g1.to_affine(tuple(v[None] for v in got))
    expect = None
    for p in pts:
        expect = ref.g1_add(expect, p)
    expect = ref.g1_mul(5, expect)
    assert int(ops.fq.decode(gx[0])) == expect[0]


def test_msm_g2(setup):
    ops, ref = setup
    n = 6
    ks = ops.fr.random_ints(12, n, nonzero=True)
    pts = [ref.g2_mul(k, ref.g2) for k in ks]
    xs = ops.fq.encode([[p[0].c0, p[0].c1] for p in pts])
    ys = ops.fq.encode([[p[1].c0, p[1].c1] for p in pts])
    inf = jnp.zeros((n,), dtype=bool)
    scalars = ops.fr.random_ints(13, n)
    limbs = ops.encode_scalars(scalars)
    got = MSM(ops.g2)(xs, ys, inf, limbs, c=4, block=2)
    gx, gy, _ = ops.g2.to_affine(tuple(v[None] for v in got))
    expect = None
    for k, p in zip(scalars, pts):
        expect = ref.g2_add(expect, ref.g2_mul(k, p))
    got_x = ops.fq.decode(gx[0])
    assert int(got_x[0]) == expect[0].c0 and int(got_x[1]) == expect[0].c1


def test_msm_bucket_pipeline_matches_naive(setup):
    """n > NAIVE_CUTOFF: the real sort -> run-scan -> segment-fold -> bucket
    pipeline (not the small-N double-and-add) against the naive path."""
    ops, ref = setup
    n = 1 << 9  # 512 > NAIVE_CUTOFF=128
    ks = [k % ops.params.r for k in ops.fr.random_ints(21, n, nonzero=True)]
    import jax
    # points via the device fixed-base table would compile another module;
    # host oracle is instant at toy width
    pts = [ref.g1_mul(k, ref.g1) for k in ks]
    xs = ops.fq.encode([p[0] for p in pts])
    ys = ops.fq.encode([p[1] for p in pts])
    inf = jnp.zeros((n,), dtype=bool)
    scalars = ops.fr.random_ints(22, n)
    limbs = ops.encode_scalars(scalars)
    msm = MSM(ops.g1)
    got = msm(xs, ys, inf, limbs, c=8, block=32)
    gx, gy, _ = ops.g1.to_affine(tuple(v[None] for v in got))
    expect = None
    for k, p in zip(scalars, pts):
        expect = ref.g1_add(expect, ref.g1_mul(k, p))
    assert int(ops.fq.decode(gx[0])) == expect[0]
    assert int(ops.fq.decode(gy[0])) == expect[1]
