"""Bit-exact tests for the limb field kernels vs python-int semantics.

Mirrors the reference's field test surface (crates/groth16-field/src/lib.rs:179-234:
basic ops, inverse, vector ops, randomness) and adds the cross-implementation
vectors the reference lacks (SURVEY.md section 4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zkp_tpu.field import Fp, bls12_381, bn254

CURVES = [bls12_381(), bn254()]
FIELDS = [c.fr for c in CURVES] + [c.fq for c in CURVES]


def _rand_ints(field, seed, k):
    return field.random_ints(seed, k)


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_encode_decode_roundtrip(field):
    vals = _rand_ints(field, 1, 16) + [0, 1, field.p - 1]
    enc = field.encode(vals, mont=True)
    dec = field.decode(enc, mont=True)
    assert [int(v) for v in dec] == vals
    enc2 = field.encode(vals, mont=False)
    dec2 = field.decode(enc2, mont=False)
    assert [int(v) for v in dec2] == vals


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(field):
    k = 64
    a = _rand_ints(field, 2, k) + [0, field.p - 1, 1]
    b = _rand_ints(field, 3, k) + [field.p - 1, field.p - 1, 0]
    A, B = field.encode(a), field.encode(b)
    got_add = field.decode(field.add(A, B))
    got_sub = field.decode(field.sub(A, B))
    got_neg = field.decode(field.neg(A))
    got_dbl = field.decode(field.double(A))
    for i in range(len(a)):
        assert int(got_add[i]) == (a[i] + b[i]) % field.p
        assert int(got_sub[i]) == (a[i] - b[i]) % field.p
        assert int(got_neg[i]) == (-a[i]) % field.p
        assert int(got_dbl[i]) == (2 * a[i]) % field.p


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mul_bit_exact(field):
    k = 64
    a = _rand_ints(field, 4, k) + [0, 1, field.p - 1, field.p - 1]
    b = _rand_ints(field, 5, k) + [field.p - 1, field.p - 1, field.p - 1, 0]
    A, B = field.encode(a), field.encode(b)
    got = field.decode(field.mul(A, B))
    got_sq = field.decode(field.sqr(A))
    for i in range(len(a)):
        assert int(got[i]) == (a[i] * b[i]) % field.p, f"mul mismatch at {i}"
        assert int(got_sq[i]) == (a[i] * a[i]) % field.p


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_inverse(field):
    vals = _rand_ints(field, 6, 8) + [1, field.p - 1]
    A = field.encode(vals)
    inv = field.decode(field.inv(A))
    for i, v in enumerate(vals):
        assert (int(inv[i]) * v) % field.p == 1
    # zero maps to zero
    z = field.inv(field.zeros((1,)))
    assert int(field.decode(z)[0]) == 0


@pytest.mark.parametrize("field", [bls12_381().fr], ids=lambda f: f.name)
def test_batch_inv(field):
    vals = _rand_ints(field, 7, 33)
    vals[5] = 0  # ensure zero passthrough
    A = field.encode(vals)
    inv = field.decode(field.batch_inv(A))
    for i, v in enumerate(vals):
        if v == 0:
            assert int(inv[i]) == 0
        else:
            assert (int(inv[i]) * v) % field.p == 1


@pytest.mark.parametrize("field", [bls12_381().fr, bn254().fr], ids=lambda f: f.name)
def test_pow_static(field):
    vals = _rand_ints(field, 8, 4)
    A = field.encode(vals)
    for e in [1, 2, 5, (field.p - 1) // 2, field.p - 2]:
        got = field.decode(field.pow_static(A, e))
        for i, v in enumerate(vals):
            assert int(got[i]) == pow(v, e, field.p)


@pytest.mark.parametrize("field", [bls12_381().fr], ids=lambda f: f.name)
def test_reduce_wide_lazy_sums(field):
    """Limb-wise sums of Montgomery values + reduce_wide == field sum."""
    k, terms = 7, 500
    rngvals = [_rand_ints(field, 100 + j, k) for j in range(terms)]
    encs = [np.asarray(field.encode(v)) for v in rngvals]
    acc = np.zeros((k, field.n), dtype=np.uint64)
    for e in encs:
        acc += e
    # propagate into <= 2n carried limbs on host
    wide = np.zeros((k, 2 * field.n), dtype=np.uint32)
    carry = np.zeros(k, dtype=np.uint64)
    for limb in range(field.n):
        t = acc[:, limb] + carry
        wide[:, limb] = (t & 0xFFFF).astype(np.uint32)
        carry = t >> 16
    limb = field.n
    while carry.any():
        wide[:, limb] = (carry & 0xFFFF).astype(np.uint32)
        carry = carry >> 16
        limb += 1
    got = field.decode(field.reduce_wide(jnp.asarray(wide)))
    for i in range(k):
        expect = sum(rngvals[j][i] for j in range(terms)) % field.p
        assert int(got[i]) == expect


@pytest.mark.parametrize("field", [bls12_381().fr], ids=lambda f: f.name)
def test_mul_under_jit_and_vmap(field):
    vals_a = _rand_ints(field, 9, 32)
    vals_b = _rand_ints(field, 10, 32)
    A, B = field.encode(vals_a), field.encode(vals_b)
    f = jax.jit(field.mul)
    got = field.decode(f(A, B))
    for i in range(32):
        assert int(got[i]) == vals_a[i] * vals_b[i] % field.p
    # 2D batch
    A2 = A.reshape(4, 8, field.n)
    B2 = B.reshape(4, 8, field.n)
    got2 = field.decode(f(A2, B2)).reshape(-1)
    for i in range(32):
        assert int(got2[i]) == vals_a[i] * vals_b[i] % field.p


def test_mul_small_and_const():
    field = bls12_381().fr
    vals = _rand_ints(field, 11, 8)
    A = field.encode(vals)
    for kk in [0, 1, 2, 3, 8, 1023]:
        got = field.decode(field.mul_small(A, kk)) if kk else field.decode(field.mul_small(A, kk))
        for i, v in enumerate(vals):
            assert int(got[i]) == (v * kk) % field.p
    c = field.const(12345, shape=(3,))
    assert all(int(x) == 12345 for x in field.decode(c))


def test_deterministic_rng():
    field = bls12_381().fr
    a = field.random_ints(42, 10)
    b = field.random_ints(42, 10)
    assert a == b
    c = field.random_ints(43, 10)
    assert a != c
