"""NTT/iNTT bit-exact tests vs the recursive python-int oracle.

Covers the surface ark-poly's Radix2EvaluationDomain provides to the
reference (qap/lib.rs:100-169): forward/inverse transforms, coset
transforms, vanishing polys, Lagrange evaluation."""

import numpy as np
import pytest
import jax.numpy as jnp

from zkp_tpu.field import bls12_381, bn254
from zkp_tpu.ntt.ntt import Domain, domain_for
from zkp_tpu.ref.pyref import ntt_ref, intt_ref


@pytest.mark.parametrize("log_n", [1, 3, 6, 8])
def test_ntt_matches_reference(log_n):
    curve = bls12_381()
    d = domain_for(curve, log_n)
    f = curve.fr
    n = 1 << log_n
    vals = f.random_ints(20 + log_n, n)
    X = f.encode(vals)
    got = [int(v) for v in f.decode(d.ntt(X))]
    expect = ntt_ref(vals, d.omega, f.p)
    assert got == expect


@pytest.mark.parametrize("log_n", [2, 6])
def test_intt_roundtrip(log_n):
    curve = bls12_381()
    d = domain_for(curve, log_n)
    f = curve.fr
    n = 1 << log_n
    vals = f.random_ints(30 + log_n, n)
    X = f.encode(vals)
    back = [int(v) for v in f.decode(d.intt(d.ntt(X)))]
    assert back == vals
    expect = intt_ref(vals, d.omega, f.p)
    got = [int(v) for v in f.decode(d.intt(X))]
    assert got == expect


def test_ntt_batched():
    curve = bls12_381()
    d = domain_for(curve, 4)
    f = curve.fr
    n = 16
    flat = f.random_ints(40, 3 * n)
    X = f.encode(flat).reshape(3, n, f.n)
    got = f.decode(d.ntt(X))
    for b in range(3):
        expect = ntt_ref(flat[b * n:(b + 1) * n], d.omega, f.p)
        assert [int(v) for v in got[b]] == expect


def test_coset_ntt_evaluates_on_coset():
    curve = bls12_381()
    d = domain_for(curve, 3)
    f = curve.fr
    g = curve.fr_generator
    coeffs = f.random_ints(50, 8)
    X = f.encode(coeffs)
    got = [int(v) for v in f.decode(d.coset_ntt(X, g))]
    # direct evaluation at g * w^j
    for j in range(8):
        x = g * pow(d.omega, j, f.p) % f.p
        expect = 0
        for c in reversed(coeffs):
            expect = (expect * x + c) % f.p
        assert got[j] == expect
    # coset round trip
    back = [int(v) for v in f.decode(d.coset_intt(d.coset_ntt(X, g), g))]
    assert back == coeffs


def test_vanishing_constant_on_coset():
    curve = bls12_381()
    d = domain_for(curve, 5)
    g = curve.fr_generator
    p = curve.r
    zc = d.vanishing_on_coset(g)
    for j in [0, 7, 31]:
        x = g * pow(d.omega, j, p) % p
        assert d.vanishing_at(x) == zc
    assert zc != 0
    # vanishing on the domain itself
    assert d.vanishing_at(pow(d.omega, 3, p)) == 0


def test_lagrange_coeffs():
    curve = bls12_381()
    d = domain_for(curve, 3)
    f = curve.fr
    p = f.p
    s = f.random_ints(60, 1, nonzero=True)[0]
    lag = [int(v) for v in f.decode(d.lagrange_coeffs_at(s))]
    # sum of coeffs times f(w^j) must equal f(s) for any degree<n poly
    coeffs = f.random_ints(61, 8)
    evals = ntt_ref(coeffs, d.omega, p)
    interp = sum(l * e for l, e in zip(lag, evals)) % p
    direct = 0
    for c in reversed(coeffs):
        direct = (direct * s + c) % p
    assert interp == direct
    # s on the domain -> indicator
    s_dom = pow(d.omega, 5, p)
    lag2 = [int(v) for v in f.decode(d.lagrange_coeffs_at(s_dom))]
    assert lag2[5] == 1 and sum(lag2) == 1


def test_bn254_domain():
    curve = bn254()
    d = domain_for(curve, 4)
    f = curve.fr
    vals = f.random_ints(70, 16)
    X = f.encode(vals)
    got = [int(v) for v in f.decode(d.ntt(X))]
    assert got == ntt_ref(vals, d.omega, f.p)
