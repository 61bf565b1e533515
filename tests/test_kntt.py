"""kntt (two-level VMEM-resident NTT kernels) vs a python-int oracle.

Runs on the CPU backend in Pallas interpret mode over BabyBear
(p = 2^31 - 2^27 + 1, L = 2 limbs) so the XLA:CPU limb graphs stay small;
the BLS12-381 Fr path is exercised on hardware (scripts/kntt_test.py tpu,
ZKP_TESTS_TPU runs).  Replaces ark-poly Radix2EvaluationDomain's FFT core
at production sizes (crates/groth16-qap/src/lib.rs:100-169).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zkp_tpu.field.fp import ints_to_limbs, limbs_to_ints
from zkp_tpu.ntt.kntt import kntt_for, _nat_perm, supported

P = (1 << 31) - (1 << 27) + 1
G = next(g for g in range(2, 50) if pow(g, (P - 1) // 2, P) == P - 1)
L = 2
R = 1 << (16 * L)
LOG_N = 14
OMEGA = pow(G, (P - 1) >> LOG_N, P)


def oracle_ntt(vals, omega, p):
    n = len(vals)
    if n == 1:
        return list(vals)
    ev = oracle_ntt(vals[0::2], omega * omega % p, p)
    od = oracle_ntt(vals[1::2], omega * omega % p, p)
    out = [0] * n
    w = 1
    for k in range(n // 2):
        t = w * od[k] % p
        out[k] = (ev[k] + t) % p
        out[k + n // 2] = (ev[k] - t) % p
        w = w * omega % p
    return out


@pytest.fixture(scope="module")
def fixture():
    n = 1 << LOG_N
    k = kntt_for(P, L, LOG_N, OMEGA)
    rng = np.random.default_rng(3)
    xs = [int(v) % P for v in rng.integers(0, P, size=n)]
    xk = jnp.asarray(np.transpose(
        ints_to_limbs([v * R % P for v in xs], L), (1, 0)).copy())
    return k, xs, xk


def decode(arr):
    rinv = pow(R, -1, P)
    return [v * rinv % P for v in limbs_to_ints(np.transpose(arr, (1, 0)))]


def test_supported_range():
    assert not supported(10) and supported(14) and supported(20)


def test_fast_ntt_matches_oracle(fixture):
    k, xs, xk = fixture
    fast = np.asarray(jax.device_get(k.fast_ntt(xk)))
    got = decode(fast)
    perm = _nat_perm(k.N1, k.N2)
    nat = [got[perm[i]] for i in range(len(xs))]
    assert nat == oracle_ntt(xs, OMEGA, P)


def test_fast_roundtrip_and_natural(fixture):
    k, xs, xk = fixture
    fast = k.fast_ntt(xk)
    back = np.asarray(jax.device_get(k.fast_intt(fast)))
    assert decode(back) == xs
    nat = np.asarray(jax.device_get(k.ntt(xk)))
    assert decode(nat) == oracle_ntt(xs, OMEGA, P)


def test_coset_roundtrip(fixture):
    k, xs, xk = fixture
    shift = 7
    cz = k.fast_coset_ntt(xk, shift)
    # coset evals (fast order) == oracle NTT of shift-scaled coeffs
    scaled = [v * pow(shift, i, P) % P for i, v in enumerate(xs)]
    perm = _nat_perm(k.N1, k.N2)
    got = decode(np.asarray(jax.device_get(cz)))
    assert [got[perm[i]] for i in range(len(xs))] == \
        oracle_ntt(scaled, OMEGA, P)
    back = np.asarray(jax.device_get(k.fast_coset_intt(cz, shift)))
    assert decode(back) == xs
