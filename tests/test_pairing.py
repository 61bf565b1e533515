"""Tower + pairing tests: bit-exact vs python oracle, bilinearity, checks."""

import numpy as np
import pytest
import jax.numpy as jnp

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.pairing.pairing import pairing_engine, _encode_fq12
from zkp_tpu.ref import pyref


def _py_fq2(q, seed, fq):
    vals = fq.random_ints(seed, 2)
    return pyref.Fq2(q, vals[0], vals[1])


def _py_fq12(ref, seed, fq):
    xi = ref.xi
    sixes = []
    for j in range(2):
        pairs = [_py_fq2(ref.q, seed * 10 + j * 3 + t, fq) for t in range(3)]
        sixes.append(pyref.Fq6(xi, *pairs))
    return pyref.Fq12(*sixes)


_HEAVY = pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="full Miller-loop graphs take >40min to compile on XLA:CPU; "
           "the host-oracle pairing covers verify off-TPU and these run on TPU")


def _eng(fn, *a, **kw):
    """Run an engine call; xfail if the axon remote-compile helper is
    OOM-killed on the full-width Miller module (an environment capacity
    limit, not an arithmetic bug -- Verifier/BatchVerifier fall back to
    the host oracle at runtime)."""
    import jax

    try:
        return fn(*a, **kw)
    except jax.errors.JaxRuntimeError as e:  # pragma: no cover - env specific
        if "tpu_compile_helper" in str(e):
            pytest.xfail(f"axon compile-helper OOM: {e}")
        raise


@pytest.fixture(scope="module", params=["bls12_381", "bn254"])
def setup(request):
    ops = curve_ops(request.param)
    ref = pyref.CurveRef(ops.params)
    eng = pairing_engine(request.param)
    return ops, ref, eng


def test_tower_mul_inv_matches_oracle(setup):
    ops, ref, eng = setup
    f12 = ops.f12
    a_py = _py_fq12(ref, 3, ops.fq)
    b_py = _py_fq12(ref, 4, ops.fq)
    A = _encode_fq12(ops.fq, a_py)[None]
    B = _encode_fq12(ops.fq, b_py)[None]
    got_mul = np.asarray(f12.mul(A, B)[0])
    expect = _encode_fq12(ops.fq, a_py * b_py)
    assert (got_mul == np.asarray(expect)).all()
    got_inv = np.asarray(f12.inv(A)[0])
    expect_inv = _encode_fq12(ops.fq, a_py.inv())
    assert (got_inv == np.asarray(expect_inv)).all()
    # sqr == mul(a, a)
    assert (np.asarray(f12.sqr(A)) == np.asarray(f12.mul(A, A))).all()


@_HEAVY
def test_pairing_matches_oracle(setup):
    ops, ref, eng = setup
    a, b = 5, 7
    P = ref.g1_mul(a, ref.g1)
    Q = ref.g2_mul(b, ref.g2)
    xp = ops.fq.encode([P[0]])
    yp = ops.fq.encode([P[1]])
    xq = ops.fq.encode([[Q[0].c0, Q[0].c1]])
    yq = ops.fq.encode([[Q[1].c0, Q[1].c1]])
    got = _eng(eng.pairing, xp, yp, xq, yq)[0]
    expect = _encode_fq12(ops.fq, ref.pairing(P, Q))
    assert (np.asarray(got) == np.asarray(expect)).all()


@_HEAVY
def test_bilinearity(setup):
    ops, ref, eng = setup
    # e(aP, bQ) == e(abP, Q)
    a, b = 3, 11
    P1 = ref.g1_mul(a, ref.g1)
    Q1 = ref.g2_mul(b, ref.g2)
    P2 = ref.g1_mul(a * b, ref.g1)
    Q2 = ref.g2
    xp = ops.fq.encode([P1[0], P2[0]])
    yp = ops.fq.encode([P1[1], P2[1]])
    xq = ops.fq.encode([[Q1[0].c0, Q1[0].c1], [Q2[0].c0, Q2[0].c1]])
    yq = ops.fq.encode([[Q1[1].c0, Q1[1].c1], [Q2[1].c0, Q2[1].c1]])
    got = _eng(eng.pairing, xp, yp, xq, yq)
    assert (np.asarray(got[0]) == np.asarray(got[1])).all()
    # non-degeneracy
    one = np.asarray(jnp.broadcast_to(eng.f12.ones(), got[0].shape))
    assert not (np.asarray(got[0]) == one).all()


@_HEAVY
def test_pairing_check_accepts_and_rejects(setup):
    ops, ref, eng = setup
    q = ops.params.q
    P = ref.g1_mul(9, ref.g1)
    Q = ref.g2_mul(4, ref.g2)
    negP = (P[0], (-P[1]) % q)
    xp = ops.fq.encode([P[0], negP[0]])
    yp = ops.fq.encode([P[1], negP[1]])
    xq = ops.fq.encode([[Q[0].c0, Q[0].c1]] * 2)
    yq = ops.fq.encode([[Q[1].c0, Q[1].c1]] * 2)
    assert _eng(eng.pairing_check, xp, yp, xq, yq)
    # e(P,Q) * e(P,Q) != 1
    yp_bad = ops.fq.encode([P[1], P[1]])
    xp_bad = ops.fq.encode([P[0], P[0]])
    assert not _eng(eng.pairing_check, xp_bad, yp_bad, xq, yq)


@_HEAVY
def test_pairing_infinity_mask(setup):
    ops, ref, eng = setup
    P = ref.g1_mul(2, ref.g1)
    Q = ref.g2_mul(3, ref.g2)
    xp = ops.fq.encode([P[0]])
    yp = ops.fq.encode([P[1]])
    xq = ops.fq.encode([[Q[0].c0, Q[0].c1]])
    yq = ops.fq.encode([[Q[1].c0, Q[1].c1]])
    mask = jnp.ones((1,), dtype=bool)
    got = _eng(eng.pairing, xp, yp, xq, yq, inf_mask=mask)[0]
    one = np.asarray(jnp.broadcast_to(eng.f12.ones(), got.shape))
    assert (np.asarray(got) == one).all()


def test_frobenius_and_final_exp_decomposition_toy():
    """frobenius(f, k) == f^(q^k) and the easy+hard final-exp decomposition
    == the full (q^12-1)/r scan, on the 3-limb toy BN curve (compiles in
    seconds; the BLS x-chain check path is covered on TPU by
    test_pairing_check_accepts_and_rejects)."""
    import jax.numpy as jnp
    from zkp_tpu.pairing.pairing import PairingEngine

    ops = curve_ops("toy_bn3")
    eng = pairing_engine("toy_bn3")
    h = ops.f12
    p = ops.params
    rng = np.random.default_rng(0)
    vals = [[[int(rng.integers(0, p.q)) for _ in range(2)] for _ in range(3)]
            for _ in range(2)]
    f = ops.fq.encode(np.asarray(vals, dtype=object))[None]
    for k in (1, 2, 3):
        assert bool(jnp.all(eng.frobenius(f, k) == h.pow_static(f, p.q ** k)))
    v_fast = eng._final_exp_value(f)
    v_full = h.pow_static(f, (p.q ** 12 - 1) // p.r)
    assert bool(jnp.all(v_fast == v_full))
    # BN check path: exact lam scan on the easy part == the exact value
    assert bool(jnp.all(eng._final_exp_check(f) == v_fast))
