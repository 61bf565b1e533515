"""Pallas kernel paths (pkernels / kfield / msm_tpu) -- TPU-only tests.

On CPU these are skipped: Mosaic kernels can only run in interpret mode
there, and tracing the unrolled limb arithmetic into XLA:CPU takes minutes
per kernel (round-2 finding).  The CPU suite covers the same math through
the fp.py backend; scripts/pkernels_test.py and scripts/msm_tpu_test.py run
the full A/B on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if jax.default_backend() != "tpu":
    pytest.skip("Pallas kernel tests require a TPU", allow_module_level=True)

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import KGroup
from zkp_tpu.msm.msm_tpu import MSMKernel
from zkp_tpu.ref.pyref import CurveRef


@pytest.fixture(scope="module")
def ops():
    return curve_ops("bls12_381")


def test_g1_add_matches_xla(ops):
    fq, fr = ops.fq, ops.fr
    oracle = CurveRef(ops.params)
    N = 256
    pts = [oracle.g1_mul(k, oracle.g1) for k in range(1, N + 1)]
    px = fq.encode([p[0] for p in pts])
    py = fq.encode([p[1] for p in pts])
    P = ops.g1.from_affine(px, py)
    kg = KGroup(ops.params.q, fq.n, "g1")
    kP = kg.to_klayout(jnp.concatenate([P[0], P[1], P[2]], axis=1))
    ref = ops.g1.add(P, P)
    got = kg.from_klayout(kg.add(kP, kP))
    want = jnp.concatenate([ref[0], ref[1], ref[2]], axis=1)
    assert bool(jnp.all(got == want))


def test_msm_kernel_matches_oracle(ops):
    fq, fr = ops.fq, ops.fr
    oracle = CurveRef(ops.params)
    N = 1 << 13
    r = fr.p
    rng = np.random.default_rng(5)
    m_ints = [int(v) for v in rng.integers(1, 1 << 16, size=N)]
    s_ints = [int.from_bytes(rng.bytes(32), "little") % r for _ in range(N)]
    tab = ops.g1_fixed_base()
    P = tab.scalar_mul(fr.encode(m_ints, mont=False))
    xs, ys, inf = ops.g1.to_affine(P)
    msm = MSMKernel(ops, "g1")
    X, Y, Z = msm(xs, ys, inf, fr.encode(s_ints, mont=False), c=12, B=64)
    total = sum(m * s for m, s in zip(m_ints, s_ints)) % r
    want = oracle.g1_mul(total, oracle.g1)
    q = ops.params.q
    zz = int(fq.decode(Z))
    assert zz != 0
    zi = pow(zz, -1, q)
    got = (int(fq.decode(X)) * zi * zi % q,
           int(fq.decode(Y)) * zi * zi % q * zi % q)
    assert got == want


def test_sharded_kernel_msm_single_chip_mesh(ops):
    """sharded_msm_kernel on a 1-device TPU mesh == single-chip MSMKernel
    (the collective plumbing is exercised on the CPU mesh by
    tests/test_sharded.py; here the Pallas path runs under shard_map on
    real hardware)."""
    from zkp_tpu.parallel.sharded import make_mesh, sharded_msm_auto

    fq, fr = ops.fq, ops.fr
    N = 1 << 13
    rng = np.random.default_rng(7)
    m_ints = [int(v) for v in rng.integers(1, 1 << 16, size=N)]
    s_ints = [int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N)]
    tab = ops.g1_fixed_base()
    P = tab.scalar_mul(fr.encode(m_ints, mont=False))
    xs, ys, inf = ops.g1.to_affine(P)
    scal = fr.encode(s_ints, mont=False)

    mesh = make_mesh(1)
    got = sharded_msm_auto(ops, mesh, "g1", xs, ys, inf, scal)
    want = MSMKernel(ops, "g1")(xs, ys, inf, scal)
    assert bool(ops.g1.eq_points(got, want))
