"""msm_split (two-executable MSM) equivalence with the monolithic kernel.

msm_split.py deliberately duplicates msm_tpu's window body / Horner tail
(editing msm_tpu.py would invalidate the shipped AOT artifacts); this test
pins the two pipelines to identical results so the copies cannot drift.
Runs on CPU in Pallas interpret mode over the 3-limb toy curve.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# compiling BOTH full MSM pipelines in interpret mode takes >20 min on a
# 2-vCPU host (round-5 measurement) -- run on hardware or explicit opt-in.
# The TPU e2e prove (scripts/prove_bench.py) also pins the split path: its
# G2 MSM feeds a proof that must pass the pairing check.
pytestmark = pytest.mark.skipif(
    os.environ.get("ZKP_TESTS_TPU", "") != "1"
    and os.environ.get("ZKP_TESTS_SLOW", "") != "1",
    reason="two full MSM pipeline compiles; set ZKP_TESTS_SLOW=1 or "
           "ZKP_TESTS_TPU=1")

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.msm.msm_split import MSMKernelSplit, msm_tpu_split
from zkp_tpu.msm.msm_tpu import MSMKernel
from zkp_tpu.ref.pyref import CurveRef


def _fixture(ops, ref, n, seed):
    ks = ops.fr.random_ints(seed, n, nonzero=True)
    pts = [ref.g1_mul(k, ref.g1) for k in ks]
    xs = ops.fq.encode([p[0] for p in pts])
    ys = ops.fq.encode([p[1] for p in pts])
    inf = jnp.zeros((n,), dtype=bool)
    scalars = ops.fr.random_ints(seed + 1, n)
    limbs = ops.encode_scalars(scalars)
    expect = None
    for k, p in zip(scalars, pts):
        expect = ref.g1_add(expect, ref.g1_mul(k, p))
    return xs, ys, inf, limbs, expect


def test_split_matches_monolith_and_oracle():
    ops = curve_ops("toy_bn3")
    ref = CurveRef(ops.params)
    n = 2048
    xs, ys, inf, limbs, expect = _fixture(ops, ref, n, 5)
    mono = MSMKernel(ops, "g1")
    split = MSMKernelSplit(ops, "g1")
    got_m = mono(xs, ys, inf, limbs, c=8, B=16)
    got_s = split(xs, ys, inf, limbs, c=8, B=16)

    def affine(got):
        gx, gy, gi = ops.g1.to_affine(tuple(v[None] for v in got))
        assert not bool(gi[0])
        return int(ops.fq.decode(gx[0])), int(ops.fq.decode(gy[0]))

    # the reduce stages sum in different orders, so the Jacobian
    # representatives differ; the GROUP ELEMENT must be identical
    assert affine(got_m) == expect
    assert affine(got_s) == expect
