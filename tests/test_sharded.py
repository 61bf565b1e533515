"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.field import bls12_381
from zkp_tpu.ntt.ntt import domain_for
from zkp_tpu.parallel.sharded import DistNTT, batched_intt_sharded, make_mesh, sharded_msm
from zkp_tpu.ref.pyref import CurveRef, ntt_ref


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_msm_matches_single():
    ops = curve_ops("bls12_381")
    ref = CurveRef(ops.params)
    mesh = make_mesh(8)
    n = 24  # not divisible by 8 -> exercises padding
    ks = ops.fr.random_ints(1, n, nonzero=True)
    pts = [ref.g1_mul(k, ref.g1) for k in ks]
    xs = ops.fq.encode([p[0] for p in pts])
    ys = ops.fq.encode([p[1] for p in pts])
    inf = jnp.zeros((n,), dtype=bool)
    scalars = ops.fr.random_ints(2, n)
    limbs = ops.encode_scalars(scalars)
    got = sharded_msm(ops.g1, mesh, xs, ys, inf, limbs, c=4, block=2)
    gx, gy, _ = ops.g1.to_affine(tuple(v[None] for v in got))
    expect = None
    for k, p in zip(scalars, pts):
        expect = ref.g1_add(expect, ref.g1_mul(k, p))
    assert int(ops.fq.decode(gx[0])) == expect[0]
    assert int(ops.fq.decode(gy[0])) == expect[1]


def test_dist_ntt_matches_single_chip():
    curve = bls12_381()
    mesh = make_mesh(8, axis="x")
    log_n = 8  # n1 = n2 = 16, both divisible by 8
    dn = DistNTT(curve, log_n, mesh)
    f = curve.fr
    vals = f.random_ints(3, 1 << log_n)
    X = f.encode(vals)
    got = [int(v) for v in f.decode(dn.ntt(X))]
    expect = ntt_ref(vals, curve.domain_root(log_n), f.p)
    assert got == expect


def test_batched_intt_sharded():
    curve = bls12_381()
    mesh = make_mesh(8, axis="x")
    f = curve.fr
    log_n = 4
    dom = domain_for(curve, log_n)
    flat = f.random_ints(5, 8 * 16)
    X = f.encode(flat).reshape(8, 16, f.n)
    got = batched_intt_sharded(curve, log_n, mesh, X)
    single = dom.intt(X)
    assert (np.asarray(got) == np.asarray(single)).all()
