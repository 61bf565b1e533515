"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.field import bls12_381
from zkp_tpu.ntt.ntt import domain_for
from zkp_tpu.parallel.sharded import (
    DistNTT, batched_intt_sharded, make_mesh, sharded_msm, sharded_msm_auto)
from zkp_tpu.ref.pyref import CurveRef, ntt_ref

TEST_CURVE = os.environ.get("ZKP_TEST_CURVE", "toy_bn3")


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def _g1_fixture(ops, ref, n, seed):
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


def _check(ops, got, expect):
    gx, gy, _ = ops.g1.to_affine(tuple(v[None] for v in got))
    assert int(ops.fq.decode(gx[0])) == expect[0]
    assert int(ops.fq.decode(gy[0])) == expect[1]


def test_sharded_msm_matches_single():
    ops = curve_ops(TEST_CURVE)
    ref = CurveRef(ops.params)
    mesh = make_mesh(8)
    n = 24  # not divisible by 8 -> exercises padding
    xs, ys, inf, limbs, expect = _g1_fixture(ops, ref, n, 1)
    got = sharded_msm(ops.g1, mesh, xs, ys, inf, limbs, c=4, block=2)
    _check(ops, got, expect)


def test_sharded_msm_bucket_pipeline():
    """Per-device shards of 256 > NAIVE_CUTOFF=128: the real Pippenger
    sort -> run-scan -> segment-fold -> bucket path runs INSIDE shard_map
    (round-3 verdict: this path had never executed under shard_map)."""
    ops = curve_ops(TEST_CURVE)
    ref = CurveRef(ops.params)
    mesh = make_mesh(8)
    n = 1 << 11
    xs, ys, inf, limbs, expect = _g1_fixture(ops, ref, n, 3)
    got = sharded_msm(ops.g1, mesh, xs, ys, inf, limbs, c=8, block=16)
    _check(ops, got, expect)


def test_sharded_msm_auto_selects_xla_path_on_cpu():
    """Selection logic: on a CPU mesh the auto entry must route to the XLA
    limb path (the Pallas kernel path needs TPU lanes) and stay correct."""
    ops = curve_ops(TEST_CURVE)
    ref = CurveRef(ops.params)
    mesh = make_mesh(8)
    n = 40
    xs, ys, inf, limbs, expect = _g1_fixture(ops, ref, n, 5)
    got = sharded_msm_auto(ops, mesh, "g1", xs, ys, inf, limbs)
    _check(ops, got, expect)


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


def test_multihost_single_process_noop_and_pod_mesh():
    """init_multihost is a no-op without a coordinator; pod_mesh spans the
    (virtual) device set; process_info reports a sane single-process view."""
    from zkp_tpu.parallel.multihost import init_multihost, pod_mesh, process_info

    assert init_multihost() is False        # nothing to join on one host
    mesh = pod_mesh("points")
    assert mesh.shape["points"] == len(jax.devices()) == 8
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_device_count"] == 8
