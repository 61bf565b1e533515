"""A/B-test the fused MSM reduction kernels (fold_tree / weighted_tail /
reduce_lanes_scaled) against their unfused equivalents.  Run on TPU
hardware (CPU interpret works too but takes minutes)."""
import os
import sys
import time
import functools

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import KGroup
from zkp_tpu.msm.msm_tpu import _kroll, _mask_k, _weighted_chunks
from zkp_tpu.ref.pyref import CurveRef

CURVE = os.environ.get("ZKP_TEST_CURVE", "bls12_381")
ops = curve_ops(CURVE)
fq, fr = ops.fq, ops.fr
oracle = CurveRef(ops.params)
kg = KGroup(ops.params.q, fq.n, "g1", st=8)
R = kg.R
q = ops.params.q


def fence(x):
    return jax.device_get(jax.tree.leaves(x)[0].ravel()[:1])


_FBK = None


def points_for(ints):
    global _FBK
    if _FBK is None:
        from zkp_tpu.msm.msm_tpu import FixedBaseKernel
        _FBK = FixedBaseKernel(ops, "g1")
    return _FBK(fr.encode([int(v) for v in ints], mont=False))  # jac (N, L)


def decode_lane0(kP):
    """klayout (3R, S, 128) lane 0 -> affine python point via the oracle."""
    rows = kg.from_klayout(kP)[0]
    X = int(fq.decode(rows[:R].reshape(1, R)))
    Y = int(fq.decode(rows[R:2 * R].reshape(1, R)))
    Z = int(fq.decode(rows[2 * R:].reshape(1, R)))
    if Z == 0:
        return None
    zi = pow(Z, -1, q)
    return (X * zi * zi % q, Y * zi * zi % q * zi % q)


def to_k(P):
    return kg.to_klayout(jnp.concatenate([c.reshape(c.shape[0], -1) for c in P], axis=1))


# ---------------------------------------------------------------- fold_tree
def test_fold_tree():
    Bcap = 1024
    Bc = Bcap // 128
    rng = np.random.default_rng(0)
    # sorted keys with duplicate runs (like boundary partials)
    keys = np.sort(rng.integers(1, 200, size=Bcap).astype(np.uint32))
    m_ints = rng.integers(1, 1 << 20, size=Bcap)
    P = points_for(m_ints)
    kv0 = to_k(P)

    start = jnp.searchsorted(jnp.asarray(keys), jnp.asarray(keys), side="left").astype(jnp.uint32)
    pos = jnp.arange(Bcap, dtype=jnp.uint32)
    rel = pos - start
    rounds = int(np.ceil(np.log2(Bcap)))

    @jax.jit
    def unfused(kv):
        def body(i, kv):
            d = (jnp.uint32(1) << i.astype(jnp.uint32))
            src_ok = (rel >= d) & (rel % (2 * d) == d)
            tgt_ok = jnp.roll(src_ok, -d) & (pos < jnp.uint32(Bcap) - d)
            return kg.add_masked(kv, _kroll(kv, -d), _mask_k(tgt_ok, Bc))
        return jax.lax.fori_loop(0, rounds, body, kv)

    masks = []
    for i in range(rounds):
        d = np.uint32(1 << i)
        src_ok = (rel >= d) & (rel % (2 * d) == d)
        masks.append(jnp.roll(src_ok, -int(d)) & (pos < jnp.uint32(Bcap) - d))
    masks = jnp.stack(masks).astype(jnp.uint32).reshape(rounds, Bc, 128)

    t0 = time.time(); a = unfused(kv0); fence(a)
    t1 = time.time(); b = kg.fold_tree(kv0, rounds, masks); fence(b)
    t2 = time.time()
    # compare head lanes only (non-head lanes differ: eager vs masked garbage)
    is_head = np.asarray(pos == start)
    av = np.asarray(kg.from_klayout(a))[is_head]
    bv = np.asarray(kg.from_klayout(b))[is_head]
    assert (av == bv).all(), "fold_tree mismatch at run heads"
    print(f"fold_tree OK  (unfused cold {t1-t0:.2f}s, fused cold {t2-t1:.2f}s)")
    # timing (warm)
    for name, f in (("unfused", lambda: fence(unfused(kv0))),
                    ("fused  ", lambda: fence(kg.fold_tree(kv0, rounds, masks)))):
        f()
        t0 = time.time()
        for _ in range(5):
            f()
        print(f"  fold {name}: {(time.time()-t0)/5*1e3:.2f} ms")


# ---------------------------------------------------------- weighted_chunks
def _decode_rows(rows):
    """(3R,) u32 jacobian row -> affine python point via the oracle."""
    X = int(fq.decode(rows[:R].reshape(1, R)))
    Y = int(fq.decode(rows[R:2 * R].reshape(1, R)))
    Z = int(fq.decode(rows[2 * R:].reshape(1, R)))
    if Z == 0:
        return None
    zi = pow(Z, -1, q)
    return (X * zi * zi % q, Y * zi * zi % q * zi % q)


def test_weighted_chunks(n, nch):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(kB, n):
        T_arr, spT, pieces = _weighted_chunks(kg, kB, n)

        def heads(arr, sp):
            rows = kg.from_klayout(arr)[: nch * sp: sp]
            return jnp.concatenate(
                [rows, jnp.zeros((128 - nch, 3 * R), jnp.uint32)])

        T = heads(T_arr, spT)
        W = None
        for arr, sp in pieces:
            h = heads(arr, sp)
            W = h if W is None else kg.from_klayout(
                kg.add(kg.to_klayout(W), kg.to_klayout(h)))
        return T, W

    rng = np.random.default_rng(1)
    m_ints = rng.integers(1, 1 << 20, size=nch * n)
    P = points_for(m_ints)
    kB = to_k(P)
    t0 = time.time()
    T, W = run(kB, n)
    fence(T)
    t1 = time.time()
    r = ops.params.r
    Tv, Wv = np.asarray(T), np.asarray(W)
    for c in range(nch):
        seg = m_ints[c * n:(c + 1) * n]
        wantT = oracle.g1_mul(int(int(seg.sum()) % r), oracle.g1)
        wantW = oracle.g1_mul(int(sum(k * int(v) for k, v in enumerate(seg)) % r),
                              oracle.g1)
        assert _decode_rows(Tv[c]) == wantT, f"T mismatch chunk {c}"
        assert _decode_rows(Wv[c]) == wantW, f"W mismatch chunk {c}"
    print(f"weighted_chunks n={n} nch={nch} OK (cold {t1-t0:.1f}s)")
    t0 = time.time()
    for _ in range(5):
        fence(run(kB, n))
    print(f"  weighted_chunks n={n} x{nch}: {(time.time()-t0)/5*1e3:.2f} ms")


# ------------------------------------------------------------- end-to-end MSM
def test_msm(logn=13):
    from zkp_tpu.msm.msm_tpu import MSMKernel
    N = 1 << logn
    r = ops.params.r
    rng = np.random.default_rng(5)
    m_ints = [int(v) for v in rng.integers(1, 1 << 16, size=N)]
    s_ints = [int.from_bytes(rng.bytes(32), "little") % r for _ in range(N)]
    P = points_for(m_ints)
    xs, ys, inf = ops.g1.to_affine(P)
    msm = MSMKernel(ops, "g1")
    t0 = time.time()
    X, Y, Z = msm(xs, ys, inf, fr.encode(s_ints, mont=False), c=12, B=64)
    fence(Z)
    t1 = time.time()
    total = sum(m * s for m, s in zip(m_ints, s_ints)) % r
    want = oracle.g1_mul(total, oracle.g1)
    zz = int(fq.decode(Z))
    assert zz != 0
    zi = pow(zz, -1, q)
    got = (int(fq.decode(X)) * zi * zi % q,
           int(fq.decode(Y)) * zi * zi % q * zi % q)
    assert got == want, "MSM result mismatch"
    print(f"MSM 2^{logn} matches oracle (cold {t1-t0:.1f}s)")


if __name__ == "__main__":
    test_fold_tree()
    test_weighted_chunks(512, 4)
    test_weighted_chunks(1 << 15, 16)
    test_msm()
