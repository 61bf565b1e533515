"""Interpret-mode A/B: packed run_scan vs the XLA blocked run scan (toy G1).

Emitted run partials must be bit-identical; trailing accumulators compare
as POINTS (any (_, _, 0) is infinity -- the kernel canonicalizes fresh
infinity lanes to (1, 1, 0), the XLA path keeps (x, y, 0)).
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import kgroup
from zkp_tpu.msm.msm_tpu import MSMKernel
from zkp_tpu.msm.pippenger import _blocked_run_scan
from zkp_tpu.ref.pyref import CurveRef

ops = curve_ops("toy_bn3")
fq, fr = ops.fq, ops.fr
ref = CurveRef(ops.params)
N, B = 256, 2
G = N // B   # 128 lanes, S=1
rng = np.random.default_rng(0)
ks = [int(k) % ops.params.r for k in rng.integers(1, 1 << 20, size=N)]
pts = [ref.g1_mul(k, ref.g1) for k in ks]
xs = fq.encode([p[0] for p in pts])
ys = fq.encode([p[1] for p in pts])
inf = jnp.zeros((N,), bool).at[5].set(True)
keys = jnp.asarray(rng.integers(1, 6, size=N).astype(np.uint32))
keys = jnp.sort(keys.reshape(G, B), axis=1).reshape(G, B)  # sorted per column over time
negm = jnp.asarray((rng.integers(0, 2, size=N)).astype(np.uint32)).reshape(G, B)

mk = MSMKernel(ops, "g1")
kg = mk.kg
pa = mk.pack(xs, ys, inf)
PW16 = pa.shape[1]
pa32 = jax.lax.bitcast_convert_type(pa.reshape(N, PW16 // 2, 2), jnp.uint32)
PCR = kg.k.PCR
rows_t = pa32.reshape(G, B, pa32.shape[1]).transpose(1, 2, 0)[:, :2 * PCR + 1]
keys_t = keys.T[:, None, :]
negs_t = negm.T[:, None, :]
A_key = jnp.concatenate([rows_t, keys_t, negs_t], axis=1).reshape(B, 2 * PCR + 3, 1, 128)
emits, ekeys, evalid, facc, fkey = kg.run_scan(A_key)

# XLA reference on the same (negated) stream
q = ops.params.q
ys_neg = jnp.where((negm.reshape(N, 1) != 0) & (jnp.sum(ys, 1, keepdims=True) != 0) & ~inf[:, None],
                   fq.neg(ys), ys)
kt = keys.reshape(G, B).swapaxes(0, 1)
xt = xs.reshape(G, B, -1).swapaxes(0, 1)
yt = ys_neg.reshape(G, B, -1).swapaxes(0, 1)
it = inf.reshape(G, B).swapaxes(0, 1)
ek2, ev2, evd2 = _blocked_run_scan(ops.g1, kt, (xt, yt), it)

# compare emits: kernel emits are u16-pair PACKED (B, PJ, S, 128); unpack
R = kg.R
PJ = emits.shape[1]
pk_ = np.asarray(emits).reshape(B, PJ, G)
ker_em = np.empty((B, 3 * R, G), dtype=np.uint32)
for r in range(3 * R):
    w = pk_[:, r // 2]
    ker_em[:, r] = (w & 0xFFFF) if r % 2 == 0 else (w >> 16)
ok = True
for t in range(B):
    for g in range(0, G, 17):
        kx = [int(v) for v in ker_em[t, :R, g]]
        X2 = np.asarray(ev2[0][t, g]); Y2 = np.asarray(ev2[1][t, g]); Z2 = np.asarray(ev2[2][t, g])
        valid_k = int(np.asarray(evalid).reshape(B, G)[t, g])
        valid_x = bool(np.asarray(evd2[t, g]))
        if valid_k != valid_x:
            print("VALID MISMATCH", t, g, valid_k, valid_x); ok = False; continue
        if valid_k:
            same = (kx == [int(v) for v in X2]
                    and [int(v) for v in ker_em[t, R:2*R, g]] == [int(v) for v in Y2]
                    and [int(v) for v in ker_em[t, 2*R:, g]] == [int(v) for v in Z2])
            if not same:
                print("EMIT MISMATCH", t, g); ok = False
# trailing accumulators (packed)
fp_ = np.asarray(facc).reshape(PJ, G)
fk = np.empty((3 * R, G), dtype=np.uint32)
for r in range(3 * R):
    w = fp_[r // 2]
    fk[r] = (w & 0xFFFF) if r % 2 == 0 else (w >> 16)
fX, fY, fZ = np.asarray(ek2[B]), None, None  # ekeys[B] = trailing keys
tk_k = np.asarray(fkey).reshape(G)
tk_x = np.asarray(ek2[B])
print("trailing keys match:", bool((tk_k == tk_x).all()))
tv = [np.asarray(v[B]) for v in ev2]
mismatch = 0
for g in range(G):
    kz = [int(v) for v in fk[2*R:, g]]
    xz = [int(x) for x in tv[2][g]]
    if sum(kz) == 0 and sum(xz) == 0:
        continue  # both infinity: representations may differ
    if not ([int(v) for v in fk[:R, g]] == [int(x) for x in tv[0][g]]
            and [int(v) for v in fk[R:2*R, g]] == [int(x) for x in tv[1][g]]
            and kz == xz):
        mismatch += 1
print("trailing acc mismatches:", mismatch)
print("OK" if ok and mismatch == 0 else "FAIL")

assert ok and mismatch == 0, "packed run_scan A/B failed"
