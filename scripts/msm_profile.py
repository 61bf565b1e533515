"""Per-phase timing of the kernelized MSM window pipeline at 2^20."""
import time, sys, os, functools
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax, jax.numpy as jnp
import numpy as np

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import KGroup, SENTINEL
from zkp_tpu.msm.msm_tpu import (MSMKernel, _kroll, _mask_k, _weighted_total,
                                 _reduce_lanes)
from zkp_tpu.msm.pippenger import extract_digits

ops = curve_ops("bls12_381")
fq, fr = ops.fq, ops.fr
kg = KGroup(ops.params.q, fq.n, "g1", st=8)
R = kg.R

def fence(out):
    return jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])

def timed(name, f, *a, iters=2):
    fence(f(*a))
    best = 1e9
    for _ in range(iters):
        t0 = time.time(); fence(f(*a)); best = min(best, time.time() - t0)
    print(f"{name:<38s} {best*1e3:9.1f} ms", flush=True)
    return best

N = 1 << 20
c, B = 16, 128
G = N // B
S = G // 128
nb = 1 << c
rng = np.random.default_rng(0)

pa = jnp.asarray(rng.integers(0, 1 << 16, size=(N, 2 * R + 1), dtype=np.uint32))
scal = jnp.asarray(rng.integers(0, 1 << 16, size=(N, fr.n), dtype=np.uint32))
digits = extract_digits(scal, 0, c)

# 1. sort
f_sort = jax.jit(lambda d: jax.lax.sort_key_val(d, jnp.arange(N, dtype=jnp.uint32)))
timed("sort digits (2^20)", f_sort, digits)
keys, perm = f_sort(digits)

# 2. gather
f_g = jax.jit(lambda pa, perm: jnp.take(pa, perm, axis=0))
timed("gather (2^20, 49)", f_g, pa, perm)
rows = f_g(pa, perm)

# 3. relayout to time-major klayout
def relayout(rows, keys):
    rows_t = rows.reshape(G, B, 2 * R + 1).transpose(1, 2, 0)
    keys_t = keys.reshape(G, B).T[:, None, :]
    A_key = jnp.concatenate([rows_t, keys_t], axis=1)
    return A_key.reshape(B, 2 * R + 2, S, 128)
f_rl = jax.jit(relayout)
timed("relayout in (B,2R+2,S,128)", f_rl, rows, keys)
A_key = f_rl(rows, keys)

# 4. run scan
def runscan(A_key):
    acc0 = kg.jac_infinity(S)
    ck0 = jnp.full((1, S, 128), SENTINEL, dtype=jnp.uint32)
    (facc, fkey), (emits, ekeys, evalid) = jax.lax.scan(kg.run_step, (acc0, ck0), A_key)
    return facc, emits
f_rs = jax.jit(runscan)
timed(f"run scan (B={B} x {G} lanes)", f_rs, A_key)

# 4b. one run_step kernel alone
acc0 = kg.jac_infinity(S)
ck0 = jnp.full((1, S, 128), SENTINEL, dtype=jnp.uint32)
one = A_key[0]
f_1 = jax.jit(lambda a, ck, x: kg.run_step((a, ck), x))
t1 = timed("single run_step", f_1, acc0, ck0, one, iters=3)

# 5. emit flatten + compaction
facc, emits = f_rs(A_key)
Bp = B + 1
Scap = -(-(min(N, nb) + G) // 1024) * 1024
def compact(emits, keys):
    e_rows = emits.reshape(B, 3 * R, G).transpose(2, 0, 1).reshape(B * G, 3 * R)
    ckeys = jnp.where(keys[:B * G] != 0, keys[:B * G], SENTINEL)
    sk, cperm = jax.lax.sort_key_val(ckeys, jnp.arange(B * G, dtype=jnp.uint32))
    part = jnp.take(e_rows, cperm[:Scap], axis=0)
    return sk[:Scap], part
f_cp = jax.jit(compact)
timed("emit flatten+sort+gather", f_cp, emits, digits)
ck, part = f_cp(emits, digits)

# 6. fold
Sc = Scap // 128
def fold(ckeys, part):
    kv = kg.to_klayout(part)
    start = jnp.searchsorted(ckeys, ckeys, side="left").astype(jnp.uint32)
    pos = jnp.arange(Scap, dtype=jnp.uint32)
    rel = pos - start
    rounds = int(np.ceil(np.log2(Scap)))
    def body(i, kv):
        d = (jnp.uint32(1) << i.astype(jnp.uint32))
        src_ok = (rel >= d) & (rel % (2 * d) == d)
        tgt_ok = jnp.roll(src_ok, -d) & (pos < jnp.uint32(Scap) - d)
        return kg.add_masked(kv, _kroll(kv, -d), _mask_k(tgt_ok, Sc))
    return jax.lax.fori_loop(0, rounds, body, kv)
f_fold = jax.jit(fold)
timed(f"segment fold ({Scap} x {int(np.ceil(np.log2(Scap)))} rounds)", f_fold, ck, part)

# 7. scatter + weighted sum
inf_row = kg.from_klayout(kg.jac_infinity(1))[:1]
def wsum(heads, ckeys):
    pos = jnp.arange(Scap, dtype=jnp.uint32)
    start = jnp.searchsorted(ckeys, ckeys, side="left").astype(jnp.uint32)
    is_head = (pos == start) & (ckeys != SENTINEL)
    tgt = jnp.where(is_head, ckeys, jnp.uint32(nb))
    buckets = jnp.tile(inf_row, (nb + 1, 1)).at[tgt].set(heads)[:nb]
    kB = kg.to_klayout(buckets)
    _, W = _weighted_total(kg, kB, nb)
    return W
heads = kg.from_klayout(f_fold(ck, part))
f_ws = jax.jit(wsum)
timed(f"scatter+weighted sum ({nb} buckets)", f_ws, heads, ck)

# 8. acc doubling chain
f_dbl = jax.jit(lambda a: jax.lax.fori_loop(0, c, lambda _, x: kg.double(x), a))
timed("acc <<= c (16 doubles, 1 lane)", f_dbl, kg.jac_infinity(1))
