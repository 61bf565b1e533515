"""Per-phase timing of the kernelized MSM window pipeline at 2^20.

Mirrors msm_tpu.msm_tpu's window_body phase by phase (signed digits,
boundary-only fold) with realistic key distributions, so each phase's cost
can be attributed.  Run on TPU hardware.
"""
import time, sys, os, functools
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.curve.pkernels import KGroup, SENTINEL
from zkp_tpu.msm.msm_tpu import _kroll, _mask_k, _weighted_chunks
from zkp_tpu.msm.pippenger import signed_digits

ops = curve_ops("bls12_381")
fq, fr = ops.fq, ops.fr
kg = KGroup(ops.params.q, fq.n, "g1", st=8)
R = kg.R

def fence(out):
    return jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])

def timed(name, f, *a, iters=3):
    fence(f(*a))
    best = 1e9
    for _ in range(iters):
        t0 = time.time(); fence(f(*a)); best = min(best, time.time() - t0)
    print(f"{name:<40s} {best*1e3:9.2f} ms", flush=True)
    return best

N = 1 << 20
c, B = 16, 512
G = N // B
S = G // 128
half = 1 << (c - 1)
Scap = -(-(min(N, half) + G) // 1024) * 1024
Bcap = min(-(-2 * G // 1024) * 1024, Scap)
Bc = Bcap // 128
rng = np.random.default_rng(0)
PCR = kg.k.PCR
PW16 = -(-(4 * PCR + 2) // 64) * 64

pa16 = jnp.asarray(rng.integers(0, 1 << 16, size=(N, PW16), dtype=np.uint16))
PW = PW16 // 2
scal = jnp.asarray(rng.integers(0, 1 << 16, size=(N, fr.n), dtype=np.uint32))
keys_lsb, negs_lsb, nwin = jax.jit(functools.partial(signed_digits, c=c, nbits=255))(scal)
nwin = int(nwin)   # concrete python int (f_w reshapes need a static value)
print(f"N=2^20 c={c} B={B} G={G} nwin={nwin} Scap={Scap} Bcap={Bcap}", flush=True)
digits = keys_lsb[0]
negs = negs_lsb[0]

timed("signed digit recode (all windows)",
      jax.jit(functools.partial(signed_digits, c=c, nbits=255)), scal)

# 1. sort
f_sort = jax.jit(lambda d: jax.lax.sort_key_val(d, jnp.arange(N, dtype=jnp.uint32)))
timed("sort digits", f_sort, digits)
keys, perm = f_sort(digits)

# 2. gather u16 rows (128 B; u32 rows below 256 B hit a 2-3x cliff), then
# ONE bitcast to u32 pairs (matches msm_tpu.window_body)
f_g0 = jax.jit(lambda pa, perm: jax.lax.bitcast_convert_type(
    jnp.take(pa, perm, axis=0).reshape(N, PW16 // 2, 2), jnp.uint32))
f_g16 = jax.jit(lambda pa, perm: jnp.take(pa, perm, axis=0))
timed("gather u16 rows only", f_g16, pa16, perm)
timed("gather u16 + bitcast u32 pairs", f_g0, pa16, perm)
rows = f_g0(pa16, perm)

# 3. relayout (+ key and neg-mask rows; negation happens in the scan kernel)
def f_rel(rows, keys, negs):
    rows_t = rows.reshape(G, B, PW).transpose(1, 2, 0)[:, :2 * PCR + 1]
    keys_t = keys.reshape(G, B).T[:, None, :]
    negs_t = negs.reshape(G, B).T[:, None, :].astype(jnp.uint32)
    A_key = jnp.concatenate([rows_t, keys_t, negs_t], axis=1)
    return A_key.reshape(B, 2 * PCR + 3, S, 128)
f_rel = jax.jit(f_rel)
timed("relayout to time-major klayout", f_rel, rows, keys, negs)
A_key = f_rel(rows, keys, negs)

# 4. run scan (+ a B=256 variant: steps halve, lanes double -> latency test)
timed("run_scan kernel (N adds)", kg.run_scan, A_key)
emits, ekeys, evalid, facc, fkey = kg.run_scan(A_key)
try:
    B2 = B // 2
    A2 = A_key.reshape(B2, 2, 2 * kg.k.PCR + 3, S, 128)
    A2 = jnp.concatenate([A2[:, 0], A2[:, 1]], axis=2)   # (B/2, rows, 2S, 128)
    timed("run_scan at B=256 (2x lanes)", kg.run_scan, A2)
except Exception as e:
    print(f"B=256 variant failed: {e}", flush=True)

# 5. emit flatten + compaction (emits are u16-pair PACKED: PJ rows)
PJ = (3 * R + 1) // 2
def f_comp(emits, ekeys, evalid, facc, fkey):
    em = jnp.concatenate([emits, facc[None]], axis=0)
    ek = jnp.concatenate([ekeys, fkey[None]], axis=0)
    ev_ = jnp.concatenate([evalid, jnp.ones_like(evalid[:1])], axis=0)
    Bp = B + 1
    ev = ev_.reshape(Bp, G) != 0
    first_valid = ev & (jnp.cumsum(ev.astype(jnp.uint32), axis=0) == 1)
    tpos = jnp.arange(Bp, dtype=jnp.uint32)[:, None]
    boundary = first_valid | (tpos == jnp.uint32(B))
    e_rows = em.reshape(Bp, PJ, G).transpose(0, 2, 1).reshape(Bp * G, PJ)
    e_keys = ek.reshape(Bp, G).reshape(Bp * G)
    e_val = ev.reshape(Bp * G)
    e_bnd = boundary.reshape(Bp * G)
    live = e_val & (e_keys != 0)
    ckeys = jnp.where(live, e_keys, SENTINEL)
    ckeys, cperm = jax.lax.sort_key_val(
        ckeys, jnp.arange(Bp * G, dtype=jnp.uint32))
    ckeys = ckeys[:Scap]
    packed = jnp.take(e_rows, cperm[:Scap], axis=0)
    bnd = jnp.take(e_bnd, cperm[:Scap], axis=0)
    part = jnp.stack([packed & jnp.uint32(0xFFFF), packed >> 16],
                     axis=-1).reshape(Scap, 2 * PJ)[:, :3 * R]
    return ckeys, part, bnd
f_comp = jax.jit(f_comp)
timed("emit flatten + compact sort + takes", f_comp, emits, ekeys, evalid, facc, fkey)
ckeys, part, bnd = f_comp(emits, ekeys, evalid, facc, fkey)
inf_row = kg.from_klayout(kg.jac_infinity(1))[:1]

# 6. boundary sort + fold
def f_fold(ckeys, part, bnd):
    dead = ckeys == SENTINEL
    part = jnp.where(dead[:, None], inf_row, part)
    bkeys = jnp.where(bnd & ~dead, ckeys, SENTINEL)
    bkeys, bperm = jax.lax.sort_key_val(
        bkeys, jnp.arange(Scap, dtype=jnp.uint32))
    bkeys = bkeys[:Bcap]
    bpart = jnp.take(part, bperm[:Bcap], axis=0)
    bdead = bkeys == SENTINEL
    bpart = jnp.where(bdead[:, None], inf_row, bpart)
    kv = kg.to_klayout(bpart)
    start = jnp.searchsorted(bkeys, bkeys, side="left").astype(jnp.uint32)
    pos = jnp.arange(Bcap, dtype=jnp.uint32)
    rel = pos - start
    rounds = int(np.ceil(np.log2(max(Bcap, 2))))
    def fold_body(i, kv):
        d = (jnp.uint32(1) << i.astype(jnp.uint32))
        src_ok = (rel >= d) & (rel % (2 * d) == d)
        tgt_ok = jnp.roll(src_ok, -d) & (pos < jnp.uint32(Bcap) - d)
        shifted = _kroll(kv, -d)
        return kg.add_masked(kv, shifted, _mask_k(tgt_ok, Bc))
    kv = jax.lax.fori_loop(0, rounds, fold_body, kv)
    return kv, bkeys, start, pos
f_fold = jax.jit(f_fold)
timed("boundary sort + fold", f_fold, ckeys, part, bnd)
kv, bkeys, bstart, bpos = f_fold(ckeys, part, bnd)

# 7. scatters
def f_scat(ckeys, part, bnd, kv, bkeys, bstart, bpos):
    dead = ckeys == SENTINEL
    tgt = jnp.where(~dead & ~bnd, ckeys - 1, jnp.uint32(half))
    buckets = jnp.tile(inf_row, (half + 1, 1)).at[tgt].set(part)[:half]
    heads = kg.from_klayout(kv)
    bdead = bkeys == SENTINEL
    is_head = (bpos == bstart) & ~bdead
    btgt = jnp.where(is_head, bkeys - 1, jnp.uint32(half))
    buckets = jnp.concatenate([buckets, inf_row], axis=0).at[btgt].set(heads)[:half]
    return buckets
f_scat = jax.jit(f_scat)
timed("bucket scatters (complete + heads)", f_scat, ckeys, part, bnd, kv,
      bkeys, bstart, bpos)
buckets = f_scat(ckeys, part, bnd, kv, bkeys, bstart, bpos)

# 8. weighted total: batched over all nwin windows at once (one pass/MSM)
buckets_all = jnp.broadcast_to(buckets[None], (nwin,) + buckets.shape)
def f_w(ball):
    kB = kg.to_klayout(ball.reshape(nwin * half, 3 * R))
    T_arr, spT, pieces = _weighted_chunks(kg, kB, half)
    def heads(arr, sp):
        rows = kg.from_klayout(arr)[: nwin * sp: sp]
        rows = jnp.concatenate([rows, jnp.zeros((128 - nwin, 3 * R), jnp.uint32)])
        return kg.to_klayout(rows)
    win = heads(T_arr, spT)
    for arr, sp in pieces:
        win = kg.add(win, heads(arr, sp))
    return win
f_w = jax.jit(f_w)
timed("weighted bucket sums (all windows)", f_w, buckets_all)

# 9. window doubling
acc = kg.jac_infinity(1)
timed("double_n(c) between windows", functools.partial(kg.double_n, n=c), acc)
