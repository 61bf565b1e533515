"""Pippenger multi-scalar multiplication, TPU-first (no random-access scatter).

Replaces ark-ec's ``VariableBaseMSM`` (the reference's hottest kernel, used
for pi_A / pi_B / pi_C / H in the prover, crates/groth16-core/src/lib.rs:275-300).

The classical GPU bucket method relies on scatter-add, which SIMD/VPU
hardware does not do.  The TPU formulation used here keeps every step either
a sort, a static-slice shift, or a batched point operation:

  per window (c bits):
    1. digit extraction from 16-bit scalar limbs (static slicing),
    2. ``lax.sort`` of (digit, index), one gather of the affine points,
    3. *blocked run scan*: reshape the sorted stream to (B, N/B) and scan B
       steps, each a (N/B)-lane batched mixed-add that either extends the
       current run's accumulator or emits it -- exactly N point-adds total,
       emitted values stream out as scan outputs (no scatter),
    4. compaction of the <= min(N, 2^c) + N/B emitted partials by a second
       sort, then a *shift-tree* segmented reduction: log2(S) rounds of
       dynamically-rolled masked adds fold every bucket's partials into its
       run head (scatter-free segmented reduce),
    5. one unique-index scatter-set (pure data movement) into the bucket
       array, then a grouped running-sum for sum_k k*B_k,
  with the windows processed MSB-first by ONE ``lax.scan`` whose body is the
  whole per-window pipeline (the graph is compiled once, not once per
  window -- compile time on a 2-vCPU host / remote TPU helper matters).

Work: ~N + O(2^c) point additions per window -- the Pippenger optimum -- with
all adds batched across VPU lanes.  Generic over the group backend, so the
same code serves G1 (Fq) and G2 (Fq2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..curve.weierstrass import Weierstrass

SENTINEL = np.uint32(0xFFFFFFFF)  # plain numpy: no device work at import time


def default_window_bits(n: int) -> int:
    """Pippenger window heuristic: c ~ log2(n) - 4, clamped to [2, 16]."""
    if n <= 16:
        return 2
    return int(min(16, max(2, n.bit_length() - 4)))


def extract_digits(scalar_limbs, w: int, c: int):
    """Window-w digit of each scalar: bits [w*c, (w+1)*c) of 16-bit limbs."""
    nl = scalar_limbs.shape[-1]
    bitpos = w * c
    li = bitpos // 16
    if li >= nl:
        return jnp.zeros(scalar_limbs.shape[:-1], dtype=jnp.uint32)
    off = bitpos % 16
    d = scalar_limbs[..., li] >> off
    have = 16 - off
    while have < c and li + 1 < nl:
        li += 1
        d = d | (scalar_limbs[..., li] << have)
        have += 16
    return d & jnp.uint32((1 << c) - 1)


def signed_digits(scalar_limbs, c: int, nbits: int | None = None):
    """Signed-window recoding: digits in [-(2^(c-1)-1), 2^(c-1)].

    Returns ``(keys, negs, nwin)`` with ``keys[w]`` = |digit| in
    [0, 2^(c-1)] and ``negs[w]`` = 1 where the digit is negative, both
    (nwin, N) u32, LSB window first.  Halves the Pippenger bucket count:
    negative digits contribute the NEGATED point (y -> -y), which is free
    for short-Weierstrass groups.

    ``nbits`` bounds the scalar values (< 2^nbits); an extra carry window
    is emitted only when the top window could overflow 2^(c-1).
    """
    nl = scalar_limbs.shape[-1]
    if nbits is None:
        nbits = 16 * nl
    nwin = -(-nbits // c)
    if nbits - (nwin - 1) * c == c:
        nwin += 1  # top digit can reach 2^(c-1)+carry; give the carry room
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    keys, negs = [], []
    carry = None
    for w in range(nwin):
        t = extract_digits(scalar_limbs, w, c)
        if carry is not None:
            t = t + carry
        carry = (t > half).astype(jnp.uint32)
        s_abs = jnp.where(carry != 0, full - t, t)
        keys.append(s_abs)
        negs.append(carry & (s_abs != 0).astype(jnp.uint32))
    return jnp.stack(keys), jnp.stack(negs), nwin


def _roll0(x, shift):
    """jnp.roll along axis 0 by a (possibly traced) negative shift."""
    return jnp.roll(x, -shift, axis=0)


def _blocked_run_scan(curve: Weierstrass, keys_t, pts_t, inf_t):
    """keys_t: (B, G); pts_t coords shaped (B, G, ...).  Returns emitted
    (keys (B+1, G), jacobian values, valid mask) -- every run's partial sums.
    """
    k = curve.k
    B, G = keys_t.shape

    def step(carry, xs):
        ckey, cval = carry
        key, (px, py), pinf = xs
        same = (key == ckey)
        extended = curve.add_mixed(cval, px, py, q_inf=pinf)
        fresh = curve.from_affine(px, py, inf=pinf)
        nval = tuple(k.select(same, e, f) for e, f in zip(extended, fresh))
        emit_valid = (~same) & (ckey != SENTINEL)
        return (key, nval), (ckey, cval, emit_valid)

    init_key = jnp.full((G,), SENTINEL, dtype=jnp.uint32)
    init_val = curve.infinity((G,))
    (fk, fv), (ekeys, evals, evalid) = jax.lax.scan(
        step, (init_key, init_val), (keys_t, pts_t, inf_t))
    # append the trailing run
    ekeys = jnp.concatenate([ekeys, fk[None]], axis=0)
    evals = tuple(jnp.concatenate([a, b[None]], axis=0) for a, b in zip(evals, fv))
    evalid = jnp.concatenate([evalid, jnp.ones((1, G), dtype=bool)], axis=0)
    return ekeys, evals, evalid


def _segment_fold_to_heads(curve: Weierstrass, keys, vals):
    """Segmented sum-to-head over a sorted key array (scatter-free).

    keys: (S,) sorted; vals: jacobian (S, ...).  ceil(log2(S)) rounds of a
    ``fori_loop`` whose body is ONE dynamically-rolled masked add (fixed
    shape, compiled once).  Position ``start(key)`` ends up holding the full
    segment sum.  Returns (vals, start).
    """
    S = keys.shape[0]
    start = jnp.searchsorted(keys, keys, side="left").astype(jnp.uint32)
    pos = jnp.arange(S, dtype=jnp.uint32)
    rel = pos - start
    rounds = max(1, int(np.ceil(np.log2(S))) if S > 1 else 1)
    iX, iY, iZ = curve.infinity()
    infs = (iX, iY, iZ)

    def body(i, vals):
        d = (jnp.uint32(1) << i.astype(jnp.uint32))
        # element j+d (rel >= d, rel % 2d == d) folds into j
        src_ok = (rel >= d) & (rel % (2 * d) == d)
        tgt_ok = _roll0(src_ok, d) & (pos < jnp.uint32(S) - d)
        shifted = tuple(_roll0(v, d) for v in vals)
        # dead sources act as identity in the masked add
        merged = curve.add(vals, shifted)
        return tuple(curve.k.select(tgt_ok, m, v) for m, v in zip(merged, vals))

    vals = jax.lax.fori_loop(0, rounds, body, vals)
    return vals, start


def _reduce_sum_fixed(curve: Weierstrass, vals, n: int):
    """Sum n jacobian points (leading axis) -> one point, fixed-shape.

    ceil(log2(n)) rounds of roll+masked add (one add in the loop body).
    """
    if n == 1:
        return tuple(v[0] for v in vals)
    pos = jnp.arange(n, dtype=jnp.uint32)
    rounds = int(np.ceil(np.log2(n)))
    iX, iY, iZ = curve.infinity()

    def body(i, vals):
        d = (jnp.uint32(1) << i.astype(jnp.uint32))
        ok = pos + d < jnp.uint32(n)
        shifted = tuple(_roll0(v, d) for v in vals)
        masked = tuple(curve.k.select(ok, s, jnp.broadcast_to(iv, s.shape))
                       for s, iv in zip(shifted, (iX, iY, iZ)))
        return curve.add(vals, masked)

    vals = jax.lax.fori_loop(0, rounds, body, vals)
    return tuple(v[0] for v in vals)


def _weighted_and_total(curve: Weierstrass, vals, n: int):
    """(T, W) = (sum_k V_k, sum_k k*V_k) for k = 0..n-1 (n a power of two).

    Hierarchical grouped running sums: each level is one lax.scan (2 adds
    per step) over m steps at n/m lanes, recursing on the per-group totals.
    Sequential depth O(m log n / log m); every loop body compiles once.
    """
    if n == 1:
        return tuple(v[0] for v in vals), curve.infinity()
    if n <= 64:
        # 1-D running-sum scan, k = n-1 .. 1
        xs = tuple(jnp.flip(v[1:], axis=0) for v in vals)
        init = (curve.infinity(), curve.infinity())

        def step(carry, bk):
            racc, wacc = carry
            racc = curve.add(racc, bk)
            wacc = curve.add(wacc, racc)
            return (racc, wacc), None

        (racc, wacc), _ = jax.lax.scan(step, init, xs)
        T = curve.add(racc, tuple(v[0] for v in vals))
        return T, wacc

    m = 64                      # scan steps per level
    G = n // m                  # lanes
    Bv = tuple(v.reshape((G, m) + v.shape[1:]) for v in vals)
    # within-group running sums, j = m-1 .. 1  (j = 0 has weight 0 in-group)
    xs = tuple(jnp.flip(v[:, 1:], axis=1).swapaxes(0, 1) for v in Bv)  # (m-1, G, ...)
    init = (curve.infinity((G,)), curve.infinity((G,)))

    def step(carry, bk):
        racc, wacc = carry
        racc = curve.add(racc, bk)
        wacc = curve.add(wacc, racc)
        return (racc, wacc), None

    (racc, wacc), _ = jax.lax.scan(step, init, xs)
    T_g = curve.add(racc, tuple(v[:, 0] for v in Bv))   # (G, ...) group totals
    W_g = wacc                                          # sum_j j*V_{g,j}
    # bucket index k = g*m + j:
    #   W = m * sum_g g*T_g + sum_g W_g ; T = sum_g T_g
    T_total, W_groups = _weighted_and_total(curve, T_g, G)
    W_within = _reduce_sum_fixed(curve, W_g, G)
    for _ in range(int(np.log2(m))):
        W_groups = curve.double(W_groups)
    W_total = curve.add(W_groups, W_within)
    return T_total, W_total


def _weighted_bucket_sum(curve: Weierstrass, buckets, c: int):
    """sum_k k * B_k over 2^c buckets (bucket 0 ignored: weight 0)."""
    _, W = _weighted_and_total(curve, buckets, 1 << c)
    return W


NAIVE_CUTOFF = 128  # below this, sort/bucket overhead loses to double-and-add


def _msm_impl(curve: Weierstrass, xs, ys, inf, scalar_limbs, c: int, block: int):
    N = xs.shape[0]
    if N <= NAIVE_CUTOFF:
        # Tiny problems (unit tests, per-device shards in the multi-chip
        # dry run): batched double-and-add + tree reduce.  Work-optimal at
        # this size and ~50x less HLO than the bucket pipeline -- XLA:CPU
        # compile time of the full Pippenger graph is minutes, which the
        # driver's dryrun budget cannot afford.
        prods = curve.scalar_mul_affine(xs, ys, inf, scalar_limbs)
        return curve.reduce_sum(prods)
    nl = scalar_limbs.shape[-1]
    nbits = 16 * nl
    nwin = -(-nbits // c)
    Npad = -(-N // block) * block

    if Npad != N:
        pad = Npad - N
        xs = jnp.concatenate([xs, jnp.zeros((pad,) + xs.shape[1:], xs.dtype)], axis=0)
        ys = jnp.concatenate([ys, jnp.zeros((pad,) + ys.shape[1:], ys.dtype)], axis=0)
        inf = jnp.concatenate([inf, jnp.ones((pad,), dtype=bool)], axis=0)
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((pad, nl), scalar_limbs.dtype)], axis=0)

    G = Npad // block
    S = min(Npad, 1 << c) + G  # compaction bound: runs + per-block partials
    nb = 1 << c
    iX, iY, iZ = curve.infinity()

    # all window digits, MSB window first: (nwin, Npad)
    digits_all = jnp.stack(
        [extract_digits(scalar_limbs, w, c) for w in range(nwin - 1, -1, -1)])
    digits_all = jnp.where(inf[None, :], jnp.uint32(0), digits_all)

    def window_body(acc, digits):
        # acc <- 2^c * acc  (uniform: doubling infinity on the first window)
        acc = jax.lax.fori_loop(0, c, lambda _, a: curve.double(a), acc)
        keys, perm = jax.lax.sort_key_val(digits, jnp.arange(Npad, dtype=jnp.uint32))
        sx = jnp.take(xs, perm, axis=0)
        sy = jnp.take(ys, perm, axis=0)
        sinf = jnp.take(inf, perm, axis=0) | (keys == 0)
        # time-major blocked layout: flat index = g*block + t -> [t, g]
        kt = keys.reshape(G, block).swapaxes(0, 1)
        xt = sx.reshape((G, block) + sx.shape[1:]).swapaxes(0, 1)
        yt = sy.reshape((G, block) + sy.shape[1:]).swapaxes(0, 1)
        it = sinf.reshape(G, block).swapaxes(0, 1)
        ekeys, evals, evalid = _blocked_run_scan(curve, kt, (xt, yt), it)
        # flatten back to run order: emit[t, g] belongs to block g at time t
        fkeys = ekeys.swapaxes(0, 1).reshape(-1)
        fvals = tuple(v.swapaxes(0, 1).reshape((-1,) + v.shape[2:]) for v in evals)
        fvalid = evalid.swapaxes(0, 1).reshape(-1)
        # compact: dead slots get SENTINEL keys and sort to the end
        ckeys = jnp.where(fvalid & (fkeys != 0), fkeys, SENTINEL)
        ckeys, cperm = jax.lax.sort_key_val(
            ckeys, jnp.arange(ckeys.shape[0], dtype=jnp.uint32))
        ckeys = ckeys[:S]
        cvals = tuple(jnp.take(v, cperm[:S], axis=0) for v in fvals)
        # kill dead payloads (so stray adds keep identity semantics)
        dead = ckeys == SENTINEL
        cvals = tuple(curve.k.select(dead, jnp.broadcast_to(i, v.shape), v)
                      for v, i in zip(cvals, (iX, iY, iZ)))
        # fold partial run sums into run heads
        rvals, start = _segment_fold_to_heads(curve, ckeys, cvals)
        pos = jnp.arange(S, dtype=jnp.uint32)
        is_head = (pos == start) & ~dead
        # unique-index scatter-set into the bucket table (data movement only)
        tgt = jnp.where(is_head, ckeys, jnp.uint32(nb))
        buckets = tuple(
            jnp.zeros((nb + 1,) + v.shape[1:], v.dtype).at[tgt].set(v)[:nb]
            for v in rvals)
        # bucket 0 never contributes (weight 0); ensure it is identity anyway
        buckets = tuple(b.at[0].set(jnp.broadcast_to(i, b[0].shape))
                        for b, i in zip(buckets, (iX, iY, iZ)))
        win_sum = _weighted_bucket_sum(curve, buckets, c)
        return curve.add(acc, win_sum), None

    acc, _ = jax.lax.scan(window_body, curve.infinity(), digits_all)
    return acc


@functools.lru_cache(maxsize=None)
def _jit_msm(curve: Weierstrass):
    """One jitted MSM callable per curve object.  jax.jit keys its executable
    cache on function identity; a fresh ``jax.jit(partial(...))`` per MSM
    instance made every test's Prover recompile the multi-minute scan modules
    (``curve_ops`` is lru_cached, so the curve object is shared)."""
    return jax.jit(functools.partial(_msm_impl, curve),
                   static_argnames=("c", "block"))


class MSM:
    """Jitted MSM entry point bound to one group (G1 or G2)."""

    def __init__(self, curve: Weierstrass):
        self.curve = curve
        self._jit = _jit_msm(curve)

    def __call__(self, xs, ys, inf, scalar_limbs, c: int | None = None,
                 block: int | None = None):
        n = xs.shape[0]
        if c is None:
            c = default_window_bits(n)
        if block is None:
            block = int(min(512, max(8, n // 128)))
        return self._jit(xs, ys, inf, scalar_limbs, c=int(c), block=int(block))

    def naive(self, xs, ys, inf, scalar_limbs):
        """Reference path: batched scalar-mul + tree reduce (tests only)."""
        P = self.curve.from_affine(xs, ys, inf=inf)
        prods = self.curve.scalar_mul(P, scalar_limbs)
        return self.curve.reduce_sum(prods)
