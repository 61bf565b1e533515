"""TPU-kernelized Pippenger MSM: XLA data movement + Pallas point kernels.

Same algorithm as ``pippenger._msm_impl`` (sort -> blocked run scan ->
compaction -> segment fold -> bucket scatter -> weighted sum), but every
point operation is a Pallas kernel on klayout arrays (curve/pkernels.py)
and point data moves as single packed rows:

  packed affine row  = [x limbs | y limbs | inf] : (N, 2R+1) u32
  packed jac row     = [X | Y | Z]               : (N, 3R) u32

so each window pays exactly ONE big gather.  Replaces ark-ec
VariableBaseMSM (crates/groth16-core/src/lib.rs:275-300) as the prover's
flagship kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..curve.pkernels import KGroup, SENTINEL
from .pippenger import extract_digits


def _kroll(karr, shift):
    """Roll klayout (rows, S, 128) along the flattened lane axis."""
    rows, S, _ = karr.shape
    flat = karr.reshape(rows, S * 128)
    return jnp.roll(flat, shift, axis=1).reshape(rows, S, 128)


def _mask_k(mask_flat, S):
    """(S*128,) bool/int -> (1, S, 128) u32 mask row."""
    return mask_flat.astype(jnp.uint32).reshape(1, S, 128)


def _reduce_lanes(kg: KGroup, kP, n: int):
    """Sum the first n lanes of a klayout jac batch -> lane 0 holds the total."""
    S = kP.shape[1]
    pos = jnp.arange(S * 128, dtype=jnp.uint32)
    r = 1
    while r < n:
        ok = (pos + r < n) & (pos % (2 * r) == 0)
        kP = kg.add_masked(kP, _kroll(kP, -r), _mask_k(ok, S))
        r *= 2
    return kP


def _weighted_total(kg: KGroup, kB, n: int):
    """(T, W) with T = sum_k V_k, W = sum_k k*V_k over n klayout lanes.

    Slab recursion: view lanes as (m slabs) x (G lanes), k = j*G + g.
    A scan over slabs (contiguous lane slices) gives per-lane column totals
    C_g = sum_j V_{j,g} and column-weighted Wc_g = sum_j j*V_{j,g}; then
      W = G * sum_g Wc_g + sum_g g*C_g ,  T = sum_g C_g,
    recursing on (C, G).  All adds are full-lane Pallas kernels.
    Returns klayout arrays whose lane 0 holds the results.
    """
    S = kB.shape[1]
    assert S * 128 == n or n <= S * 128
    if n <= 128:
        # single block: W via bit decomposition of k (c_small masked reduces)
        pos = jnp.arange(S * 128, dtype=jnp.uint32)
        T = _reduce_lanes(kg, kB, n)
        W = None
        b = 0
        while (1 << b) < n:
            mask = ((pos & (1 << b)) != 0) & (pos < n)
            sel = jnp.where(mask[None, :].reshape(1, S, 128) != 0, kB,
                            kg.jac_infinity(S))
            red = _reduce_lanes(kg, sel, n)
            for _ in range(b):
                red = kg.double(red)
            W = red if W is None else kg.add(W, red)
            b += 1
        if W is None:
            W = kg.jac_infinity(S)
        return T[:, :1, :], W[:, :1, :]   # lane 0 holds the results

    G = max(128, n // 64)     # lanes per slab-scan level (>= one vreg block)
    m = n // G                # slabs
    Sg = G // 128
    # slabs: (m, 3R, Sg, 128); ONE fused Pallas call scans them j = m-1 .. 0
    xs = kB.reshape(3 * kg.R, m, Sg, 128).swapaxes(0, 1)
    C, wc = kg.weighted_scan(xs)  # C = sum_j V_j ; wc = sum_{j>=1} j*V_{j,g}
    T2, Wg = _weighted_total(kg, C, G)     # recurse on columns (S=1 results)
    # W = G * (sum_g Wc_g)  +  (sum_g g * C_g)
    WcG = _reduce_lanes(kg, wc, G)[:, :1, :]
    for _ in range(int(np.log2(G))):
        WcG = kg.double(WcG)
    W = kg.add(WcG, Wg)
    return T2, W


def _lane0(kg: KGroup, kP):
    """Extract lane 0 of a klayout jac batch as a (3R, 1, 128) block."""
    return kP[:, :1, :]


@functools.partial(jax.jit, static_argnames=("kg", "c", "B"))
def msm_tpu(kg: KGroup, packed_affine, scalar_limbs, c: int = 16, B: int = 128):
    """packed_affine: (N, 2R+1) u32 [x|y|inf]; scalars (N, nl) 16-bit limbs.

    Returns a packed jacobian row (1, 3R) = the MSM result.
    N must be a multiple of 128*B/... (callers pad; see MSMKernel).
    """
    N = packed_affine.shape[0]
    R = kg.R
    nl = scalar_limbs.shape[-1]
    nwin = -(-16 * nl // c)
    G = N // B
    S = G // 128
    nb = 1 << c
    assert c >= 7, "kernelized MSM needs >= 128 buckets (use the small-N path)"
    Scap = min(N, nb) + G            # compaction bound
    Scap = -(-Scap // 1024) * 1024   # klayout-friendly (128 lanes x st=8)
    Sc = Scap // 128

    inf_col = packed_affine[:, 2 * R] != 0
    digits_all = jnp.stack(
        [extract_digits(scalar_limbs, w, c) for w in range(nwin - 1, -1, -1)])
    digits_all = jnp.where(inf_col[None, :], jnp.uint32(0), digits_all)

    def window_body(acc, digits):
        # acc <- 2^c acc
        acc = jax.lax.fori_loop(0, c, lambda _, a: kg.double(a), acc)
        keys, perm = jax.lax.sort_key_val(digits, jnp.arange(N, dtype=jnp.uint32))
        rows = jnp.take(packed_affine, perm, axis=0)          # THE gather
        # time-major klayout: element n -> (g = n // B, t = n % B)
        PW = packed_affine.shape[1]
        rows_t = rows.reshape(G, B, PW).transpose(1, 2, 0)[:, :2 * R + 1]  # (B, 2R+1, G)
        keys_t = keys.reshape(G, B).T[:, None, :]                   # (B, 1, G)
        A_key = jnp.concatenate([rows_t, keys_t], axis=1)           # (B, 2R+2, G)
        A_key = A_key.reshape(B, 2 * R + 2, S, 128)

        emits, ekeys, evalid, facc, fkey = kg.run_scan(A_key)
        # append trailing run
        emits = jnp.concatenate([emits, facc[None]], axis=0)        # (B+1, 3R, S, 128)
        ekeys = jnp.concatenate([ekeys, fkey[None]], axis=0)        # (B+1, 1, S, 128)
        evalid = jnp.concatenate(
            [evalid, jnp.ones_like(evalid[:1])], axis=0)
        # flatten to run order (emit of column g at time t -> flat g*(B+1)+t)
        Bp = B + 1
        e_rows = emits.reshape(Bp, 3 * R, G).transpose(2, 0, 1).reshape(Bp * G, 3 * R)
        e_keys = ekeys.reshape(Bp, G).T.reshape(Bp * G)
        e_val = evalid.reshape(Bp, G).T.reshape(Bp * G) != 0

        ckeys = jnp.where(e_val & (e_keys != 0), e_keys, SENTINEL)
        ckeys, cperm = jax.lax.sort_key_val(
            ckeys, jnp.arange(Bp * G, dtype=jnp.uint32))
        take_n = min(Scap, Bp * G)
        ckeys = ckeys[:take_n]
        part = jnp.take(e_rows, cperm[:take_n], axis=0)             # (take_n, 3R)
        inf_row = kg.from_klayout(kg.jac_infinity(1))[:1]           # (1, 3R)
        if take_n < Scap:   # klayout wants 1024-lane multiples
            ckeys = jnp.concatenate(
                [ckeys, jnp.full((Scap - take_n,), SENTINEL, jnp.uint32)])
            part = jnp.concatenate(
                [part, jnp.tile(inf_row, (Scap - take_n, 1))], axis=0)
        dead = ckeys == SENTINEL
        # dead payloads -> infinity (identity for adds)
        part = jnp.where(dead[:, None], inf_row, part)

        # segment fold to run heads (scatter-free), klayout throughout
        kv = kg.to_klayout(part)                                    # (3R, Sc, 128)
        start = jnp.searchsorted(ckeys, ckeys, side="left").astype(jnp.uint32)
        pos = jnp.arange(Scap, dtype=jnp.uint32)
        rel = pos - start
        # a bucket contributes at most one partial per column -> max segment
        # length G, so ceil(log2(G)) fold rounds suffice
        rounds = int(np.ceil(np.log2(max(G, 2))))

        def fold_body(i, kv):
            d = (jnp.uint32(1) << i.astype(jnp.uint32))
            src_ok = (rel >= d) & (rel % (2 * d) == d)
            tgt_ok = jnp.roll(src_ok, -d) & (pos < jnp.uint32(Scap) - d)
            shifted = _kroll(kv, -d)
            return kg.add_masked(kv, shifted, _mask_k(tgt_ok, Sc))

        kv = jax.lax.fori_loop(0, rounds, fold_body, kv)
        heads = kg.from_klayout(kv)                                 # (Scap, 3R)
        is_head = (pos == start) & ~dead
        tgt = jnp.where(is_head, ckeys, jnp.uint32(nb))
        buckets = jnp.tile(inf_row, (nb + 1, 1)).at[tgt].set(heads)[:nb]
        buckets = buckets.at[0].set(inf_row[0])                     # weight 0 anyway

        kB = kg.to_klayout(buckets)                                 # (3R, nb/128, 128)
        _, W = _weighted_total(kg, kB, nb)
        win = _lane0(kg, W)
        return kg.add(acc, win), None

    acc0 = kg.jac_infinity(1)
    acc, _ = jax.lax.scan(window_body, acc0, digits_all)
    return kg.from_klayout(acc)[:1]                                 # (1, 3R)


class FixedBaseKernel:
    """Kernelized fixed-base windowed scalar-mul (trusted-setup workhorse).

    Wraps a curve.fixed_base.FixedBaseTable: the window table is packed as
    256B-aligned affine rows; each scalar costs nwin gathers + nwin Pallas
    mixed adds (sequential fori, batched over all N lanes).
    """

    def __init__(self, curve_ops, which: str = "g1", st: int = 8):
        self.ops = curve_ops
        self.which = which
        fq = curve_ops.fq
        self.kg = KGroup(curve_ops.params.q, fq.n, which, st=st)
        tab = (curve_ops.g1_fixed_base() if which == "g1"
               else curve_ops.g2_fixed_base())
        self.c = tab.c
        self.nwin = tab.nwin
        R = self.kg.R
        nrows = tab.tx.shape[0] * tab.tx.shape[1]
        w = 2 * R + 1
        pw = -(-w // 64) * 64
        self.table = jnp.concatenate([
            tab.tx.reshape(nrows, R), tab.ty.reshape(nrows, R),
            tab.tinf.reshape(nrows, 1).astype(jnp.uint32),
            jnp.zeros((nrows, pw - w), jnp.uint32)], axis=1)

    def __call__(self, scalar_limbs):
        """(N, nl) standard-form scalars -> jacobian tuple of (N, ...) arrays."""
        kg = self.kg
        R = kg.R
        N = scalar_limbs.shape[0]
        blk = 128 * kg.st
        Npad = -(-N // blk) * blk
        if Npad != N:
            scalar_limbs = jnp.concatenate(
                [scalar_limbs,
                 jnp.zeros((Npad - N, scalar_limbs.shape[1]), jnp.uint32)], axis=0)
        out = _fixed_base_impl(kg, self.table, scalar_limbs,
                               c=self.c, nwin=self.nwin)
        X, Y, Z = out[:, :R], out[:, R:2 * R], out[:, 2 * R:]
        sd = (2, self.ops.fq.n) if self.which == "g2" else (self.ops.fq.n,)
        return (X[:N].reshape((N,) + sd), Y[:N].reshape((N,) + sd),
                Z[:N].reshape((N,) + sd))


@functools.partial(jax.jit, static_argnames=("kg", "c", "nwin"))
def _fixed_base_impl(kg: KGroup, table, scalar_limbs, c: int, nwin: int):
    N = scalar_limbs.shape[0]
    R = kg.R
    S = N // 128
    digs = jnp.stack([extract_digits(scalar_limbs, w, c)
                      for w in range(nwin)], axis=1)        # (N, nwin)

    def body(w, acc):
        idx = digs[:, w] * jnp.uint32(nwin) + jnp.uint32(w)
        rows = jnp.take(table, idx, axis=0)                  # (N, PW)
        A = kg.to_klayout(rows[:, :2 * R + 1])
        return kg.add_mixed(acc, A)

    acc = jax.lax.fori_loop(0, nwin, body, kg.jac_infinity(S))
    return kg.from_klayout(acc)


class MSMKernel:
    """User entry: (xs, ys, inf, scalars) in the fp.py conventions -> jac tuple."""

    def __init__(self, curve_ops, which: str = "g1", st: int = 8):
        self.ops = curve_ops
        self.which = which
        fq = curve_ops.fq
        self.kg = KGroup(curve_ops.params.q, fq.n, which, st=st)
        self.field = curve_ops.fq if which == "g1" else curve_ops.f2

    def pack(self, xs, ys, inf):
        """[x | y | inf | zero-pad] rows, padded to a 64-u32 multiple: TPU
        row-gather throughput cliffs below 256B rows (measured 2.3 -> 6.4+
        GB/s at 2^20 going from 49 to 64 u32 columns)."""
        N = xs.shape[0]
        R = self.kg.R
        w = 2 * R + 1
        pw = -(-w // 64) * 64
        return jnp.concatenate(
            [xs.reshape(N, R), ys.reshape(N, R),
             inf.astype(jnp.uint32)[:, None],
             jnp.zeros((N, pw - w), jnp.uint32)], axis=1)

    def __call__(self, xs, ys, inf, scalar_limbs, c: int | None = None,
                 B: int | None = None):
        N = xs.shape[0]
        if c is None:
            # Pippenger window heuristic; >= 7 keeps the bucket table >= one
            # klayout lane block
            c = int(min(16, max(8, N.bit_length() - 4)))
        # bucket the padded size to powers of two (floor 2^14) so one compiled
        # module serves every MSM of a prove (each new shape costs minutes of
        # XLA:TPU compile); padding points are infinity, so results are exact
        Npad = max(1 << 14, 1 << (int(N - 1).bit_length()))
        if B is None:
            # cap the run-scan lane block at S = G/128 <= 16: the fused kernel
            # holds (2R+2 + 2*3R)-row blocks in VMEM (16M limit)
            B = max(128, -(-Npad // 2048))
        assert Npad % (128 * B) == 0
        pa = self.pack(xs, ys, inf)
        if Npad != N:
            pad = jnp.zeros((Npad - N, pa.shape[1]), jnp.uint32)
            pad = pad.at[:, 2 * self.kg.R].set(1)   # padded points = infinity
            pa = jnp.concatenate([pa, pad], axis=0)
            scalar_limbs = jnp.concatenate(
                [scalar_limbs,
                 jnp.zeros((Npad - N, scalar_limbs.shape[1]), jnp.uint32)], axis=0)
        out = msm_tpu(self.kg, pa, scalar_limbs, c=c, B=B)
        R = self.kg.R
        X, Y, Z = out[0, :R], out[0, R:2 * R], out[0, 2 * R:]
        sd = (2, self.ops.fq.n) if self.which == "g2" else (self.ops.fq.n,)
        return X.reshape(sd), Y.reshape(sd), Z.reshape(sd)
