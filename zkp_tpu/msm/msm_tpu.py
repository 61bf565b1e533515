"""TPU-kernelized Pippenger MSM: XLA data movement + Pallas point kernels.

Same algorithm as ``pippenger._msm_impl`` (sort -> blocked run scan ->
compaction -> segment fold -> bucket scatter -> weighted sum), but every
point operation is a Pallas kernel on klayout arrays (curve/pkernels.py)
and point data moves as single packed rows:

  packed affine row  = [x | y | inf | pad] u16, two limbs per u32 pair
                       (see MSMKernel.pack) -- gathered at 128 B/row and
                       bitcast to (N, 2*PCR+1) u32 for the scan kernel,
  packed jac row     = [X | Y | Z] : (N, 3R) u32

so each window pays exactly ONE big gather.  Replaces ark-ec
VariableBaseMSM (crates/groth16-core/src/lib.rs:275-300) as the prover's
flagship kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..curve.pkernels import KGroup, SENTINEL, kgroup
from .pippenger import extract_digits, signed_digits


def _negate_y(kg: KGroup, y, mask):
    """Negate packed y-limb rows (N, R) where mask: y -> p - y per Fq half.

    R = L (G1) or 2L (G2: c0 rows then c1 rows -- Fq2 negation negates both
    components).  y == 0 (infinity padding) stays 0.
    """
    L = kg.fl.L
    p = np.asarray(kg.fl.p_limbs, np.uint32)
    MASKL = jnp.uint32(0xFFFF)
    parts = []
    for h in range(kg.R // L):
        yy = y[:, h * L:(h + 1) * L]
        outs = []
        carry = None
        for i in range(L):  # p - y == p + (0xFFFF - y) + 1 with ripple carry
            t = jnp.uint32(int(p[i])) + (MASKL - yy[:, i])
            if i == 0:
                t = t + jnp.uint32(1)
            if carry is not None:
                t = t + carry
            outs.append(t & MASKL)
            carry = t >> 16
        res = jnp.stack(outs, axis=1)
        nz = (jnp.sum(yy, axis=1) != 0).astype(jnp.uint32)[:, None]
        parts.append(res * nz)
    out = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    m = mask.astype(jnp.uint32)[:, None]
    return out * m + y * (jnp.uint32(1) - m)


def _kroll(karr, shift):
    """Roll klayout (rows, S, 128) along the flattened lane axis."""
    rows, S, _ = karr.shape
    flat = karr.reshape(rows, S * 128)
    return jnp.roll(flat, shift, axis=1).reshape(rows, S, 128)


def _mask_k(mask_flat, S):
    """(S*128,) bool/int -> (1, S, 128) u32 mask row."""
    return mask_flat.astype(jnp.uint32).reshape(1, S, 128)


def _reduce_chunks(kg: KGroup, kP, chunk: int, n: int):
    """Per-chunk lane reduction: lanes are contiguous groups of ``chunk``;
    the first ``n`` lanes of each group sum into the group's first lane.
    Shift-tree of masked adds; masks keep groups from mixing."""
    S = kP.shape[1]
    pos = jnp.arange(S * 128, dtype=jnp.uint32)
    posw = pos % jnp.uint32(chunk)
    r = 1
    while r < n:
        ok = (posw + r < n) & (posw % (2 * r) == 0)
        kP = kg.add_masked(kP, _kroll(kP, -r), _mask_k(ok, S))
        r *= 2
    return kP


def _weighted_chunks(kg: KGroup, kB, n: int):
    """Batched per-chunk (T, W): T_c = sum_k V_{c,k}, W_c = sum_k k*V_{c,k}.

    kB: (3R, S, 128) klayout with lanes = contiguous chunks of n (one chunk
    per Pippenger window -- this is what lets ONE pass serve all windows;
    the round-2 code ran the whole reduction once per window, ~8 ms of
    small-kernel dispatch each).

    Slab recursion per chunk: lanes (j*G + g), a weighted_scan over slabs j
    gives C_g = sum_j V_jg and wc_g = sum_j j*V_jg; then
      W = G * sum_g wc_g + sum_g g*C_g ,  T = sum_g C_g,
    recursing on (C, G).  Returns ``(T, spT, pieces)``: T's chunk heads are
    spaced ``spT`` lanes apart in T; ``pieces`` is a list of (arr, spacing)
    whose chunk-head lanes SUM to W_c (deferring the cross-level join to the
    tiny top-level extraction avoids lane-regridding between levels).
    """
    S = kB.shape[1]
    nch = (S * 128) // n
    if n <= 128:
        pos = jnp.arange(S * 128, dtype=jnp.uint32)
        posw = pos % jnp.uint32(n)
        T = _reduce_chunks(kg, kB, n, n)
        # W = sum_b 2^b S_b by Horner over bits, MSB first (W <- 2W + S_b):
        # one reused double kernel and log2(n) doublings total, vs b
        # doublings per bit and a distinct double_n shape compiled per b
        W = None
        for b in reversed(range(max(1, (n - 1).bit_length()))):
            if W is not None:
                W = kg.double(W)
            mask = (posw & (1 << b)) != 0
            sel = jnp.where(mask[None, :].reshape(1, S, 128) != 0, kB,
                            kg.jac_infinity(S))
            red = _reduce_chunks(kg, sel, n, n)
            W = red if W is None else kg.add(W, red)
        if W is None:
            W = kg.jac_infinity(S)
        return T, n, [(W, n)]

    # lanes per slab-scan level: >= one vreg block per chunk; one scan TILE
    # is capped (weighted_scan buffers must fit the 16 MB scoped VMEM -- a
    # 32-sublane G1 tile measured 17.95 MB), with extra chunks batched over
    # the kernel's leading grid axis instead of widening the tile
    tile_cap = 2048 if kg.R <= 24 else 1024
    G = max(128, min(n // 64, tile_cap))
    m = n // G                     # slabs per chunk
    cb = max(1, min(nch, tile_cap // G))   # chunks per tile
    nb = nch // cb                 # tile batches
    R3 = 3 * kg.R
    # slab j of cb chunks side by side: (nb, m, 3R, cb*G/128, 128)
    xs = kB.reshape(R3, nb, cb, m, G).transpose(1, 3, 0, 2, 4)
    xs = xs.reshape(nb, m, R3, (cb * G) // 128, 128)
    C, wc = kg.weighted_scan(xs)   # (nb, 3R, cb*G/128, 128)
    C = C.transpose(1, 0, 2, 3).reshape(R3, (nch * G) // 128, 128)
    wc = wc.transpose(1, 0, 2, 3).reshape(R3, (nch * G) // 128, 128)
    T2, spT, pieces = _weighted_chunks(kg, C, G)
    # W += G * (sum_g wc_g)  (heads spaced G apart in wc's lane space)
    WcG = kg.double_n(_reduce_chunks(kg, wc, G, G), int(np.log2(G)))
    return T2, spT, pieces + [(WcG, G)]


@functools.partial(jax.jit, static_argnames=("kg", "c", "B", "nbits"))
def msm_tpu(kg: KGroup, packed_affine, scalar_limbs, c: int = 16, B: int = 128,
            nbits: int | None = None):
    """packed_affine: (N, pw16) u16 rows from MSMKernel.pack; scalars
    (N, nl) 16-bit limbs.

    Signed-window Pippenger: digits recoded into [-(2^(c-1)-1), 2^(c-1)]
    so the bucket table is 2^(c-1) entries (digit k -> slot k-1, weight
    j+1 = W + T of the weighted/total pair); negative digits gather the
    negated point (y -> p - y).

    Returns a packed jacobian row (1, 3R) = the MSM result.
    N must be a multiple of 128*B (callers pad; see MSMKernel).
    """
    N = packed_affine.shape[0]
    R = kg.R
    PCR = kg.k.PCR                   # u32 rows per packed coordinate
    G = N // B
    S = G // 128
    half = 1 << (c - 1)
    assert c >= 8, "kernelized MSM needs >= 128 buckets (use the small-N path)"
    Scap = min(N, half) + G          # compaction bound
    Scap = -(-Scap // 1024) * 1024   # klayout-friendly (128 lanes x st=8)

    inf_col = packed_affine[:, 4 * PCR] != 0     # inf u16 column
    # the GATHER stays u16 (N, 64)-at-128B -- u32 rows below 256 B hit a
    # 2-3x row-gather cliff (scripts/gather_transpose_bench.py; bitcasting
    # BEFORE the gather measured 1249 ms vs 814 ms at 2^20).  The u16->u32
    # pair bitcast happens on the gathered rows instead, so the relayout
    # and scan input still ride half the u32 rows.
    PW16 = packed_affine.shape[1]
    keys_lsb, negs_lsb, nwin = signed_digits(scalar_limbs, c, nbits=nbits)
    digits_all = jnp.where(inf_col[None, :], jnp.uint32(0), keys_lsb[::-1])
    negs_all = negs_lsb[::-1]

    # boundary-partial capacity: each scan column contributes at most 2
    # boundary runs (its prefix run and its trailing accumulator), and the
    # fold only ever runs on this small array (the sorted stream is chunked
    # CONTIGUOUSLY into columns, so any bucket spanning >1 column consists
    # solely of boundary runs; any bucket inside one column is a single
    # complete run that can be scattered directly).
    Bcap = min(-(-2 * G // 1024) * 1024, Scap)
    Bc = Bcap // 128

    def window_body(_, xs):
        digits, negs = xs
        keys, perm = jax.lax.sort_key_val(digits, jnp.arange(N, dtype=jnp.uint32))
        rows16 = jnp.take(packed_affine, perm, axis=0)        # THE gather (u16)
        rows = jax.lax.bitcast_convert_type(
            rows16.reshape(N, PW16 // 2, 2), jnp.uint32)      # (N, PW16/2)
        sneg = jnp.take(negs, perm, axis=0)
        # time-major klayout: element n -> (g = n // B, t = n % B); y is
        # negated IN the scan kernel (neg-mask row)
        PW32 = PW16 // 2
        rows_t = rows.reshape(G, B, PW32).transpose(1, 2, 0)[:, :2 * PCR + 1]
        keys_t = keys.reshape(G, B).T[:, None, :]                   # (B, 1, G)
        negs_t = sneg.reshape(G, B).T[:, None, :].astype(jnp.uint32)
        A_key = jnp.concatenate([rows_t, keys_t, negs_t], axis=1)   # (B, 2PCR+3, G)
        A_key = A_key.reshape(B, 2 * PCR + 3, S, 128)

        emits, ekeys, evalid, facc, fkey = kg.run_scan(A_key)
        PJ = emits.shape[1]          # packed jacobian rows (u16 pairs)
        # append trailing run
        emits = jnp.concatenate([emits, facc[None]], axis=0)        # (B+1, PJ, S, 128)
        ekeys = jnp.concatenate([ekeys, fkey[None]], axis=0)        # (B+1, 1, S, 128)
        evalid = jnp.concatenate(
            [evalid, jnp.ones_like(evalid[:1])], axis=0)
        Bp = B + 1
        ev = evalid.reshape(Bp, G) != 0
        # boundary runs: the column's first valid emit (its prefix run, which
        # may continue the previous column) and the appended trailing
        # accumulator (may continue into the next column).  Everything else
        # is a run strictly interior to its column => a COMPLETE bucket sum.
        first_valid = ev & (jnp.cumsum(ev.astype(jnp.uint32), axis=0) == 1)
        tpos = jnp.arange(Bp, dtype=jnp.uint32)[:, None]
        boundary = first_valid | (tpos == jnp.uint32(B))
        # flatten TIME-major (emit of column g at time t -> flat t*G + g):
        # the g-major "run order" flatten needs a (Bp,PJ,G)->(G,Bp,PJ)
        # transpose measured ~13 ms/window slower than this one; downstream
        # only needs the four arrays in a CONSISTENT order (the compaction
        # sort groups equal keys regardless of input order).  Rows stay
        # PACKED through the flatten/sort/gather (half the bytes) and are
        # unpacked once after the compaction take.
        e_rows = emits.reshape(Bp, PJ, G).transpose(0, 2, 1).reshape(Bp * G, PJ)
        e_keys = ekeys.reshape(Bp, G).reshape(Bp * G)
        e_val = ev.reshape(Bp * G)
        e_bnd = boundary.reshape(Bp * G)

        live = e_val & (e_keys != 0)
        ckeys = jnp.where(live, e_keys, SENTINEL)
        ckeys, cperm = jax.lax.sort_key_val(
            ckeys, jnp.arange(Bp * G, dtype=jnp.uint32))
        take_n = min(Scap, Bp * G)
        ckeys = ckeys[:take_n]
        packed = jnp.take(e_rows, cperm[:take_n], axis=0)           # (take_n, PJ)
        bnd = jnp.take(e_bnd, cperm[:take_n], axis=0)
        # unpack u16 pairs -> (take_n, 3R) limb rows
        part = jnp.stack([packed & jnp.uint32(0xFFFF), packed >> 16],
                         axis=-1).reshape(take_n, 2 * PJ)[:, :3 * R]
        inf_row = kg.from_klayout(kg.jac_infinity(1))[:1]           # (1, 3R)
        if take_n < Scap:
            ckeys = jnp.concatenate(
                [ckeys, jnp.full((Scap - take_n,), SENTINEL, jnp.uint32)])
            part = jnp.concatenate(
                [part, jnp.tile(inf_row, (Scap - take_n, 1))], axis=0)
            bnd = jnp.concatenate([bnd, jnp.zeros((Scap - take_n,), bool)])
        dead = ckeys == SENTINEL
        part = jnp.where(dead[:, None], inf_row, part)

        # complete runs scatter STRAIGHT into the bucket table (unique keys);
        # digit k -> slot k-1 (k >= 1 -- zero digits were dropped above)
        tgt = jnp.where(~dead & ~bnd, ckeys - 1, jnp.uint32(half))
        buckets = jnp.tile(inf_row, (half + 1, 1)).at[tgt].set(part)[:half]

        # compact the boundary runs (<= 2 per column) and fold THOSE only
        bkeys = jnp.where(bnd & ~dead, ckeys, SENTINEL)
        bkeys, bperm = jax.lax.sort_key_val(
            bkeys, jnp.arange(Scap, dtype=jnp.uint32))
        bkeys = bkeys[:Bcap]
        bpart = jnp.take(part, bperm[:Bcap], axis=0)                # (Bcap, 3R)
        bdead = bkeys == SENTINEL
        bpart = jnp.where(bdead[:, None], inf_row, bpart)

        kv = kg.to_klayout(bpart)                                   # (3R, Bc, 128)
        start = jnp.searchsorted(bkeys, bkeys, side="left").astype(jnp.uint32)
        pos = jnp.arange(Bcap, dtype=jnp.uint32)
        rel = pos - start
        rounds = int(np.ceil(np.log2(max(Bcap, 2))))

        # fused shift-tree fold: all rounds in one VMEM-resident kernel when
        # the working set fits (G1); otherwise one add_masked launch per
        # round (the launches + HBM round trips measured ~37 ms/window)
        if 3 * kg.R * Bc * 128 * 4 * 8 <= 14 * 2**20:
            def mk_mask(i):
                d = np.uint32(1 << i)
                src_ok = (rel >= d) & (rel % (2 * d) == d)
                return jnp.roll(src_ok, -int(d)) & (pos < jnp.uint32(Bcap) - d)
            masks = jnp.stack([mk_mask(i) for i in range(rounds)])
            masks = masks.astype(jnp.uint32).reshape(rounds, Bc, 128)
            kv = kg.fold_tree(kv, rounds, masks)
        else:
            def fold_body(i, kv):
                d = (jnp.uint32(1) << i.astype(jnp.uint32))
                src_ok = (rel >= d) & (rel % (2 * d) == d)
                tgt_ok = jnp.roll(src_ok, -d) & (pos < jnp.uint32(Bcap) - d)
                shifted = _kroll(kv, -d)
                return kg.add_masked(kv, shifted, _mask_k(tgt_ok, Bc))

            kv = jax.lax.fori_loop(0, rounds, fold_body, kv)
        heads = kg.from_klayout(kv)                                 # (Bcap, 3R)
        is_head = (pos == start) & ~bdead
        # boundary-run buckets are disjoint from complete-run buckets, so a
        # second scatter-set into the same table is exact
        btgt = jnp.where(is_head, bkeys - 1, jnp.uint32(half))
        buckets = jnp.concatenate(
            [buckets, inf_row], axis=0).at[btgt].set(heads)[:half]

        return None, buckets                                        # (half, 3R)

    # the windows scan builds bucket tables ONLY; the weighted reduction is
    # hoisted out and batched over all nwin windows at once (chunked lanes),
    # so its ~100 small-kernel launches amortize 1/nwin instead of per-window
    _, buckets_all = jax.lax.scan(window_body, None, (digits_all, negs_all))
    rows_all = buckets_all.reshape(nwin * half, 3 * R)
    # pad the window/chunk count to a power of two (infinity chunks): the
    # chunked weighted reduction tiles chunks over the scan batch axis
    nchp = 1 << (nwin - 1).bit_length()
    if nchp != nwin:
        inf_row = kg.from_klayout(kg.jac_infinity(1))[:1]
        rows_all = jnp.concatenate(
            [rows_all, jnp.tile(inf_row, ((nchp - nwin) * half, 1))])
    kBall = kg.to_klayout(rows_all)

    # slot j holds the digit-(j+1) bucket: window sum = W_w + T_w
    T_arr, spT, pieces = _weighted_chunks(kg, kBall, half)

    def heads(arr, sp):
        """Strided head extraction -> (3R, 1, 128) klayout, lane w = chunk w."""
        rows = kg.from_klayout(arr)[: nwin * sp : sp]               # (nwin, 3R)
        rows = jnp.concatenate(
            [rows, jnp.zeros((128 - nwin, 3 * R), jnp.uint32)])    # Z=0 pad = inf
        return kg.to_klayout(rows)

    win = heads(T_arr, spT)
    for arr, sp in pieces:
        win = kg.add(win, heads(arr, sp))

    # Horner over windows, MSB first (digits_all is MSB-first): lane w of
    # ``win`` holds window w's sum; rolling w to lane 0 leaves garbage in
    # lanes 1.. which never reaches lane 0 (lanes are independent)
    acc = kg.jac_infinity(1)
    for w in range(nwin):
        acc = kg.double_n(acc, c)
        acc = kg.add(acc, _kroll(win, -w) if w else win)
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
        self.kg = kgroup(curve_ops.params.q, fq.n, which, st=st)
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
        self.kg = kgroup(curve_ops.params.q, fq.n, which, st=st)
        self.field = curve_ops.fq if which == "g1" else curve_ops.f2

    def pack(self, xs, ys, inf):
        """Packed u16 affine rows, PAIR-ALIGNED for the in-kernel u32
        unpack: each Fq component gets its L limbs + pad to an even count,
        then [x comps | y comps | inf | pad] to a 64-u16 multiple.  At
        2^20 rows the 128-B u16 gather is ~15% faster than 256-B u32
        (scripts/gather_transpose_bench.py), and the pair packing halves
        the relayout + scan-input bytes (limbs 2i | 2i+1<<16, unpacked by
        free VPU shifts in run_scan)."""
        kg = self.kg
        N = xs.shape[0]
        L = kg.fl.L
        ncomp = kg.R // L
        PL = kg.k.PL
        w = 4 * kg.k.PCR + 2          # x + y packed pairs + (inf, 0)
        pw = -(-w // 64) * 64

        def comp_pad(arr):            # (N, ncomp, L) -> (N, ncomp*2*PL) u16
            a = arr.reshape(N, ncomp, L).astype(jnp.uint16)
            if 2 * PL != L:
                a = jnp.concatenate(
                    [a, jnp.zeros((N, ncomp, 2 * PL - L), jnp.uint16)], axis=2)
            return a.reshape(N, ncomp * 2 * PL)

        return jnp.concatenate(
            [comp_pad(xs), comp_pad(ys),
             inf.astype(jnp.uint16)[:, None],
             jnp.zeros((N, pw - w + 1), jnp.uint16)], axis=1)

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
            pad = jnp.zeros((Npad - N, pa.shape[1]), jnp.uint16)
            pad = pad.at[:, 4 * self.kg.k.PCR].set(1)  # padded points = infinity
            pa = jnp.concatenate([pa, pad], axis=0)
            scalar_limbs = jnp.concatenate(
                [scalar_limbs,
                 jnp.zeros((Npad - N, scalar_limbs.shape[1]), jnp.uint32)], axis=0)
        out = msm_tpu(self.kg, pa, scalar_limbs, c=c, B=B,
                      nbits=self.ops.params.r.bit_length())
        R = self.kg.R
        X, Y, Z = out[0, :R], out[0, R:2 * R], out[0, 2 * R:]
        sd = (2, self.ops.fq.n) if self.which == "g2" else (self.ops.fq.n,)
        return X.reshape(sd), Y.reshape(sd), Z.reshape(sd)
