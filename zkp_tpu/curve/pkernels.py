"""Pallas TPU kernels for short-Weierstrass (a=0) Jacobian point arithmetic.

The XLA limb path (``weierstrass.py`` over ``fp.py``) materializes the
(N, L, L) partial-product tensors of every field multiply to HBM, measured
~200x off VPU peak on a v5e (scripts/tpu_microbench4).  Here each point
operation is ONE Pallas kernel: limbs live as (St, 128) vreg-resident rows,
the full Montgomery pipeline (zkp_tpu.field.limbs) is unrolled in-kernel,
and nothing touches HBM between field ops.  Measured >1000x faster than the
XLA path at 2^17 lanes (scripts/pallas_mul_proto.py).

Kernel data layout ("klayout"):
  - a field element batch = (R, S, 128) uint32, R rows = limbs (R = L for Fq,
    2L for Fq2 with c0 rows then c1 rows), lanes packed (S, 128),
  - a Jacobian point batch = (3R, S, 128): X rows, Y rows, Z rows,
  - an affine point batch = (2R+1, S, 128): x, y, and one u32 infinity-mask
    row (nonzero = point at infinity),
  - lane count N = S * 128 (callers pad).

Formulas match weierstrass.py (dbl-2009-l, add-2007-bl, madd-2007-bl with
branch-free complete edge handling) so the two backends are bit-identical;
tests A/B them.  Reference parity: replaces ark-ec group ops
(crates/groth16-setup/src/lib.rs:162-241, groth16-core/src/lib.rs:275-300).

On non-TPU backends kernels run under ``interpret=True`` (same numerics).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.limbs import FpLimbs, Fp2Limbs, select as lselect, is_zero as lis_zero

SENTINEL = np.uint32(0xFFFFFFFF)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class _F1:
    """G1 field adapter: element = list of L limb rows."""

    def __init__(self, fl: FpLimbs):
        self.fl = fl
        self.R = fl.L
        # packed-coordinate geometry: TWO 16-bit limbs ride in one u32 row
        # (limb 2i in the low half, 2i+1 in the high half) -- halves the
        # gather/relayout/scan-input bytes of the MSM hot path
        self.PL = (fl.L + 1) // 2     # u32 rows per packed Fq component
        self.PCR = self.PL            # u32 rows per packed coordinate

    def load(self, ref_or_arr, base: int):
        return [ref_or_arr[base + i] for i in range(self.R)]

    def load_packed(self, ref_or_arr, base: int):
        """Unpack a packed coordinate starting at u32 row ``base``."""
        MASK = jnp.uint32(0xFFFF)
        out = []
        for i in range(self.fl.L):
            w = ref_or_arr[base + i // 2]
            out.append((w >> 16) if (i % 2) else (w & MASK))
        return out

    def flatten(self, e):
        return list(e)

    def add(self, a, b): return self.fl.add(a, b)
    def sub(self, a, b): return self.fl.sub(a, b)
    def mul(self, a, b): return self.fl.mul(a, b)
    def sqr(self, a): return self.fl.sqr(a)
    def double(self, a): return self.fl.double(a)
    def neg(self, a): return self.fl.neg(a)
    def mul_small(self, a, k): return self.fl.mul_small(a, k)
    def select(self, c, a, b): return lselect(c, a, b)
    def is_zero(self, a): return lis_zero(a)
    def zero(self, like): return self.fl.zero(like)
    def one(self, like): return self.fl.one(like)


class _F2:
    """G2 field adapter: element = (c0 rows, c1 rows)."""

    def __init__(self, fl: FpLimbs):
        self.fl = fl
        self.f2 = Fp2Limbs(fl)
        self.R = 2 * fl.L
        self.PL = (fl.L + 1) // 2     # u32 rows per packed Fq component
        self.PCR = 2 * self.PL        # u32 rows per packed Fq2 coordinate

    def load(self, ref_or_arr, base: int):
        L = self.fl.L
        return ([ref_or_arr[base + i] for i in range(L)],
                [ref_or_arr[base + L + i] for i in range(L)])

    def load_packed(self, ref_or_arr, base: int):
        """Each Fq component is packed independently (PL u32 rows), so odd
        L never straddles a component boundary."""
        MASK = jnp.uint32(0xFFFF)

        def comp(b):
            out = []
            for i in range(self.fl.L):
                w = ref_or_arr[b + i // 2]
                out.append((w >> 16) if (i % 2) else (w & MASK))
            return out

        return (comp(base), comp(base + self.PL))

    def flatten(self, e):
        return list(e[0]) + list(e[1])

    def add(self, a, b): return self.f2.add(a, b)
    def sub(self, a, b): return self.f2.sub(a, b)
    def mul(self, a, b): return self.f2.mul(a, b)
    def sqr(self, a): return self.f2.sqr(a)
    def double(self, a): return self.f2.double(a)
    def neg(self, a): return self.f2.neg(a)
    def mul_small(self, a, k): return self.f2.mul_small(a, k)
    def select(self, c, a, b): return self.f2.select(c, a, b)
    def is_zero(self, a): return self.f2.is_zero(a)
    def zero(self, like): return self.f2.zero(like)
    def one(self, like): return self.f2.one(like)


# ----------------------------------------------------------- point formulas
# Pure limb-structure functions, shared by every kernel body.

def _pdouble(k, X, Y, Z):
    """dbl-2009-l; complete (infinity and 2-torsion double to infinity)."""
    A = k.sqr(X)
    B = k.sqr(Y)
    C = k.sqr(B)
    D = k.double(k.sub(k.sqr(k.add(X, B)), k.add(A, C)))
    E = k.add(k.double(A), A)
    F = k.sqr(E)
    X3 = k.sub(F, k.double(D))
    Y3 = k.sub(k.mul(E, k.sub(D, X3)), k.mul_small(C, 8))
    Z3 = k.double(k.mul(Y, Z))
    return X3, Y3, Z3


def _padd_fast(k, P, Q):
    """add-2007-bl with all edge handling EXCEPT the doubling branch.

    Returns (X3, Y3, Z3, is_dbl): lanes where ``is_dbl`` holds carry garbage
    and must be patched with _pdouble(P) -- kernels gate that patch behind a
    scalar ``pl.when(jnp.any(is_dbl))`` so the common case pays 16 instead
    of 23 field muls.
    """
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = k.sqr(Z1)
    Z2Z2 = k.sqr(Z2)
    U1 = k.mul(X1, Z2Z2)
    U2 = k.mul(X2, Z1Z1)
    S1 = k.mul(Y1, k.mul(Z2, Z2Z2))
    S2 = k.mul(Y2, k.mul(Z1, Z1Z1))
    H = k.sub(U2, U1)
    rhalf = k.sub(S2, S1)
    I = k.sqr(k.double(H))
    J = k.mul(H, I)
    r = k.double(rhalf)
    V = k.mul(U1, I)
    X3 = k.sub(k.sub(k.sqr(r), J), k.double(V))
    Y3 = k.sub(k.mul(r, k.sub(V, X3)), k.double(k.mul(S1, J)))
    Z3 = k.mul(k.sub(k.sqr(k.add(Z1, Z2)), k.add(Z1Z1, Z2Z2)), H)

    inf1 = k.is_zero(Z1)
    inf2 = k.is_zero(Z2)
    same_x = k.is_zero(H) & ~inf1 & ~inf2
    same_y = k.is_zero(rhalf)
    zero = k.zero(X3)
    one = k.one(X3)
    is_dbl = same_x & same_y
    is_inf_out = same_x & ~same_y
    X3 = k.select(is_inf_out, one, X3)
    Y3 = k.select(is_inf_out, one, Y3)
    Z3 = k.select(is_inf_out, zero, Z3)
    X3 = k.select(inf1, X2, X3)
    Y3 = k.select(inf1, Y2, Y3)
    Z3 = k.select(inf1, Z2, Z3)
    X3 = k.select(inf2, X1, X3)
    Y3 = k.select(inf2, Y1, Y3)
    Z3 = k.select(inf2, Z1, Z3)
    return X3, Y3, Z3, is_dbl


def _patch_dbl(k, P, out, is_dbl):
    """Patch the doubling lanes of a fast add result (called under pl.when)."""
    dX, dY, dZ = _pdouble(k, *P)
    X3 = k.select(is_dbl, dX, out[0])
    Y3 = k.select(is_dbl, dY, out[1])
    Z3 = k.select(is_dbl, dZ, out[2])
    return X3, Y3, Z3


def _any(mask):
    """Scalar 'any lane set' reduction of a boolean lane array."""
    return jnp.any(mask)


def _padd(k, P, Q):
    """add-2007-bl with branch-free complete edge handling (eager double)."""
    X3, Y3, Z3, is_dbl = _padd_fast(k, P, Q)
    return _patch_dbl(k, P, (X3, Y3, Z3), is_dbl)


def _pmadd_fast(k, P, xq, yq, inf2):
    """madd-2007-bl (mixed add) minus the doubling branch; see _padd_fast."""
    X1, Y1, Z1 = P
    Z1Z1 = k.sqr(Z1)
    U2 = k.mul(xq, Z1Z1)
    S2 = k.mul(yq, k.mul(Z1, Z1Z1))
    H = k.sub(U2, X1)
    rhalf = k.sub(S2, Y1)
    HH = k.sqr(H)
    I = k.mul_small(HH, 4)
    J = k.mul(H, I)
    r = k.double(rhalf)
    V = k.mul(X1, I)
    X3 = k.sub(k.sub(k.sqr(r), J), k.double(V))
    Y3 = k.sub(k.mul(r, k.sub(V, X3)), k.double(k.mul(Y1, J)))
    Z3 = k.sub(k.sub(k.sqr(k.add(Z1, H)), Z1Z1), HH)

    inf1 = k.is_zero(Z1)
    same_x = k.is_zero(H) & ~inf1 & ~inf2
    same_y = k.is_zero(rhalf)
    zero = k.zero(X3)
    one = k.one(X3)
    is_dbl = same_x & same_y
    is_inf_out = same_x & ~same_y
    X3 = k.select(is_inf_out, one, X3)
    Y3 = k.select(is_inf_out, one, Y3)
    Z3 = k.select(is_inf_out, zero, Z3)
    X3 = k.select(inf1, xq, X3)
    Y3 = k.select(inf1, yq, Y3)
    Z3 = k.select(inf1, one, Z3)
    X3 = k.select(inf2, X1, X3)
    Y3 = k.select(inf2, Y1, Y3)
    Z3 = k.select(inf2, Z1, Z3)
    return X3, Y3, Z3, is_dbl


def _pmadd(k, P, xq, yq, inf2):
    """madd-2007-bl with complete edge handling (eager double)."""
    X3, Y3, Z3, is_dbl = _pmadd_fast(k, P, xq, yq, inf2)
    return _patch_dbl(k, P, (X3, Y3, Z3), is_dbl)


def _flat_roll_rows(rows, d, Bc: int, lane):
    """Roll each (Bc, 128) row by -d along the flattened (Bc*128,) lane index.

    Decomposes the flat shift into a sublane rotate + lane rotate + a
    lane-boundary select: flat index f = s*128 + l, so
    out[s, l] = in[(s + d1 + (l + d0 >= 128)) % Bc, (l + d0) % 128]
    with d = d1*128 + d0.  ``d`` may be a traced scalar (dynamic rotate).
    ``lane`` is a (Bc, 128) uint32 iota along axis 1.  Wrapped lanes carry
    garbage; callers mask them out.
    """
    d = jnp.asarray(d, jnp.int32)
    d0 = d % 128
    d1 = (d // 128) % Bc
    s1 = (Bc - d1) % Bc
    s2 = (Bc - d1 - 1) % Bc
    sl = (128 - d0) % 128
    keep_c1 = lane < (jnp.uint32(128) - d0.astype(jnp.uint32))
    out = []
    for A in rows:
        c1 = pltpu.roll(pltpu.roll(A, s1, axis=0), sl, axis=1)
        c2 = pltpu.roll(pltpu.roll(A, s2, axis=0), sl, axis=1)
        out.append(jnp.where(keep_c1, c1, c2))
    return out


# ------------------------------------------------------------------ kernels

@functools.lru_cache(maxsize=None)
def kgroup(q: int, L: int, which: str, st: int = 8) -> "KGroup":
    """Shared KGroup instances.  ``jax.jit`` keys its executable cache on the
    *identity* of static args: a fresh KGroup per MSMKernel/FixedBaseKernel
    made every jitted MSM module recompile per instance (minutes each on a
    weak host).  All library entry points construct KGroups through here."""
    return KGroup(q, L, which, st=st)


class KGroup:
    """Pallas point-op entry points for one group (G1 or G2), klayout arrays."""

    def __init__(self, q: int, L: int, which: str, st: int = 8):
        fl = FpLimbs(q, L)
        self.fl = fl
        self.k = _F1(fl) if which == "g1" else _F2(fl)
        self.R = self.k.R
        self.st = int(st)
        self.name = which

    # ---------------- layout helpers (XLA level)

    def pad_lanes(self, n: int) -> int:
        blk = 128 * self.st
        return -(-n // blk) * blk

    def to_klayout(self, arr):
        """(N, R) u32 -> (R, S, 128); N must be pre-padded to 128*st."""
        N, R = arr.shape
        return jnp.transpose(arr, (1, 0)).reshape(R, N // 128, 128)

    def from_klayout(self, karr):
        """(R, S, 128) -> (N, R)."""
        R = karr.shape[0]
        return jnp.transpose(karr.reshape(R, -1), (1, 0))

    def jac_infinity(self, S: int):
        """klayout infinity point (1, 1, 0) in Montgomery form."""
        R, L = self.R, self.fl.L
        one = np.zeros((R,), np.uint32)
        one[:L] = np.array(self.fl.one_mont, np.uint32)  # c0 = 1 (c1 = 0 for Fq2)
        rows = np.concatenate([one, one, np.zeros((R,), np.uint32)])
        return jnp.broadcast_to(jnp.asarray(rows)[:, None, None],
                                (3 * self.R, S, 128)).astype(jnp.uint32)

    # ---------------- kernel builders

    def _call(self, kernel, nin, S, extra_rows=None, nout=1, out_rows=None):
        st = min(self.st, S)
        while S % st:
            st -= 1
        grid = (S // st,)

        def mkspec(rows):
            return pl.BlockSpec((rows, st, 128), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

        in_specs = [mkspec(r) for r in nin]
        if out_rows is None:
            out_rows = [3 * self.R] * nout
        out_specs = [mkspec(r) for r in out_rows]
        out_shape = [jax.ShapeDtypeStruct((r, S, 128), jnp.uint32) for r in out_rows]
        if nout == 1:
            out_specs, out_shape = out_specs[0], out_shape[0]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=_interpret())

    # ---------------- public point ops (klayout in, klayout out)

    @functools.partial(jax.jit, static_argnums=0)
    def double(self, P):
        R, k = self.R, self.k

        def kern(p_ref, o_ref):
            X = k.load(p_ref, 0)
            Y = k.load(p_ref, R)
            Z = k.load(p_ref, 2 * R)
            X3, Y3, Z3 = _pdouble(k, X, Y, Z)
            for i, row in enumerate(k.flatten(X3) + k.flatten(Y3) + k.flatten(Z3)):
                o_ref[i] = row

        S = P.shape[1]
        return self._call(kern, [3 * R], S)(P)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def double_n(self, P, n: int):
        """n successive doublings as ONE kernel (in-kernel loop; saves n-1
        kernel launches -- the MSM does c of these between windows)."""
        R, k = self.R, self.k

        def kern(p_ref, o_ref):
            X = k.load(p_ref, 0)
            Y = k.load(p_ref, R)
            Z = k.load(p_ref, 2 * R)
            for _ in range(n):
                X, Y, Z = _pdouble(k, X, Y, Z)
            for i, row in enumerate(k.flatten(X) + k.flatten(Y) + k.flatten(Z)):
                o_ref[i] = row

        S = P.shape[1]
        return self._call(kern, [3 * R], S)(P)

    @functools.partial(jax.jit, static_argnums=0)
    def add(self, P, Q):
        R, k = self.R, self.k

        def kern(p_ref, q_ref, o_ref):
            P_ = (k.load(p_ref, 0), k.load(p_ref, R), k.load(p_ref, 2 * R))
            Q_ = (k.load(q_ref, 0), k.load(q_ref, R), k.load(q_ref, 2 * R))
            X3, Y3, Z3, is_dbl = _padd_fast(k, P_, Q_)
            for i, row in enumerate(k.flatten(X3) + k.flatten(Y3) + k.flatten(Z3)):
                o_ref[i] = row

            @pl.when(_any(is_dbl))
            def _():
                Xp, Yp, Zp = _patch_dbl(k, P_, (X3, Y3, Z3), is_dbl)
                for i, row in enumerate(
                        k.flatten(Xp) + k.flatten(Yp) + k.flatten(Zp)):
                    o_ref[i] = row

        S = P.shape[1]
        return self._call(kern, [3 * R, 3 * R], S)(P, Q)

    @functools.partial(jax.jit, static_argnums=0)
    def add_masked(self, P, Q, m):
        """P + Q where mask m != 0 else P.  m: (1, S, 128) u32."""
        R, k = self.R, self.k

        def kern(p_ref, q_ref, m_ref, o_ref):
            P_ = (k.load(p_ref, 0), k.load(p_ref, R), k.load(p_ref, 2 * R))
            Q_ = (k.load(q_ref, 0), k.load(q_ref, R), k.load(q_ref, 2 * R))
            en = m_ref[0] != 0
            Xf, Yf, Zf, is_dbl = _padd_fast(k, P_, Q_)
            X3 = k.select(en, Xf, P_[0])
            Y3 = k.select(en, Yf, P_[1])
            Z3 = k.select(en, Zf, P_[2])
            for i, row in enumerate(k.flatten(X3) + k.flatten(Y3) + k.flatten(Z3)):
                o_ref[i] = row

            @pl.when(_any(is_dbl & en))
            def _():
                Xp, Yp, Zp = _patch_dbl(k, P_, (X3, Y3, Z3), is_dbl & en)
                for i, row in enumerate(
                        k.flatten(Xp) + k.flatten(Yp) + k.flatten(Zp)):
                    o_ref[i] = row

        S = P.shape[1]
        return self._call(kern, [3 * R, 3 * R, 1], S)(P, Q, m)

    @functools.partial(jax.jit, static_argnums=0)
    def add_mixed(self, P, A):
        """P (jac, 3R rows) + A (affine, 2R+1 rows: x, y, inf mask)."""
        R, k = self.R, self.k

        def kern(p_ref, a_ref, o_ref):
            P_ = (k.load(p_ref, 0), k.load(p_ref, R), k.load(p_ref, 2 * R))
            xq = k.load(a_ref, 0)
            yq = k.load(a_ref, R)
            inf2 = a_ref[2 * R] != 0
            X3, Y3, Z3, is_dbl = _pmadd_fast(k, P_, xq, yq, inf2)
            for i, row in enumerate(k.flatten(X3) + k.flatten(Y3) + k.flatten(Z3)):
                o_ref[i] = row

            @pl.when(_any(is_dbl))
            def _():
                Xp, Yp, Zp = _patch_dbl(k, P_, (X3, Y3, Z3), is_dbl)
                for i, row in enumerate(
                        k.flatten(Xp) + k.flatten(Yp) + k.flatten(Zp)):
                    o_ref[i] = row

        S = P.shape[1]
        return self._call(kern, [3 * R, 2 * R + 1], S)(P, A)

    def _full_specs(self, shapes):
        """Whole-array VMEM BlockSpecs (no grid) for the fused small kernels."""
        return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shapes]

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def fold_tree(self, kv, rounds: int, masks):
        """Segmented shift-tree fold, ALL rounds fused into one kernel.

        kv: (3R, Bc, 128) klayout jacobian partials sorted by bucket key;
        masks: (rounds, Bc, 128) u32, masks[i] nonzero where a lane receives
        lane+2^i.  Equivalent to ``rounds`` iterations of
        ``add_masked(kv, kroll(kv, -2^i), masks[i])`` but VMEM-resident
        throughout -- the unfused loop pays a kernel launch + HBM round trip
        per round (measured ~37 ms/window of the 2^20 MSM; fused ~2 ms).
        """
        R, k = self.R, self.k
        Bc = kv.shape[1]

        def kern(kv_ref, m_ref, o_ref):
            lane = jax.lax.broadcasted_iota(jnp.uint32, (Bc, 128), 1)
            rows = [kv_ref[i] for i in range(3 * R)]

            def body(i, rows):
                sh = _flat_roll_rows(rows, jnp.int32(1) << i, Bc, lane)
                en = m_ref[i] != 0
                P_ = (k.load(rows, 0), k.load(rows, R), k.load(rows, 2 * R))
                Q_ = (k.load(sh, 0), k.load(sh, R), k.load(sh, 2 * R))
                X3, Y3, Z3 = _padd(k, P_, Q_)   # eager dbl patch: cheap in VMEM
                X3 = k.select(en, X3, P_[0])
                Y3 = k.select(en, Y3, P_[1])
                Z3 = k.select(en, Z3, P_[2])
                return k.flatten(X3) + k.flatten(Y3) + k.flatten(Z3)

            rows = jax.lax.fori_loop(0, rounds, body, rows)
            for i, row in enumerate(rows):
                o_ref[i] = row

        return pl.pallas_call(
            kern,
            in_specs=self._full_specs([kv, masks]),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * R, Bc, 128), jnp.uint32),
            interpret=_interpret())(kv, masks)

    @functools.partial(jax.jit, static_argnums=0)
    def run_step(self, carry, A_key):
        """One step of the MSM blocked run scan, as a single kernel.

        carry = (acc (3R,S,128), ckey (1,S,128)); A_key = affine block with
        key row appended: (2R+2, S, 128) [x, y, inf, key].
        Returns (nacc, nkey), (emit (3R,S,128), ekey (1,S,128), evalid (1,S,128)).
        Semantics mirror msm.pippenger._blocked_run_scan's step.
        """
        R, k = self.R, self.k

        def kern(acc_ref, ck_ref, a_ref, nacc_ref, nk_ref, emit_ref, ek_ref, ev_ref):
            acc = (k.load(acc_ref, 0), k.load(acc_ref, R), k.load(acc_ref, 2 * R))
            ckey = ck_ref[0]
            xq = k.load(a_ref, 0)
            yq = k.load(a_ref, R)
            inf2 = a_ref[2 * R] != 0
            key = a_ref[2 * R + 1]
            same = key == ckey
            eX, eY, eZ, is_dbl = _pmadd_fast(k, acc, xq, yq, inf2)
            one = k.one(eX)
            zero = k.zero(eX)
            # fresh = affine promoted to jacobian (or infinity)
            fX = k.select(inf2, one, xq)
            fY = k.select(inf2, one, yq)
            fZ = k.select(inf2, zero, one)
            nX = k.select(same, eX, fX)
            nY = k.select(same, eY, fY)
            nZ = k.select(same, eZ, fZ)
            for i, row in enumerate(k.flatten(nX) + k.flatten(nY) + k.flatten(nZ)):
                nacc_ref[i] = row

            @pl.when(_any(is_dbl & same))
            def _():
                Xp, Yp, Zp = _patch_dbl(k, acc, (nX, nY, nZ), is_dbl & same)
                for i, row in enumerate(
                        k.flatten(Xp) + k.flatten(Yp) + k.flatten(Zp)):
                    nacc_ref[i] = row

            nk_ref[0] = key
            for i in range(3 * R):
                emit_ref[i] = acc_ref[i]
            ek_ref[0] = ckey
            ev_ref[0] = ((~same) & (ckey != SENTINEL)).astype(jnp.uint32)

        S = carry[0].shape[1]
        call = self._call(kern, [3 * R, 1, 2 * R + 2], S, nout=5,
                          out_rows=[3 * R, 1, 3 * R, 1, 1])
        nacc, nkey, emit, ekey, evalid = call(carry[0], carry[1], A_key)
        return (nacc, nkey), (emit, ekey, evalid)

    @functools.partial(jax.jit, static_argnums=0)
    def run_scan(self, A_key):
        """The FULL MSM blocked run scan as ONE Pallas call.

        A_key: (B, 2*PCR+3, S, 128) time-major sorted PACKED affine blocks:
        [x packed | y packed | inf | key | negmask], where each coordinate
        rides as PCR u32 rows holding two 16-bit limbs each (low = even
        limb) -- the u16 pair packing halves the gather/relayout/scan-input
        bytes of the hot path; the unpack is free VPU shifts in-kernel.
        The y coordinate is negated IN-KERNEL where the mask is set.  The
        sequential TPU grid iterates t = 0..B-1, carrying (acc, current
        key) in VMEM scratch; per step it emits the previous run's partial
        sum, PACKED as u16 pairs (limb 2r | 2r+1 << 16 -- limbs are
        canonical 16-bit, so this is lossless and halves the emit HBM
        write).  Returns (emits (B,PJ,S,128), ekeys (B,1,S,128),
        evalid (B,1,S,128), facc (PJ,S,128), fkey (1,S,128)) with
        PJ = ceil(3R/2).
        """
        R, k = self.R, self.k
        PCR = k.PCR
        PJ = (3 * R + 1) // 2       # packed jacobian rows (u16 pairs)
        B, _, S, _ = A_key.shape
        assert A_key.shape[1] == 2 * PCR + 3

        def kern(a_ref, emit_ref, ek_ref, ev_ref, facc_ref, fkey_ref,
                 acc_s, key_s):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                # initialize: acc = infinity (1, 1, 0), key = SENTINEL
                one = self.fl.one_mont
                for r_ in range(3 * R):
                    acc_s[r_] = jnp.zeros_like(acc_s[r_])
                for li, v in enumerate(one):
                    acc_s[li] = jnp.full_like(acc_s[li], np.uint32(v))        # X c0
                    acc_s[R + li] = jnp.full_like(acc_s[R + li], np.uint32(v))  # Y c0
                key_s[0] = jnp.full_like(key_s[0], SENTINEL)

            acc = (k.load(acc_s, 0), k.load(acc_s, R), k.load(acc_s, 2 * R))
            ckey = key_s[0]
            xq = k.load_packed(a_ref[0], 0)
            yq = k.load_packed(a_ref[0], PCR)
            inf2 = a_ref[0][2 * PCR] != 0
            key = a_ref[0][2 * PCR + 1]
            negm = a_ref[0][2 * PCR + 2] != 0
            yq = k.select(negm, k.neg(yq), yq)
            same = key == ckey
            eX, eY, eZ, is_dbl = _pmadd_fast(k, acc, xq, yq, inf2)
            one = k.one(eX)
            zero = k.zero(eX)
            fX = k.select(inf2, one, xq)
            fY = k.select(inf2, one, yq)
            fZ = k.select(inf2, zero, one)
            nX = k.select(same, eX, fX)
            nY = k.select(same, eY, fY)
            nZ = k.select(same, eZ, fZ)
            # emit previous run (the pre-update accumulator) as u16 PAIRS:
            # limbs are canonical (< 2^16), so row r = limb 2r | 2r+1 << 16
            # -- halves the emit HBM write and every downstream byte until
            # the post-compaction unpack (msm_tpu.unpack_jac_rows)
            for r_ in range(PJ):
                hi = acc_s[2 * r_ + 1] if 2 * r_ + 1 < 3 * R else 0
                emit_ref[0, r_] = acc_s[2 * r_] | (hi << 16)
            ek_ref[0, 0] = ckey
            ev_ref[0, 0] = ((~same) & (ckey != SENTINEL)).astype(jnp.uint32)
            for idx, row in enumerate(k.flatten(nX) + k.flatten(nY) + k.flatten(nZ)):
                acc_s[idx] = row
            key_s[0] = key

            @pl.when(_any(is_dbl & same))
            def _():
                # rare doubling lanes: patch the accumulator written above
                Xp, Yp, Zp = _patch_dbl(k, acc, (nX, nY, nZ), is_dbl & same)
                for idx, row in enumerate(
                        k.flatten(Xp) + k.flatten(Yp) + k.flatten(Zp)):
                    acc_s[idx] = row

            @pl.when(i == B - 1)
            def _():
                for r_ in range(PJ):          # same u16-pair packing as emits
                    hi = acc_s[2 * r_ + 1] if 2 * r_ + 1 < 3 * R else 0
                    facc_ref[r_] = acc_s[2 * r_] | (hi << 16)
                fkey_ref[0] = key_s[0]

        out = pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, 2 * PCR + 3, S, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((1, PJ, S, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PJ, S, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, PJ, S, 128), jnp.uint32),
                jax.ShapeDtypeStruct((B, 1, S, 128), jnp.uint32),
                jax.ShapeDtypeStruct((B, 1, S, 128), jnp.uint32),
                jax.ShapeDtypeStruct((PJ, S, 128), jnp.uint32),
                jax.ShapeDtypeStruct((1, S, 128), jnp.uint32),
            ),
            scratch_shapes=[
                pltpu.VMEM((3 * R, S, 128), jnp.uint32),
                pltpu.VMEM((1, S, 128), jnp.uint32),
            ],
            interpret=_interpret(),
        )(A_key)
        return out

    @functools.partial(jax.jit, static_argnums=0)
    def weighted_scan(self, slabs):
        """Per-level slab scan of the weighted bucket sum as ONE Pallas call.

        slabs: (nb, m, 3R, Sg, 128): nb independent batches, each of m slabs;
        slab j of batch b holds that batch's lanes [j*G, (j+1)*G).  For each
        batch: C = sum_j slab_j and wc = sum_j j*slab_j by the reversed
        running-sum trick (the grid iterates j = m-1 .. 0 innermost, batches
        outermost; scratch resets at each batch's first step).  The batch
        axis exists because one tile must fit VMEM: callers split wide
        reductions into nb tiles instead of growing Sg (a 32-sublane tile
        blew the 16 MB scoped-vmem limit).  Returns (C, wc), each
        (nb, 3R, Sg, 128).
        """
        R, k = self.R, self.k
        nb, m, _, Sg, _ = slabs.shape

        def kern(s_ref, c_ref, w_ref, run_s, wc_s):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                one = self.fl.one_mont
                for r_ in range(3 * R):
                    run_s[r_] = jnp.zeros_like(run_s[r_])
                    wc_s[r_] = jnp.zeros_like(wc_s[r_])
                for li, v in enumerate(one):
                    for base in (0, R):
                        run_s[base + li] = jnp.full_like(run_s[base + li], np.uint32(v))
                        wc_s[base + li] = jnp.full_like(wc_s[base + li], np.uint32(v))

            run = (k.load(run_s, 0), k.load(run_s, R), k.load(run_s, 2 * R))
            slab = (k.load(s_ref[0][0], 0), k.load(s_ref[0][0], R),
                    k.load(s_ref[0][0], 2 * R))
            nX, nY, nZ, is_dbl = _padd_fast(k, run, slab)
            for idx, row in enumerate(k.flatten(nX) + k.flatten(nY) + k.flatten(nZ)):
                run_s[idx] = row

            @pl.when(_any(is_dbl))
            def _():
                Xp, Yp, Zp = _patch_dbl(k, run, (nX, nY, nZ), is_dbl)
                for idx, row in enumerate(
                        k.flatten(Xp) + k.flatten(Yp) + k.flatten(Zp)):
                    run_s[idx] = row

            @pl.when(j < m - 1)          # slab index m-1-j >= 1
            def _():
                wc = (k.load(wc_s, 0), k.load(wc_s, R), k.load(wc_s, 2 * R))
                nrun = (k.load(run_s, 0), k.load(run_s, R), k.load(run_s, 2 * R))
                wX, wY, wZ, wdbl = _padd_fast(k, wc, nrun)
                for idx, row in enumerate(k.flatten(wX) + k.flatten(wY) + k.flatten(wZ)):
                    wc_s[idx] = row

                @pl.when(_any(wdbl))
                def _():
                    Xp, Yp, Zp = _patch_dbl(k, wc, (wX, wY, wZ), wdbl)
                    for idx, row in enumerate(
                            k.flatten(Xp) + k.flatten(Yp) + k.flatten(Zp)):
                        wc_s[idx] = row

            @pl.when(j == m - 1)
            def _():
                for r_ in range(3 * R):
                    c_ref[0, r_] = run_s[r_]
                    w_ref[0, r_] = wc_s[r_]

        out = pl.pallas_call(
            kern,
            grid=(nb, m),
            in_specs=[pl.BlockSpec((1, 1, 3 * R, Sg, 128),
                                   lambda b, j: (b, m - 1 - j, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((1, 3 * R, Sg, 128), lambda b, j: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * R, Sg, 128), lambda b, j: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb, 3 * R, Sg, 128), jnp.uint32),
                jax.ShapeDtypeStruct((nb, 3 * R, Sg, 128), jnp.uint32),
            ),
            scratch_shapes=[
                pltpu.VMEM((3 * R, Sg, 128), jnp.uint32),
                pltpu.VMEM((3 * R, Sg, 128), jnp.uint32),
            ],
            interpret=_interpret(),
        )(slabs)
        return out
