"""VMEM-resident two-level NTT kernels (the TPU-native radix-2 transform).

Replaces the per-stage HBM round trips of ``ntt.Domain._transform_klayout``
(measured ~3% of speed-of-light at 2^18: every one of the log2(N) stages
re-streamed the whole (L, N) array through HBM with reshape/concat glue).
Here the transform is the classic Bailey/four-step split N = N1 x N2:

  x(L, N1, N2) --kernel A: DIF_N1 along sublanes--> (L, br k1, n2)
             --pointwise mid twiddle  w^(n2 * k1)--> (same layout)
             --transpose------------------------->  (L, n2, br k1)
             --kernel B: DIF_N2 along sublanes---->  (L, br k2, br k1)

Each kernel keeps its whole (L, N1, 128-lane) block in VMEM and runs all
log2(N1) butterfly stages on it before writing back: HBM traffic drops
from ~log2(N) passes to ~6 passes total.  Butterfly pairing is a pair of
static sublane rolls + a mask select; the twiddle multiply runs full-width
(a-lanes multiply by Montgomery 1), trading 2x the minimum multiply count
for zero data movement -- still ~6x under the old per-stage path.

Bit-reversal is never materialized: the mid-twiddle table is precomputed
against the physical (bit-reversed) kernel-A output order, and the final
"fast order" (br k2, br k1) is a documented contract -- evaluation-domain
pipelines (the Groth16 quotient) are pointwise there, and the inverse
pipeline (DIT kernels with inverse twiddles in reverse stage order)
consumes it directly.  Natural-order entry points apply one gather.

Replaces ark-poly Radix2EvaluationDomain's FFT core
(crates/groth16-qap/src/lib.rs:100-169) at production sizes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.fp import Fp, ints_to_limbs
from ..field.limbs import FpLimbs, select as lselect


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bit_rev(j: int, bits: int) -> int:
    return int(f"{j:0{bits}b}"[::-1], 2) if bits else 0


def plan(log_n: int):
    """N1 (kernel-A axis, sublanes) x N2; both >= 128 so each pass can put
    the OTHER axis on the 128-lane grid."""
    l1 = (log_n + 1) // 2
    return 1 << l1, 1 << (log_n - l1)


def supported(log_n: int) -> bool:
    n1, n2 = plan(log_n)
    return n2 >= 128 and n1 <= 1024       # lanes floor / VMEM block ceiling


# --------------------------------------------------------------- host tables

def _stage_twiddles(p: int, L: int, M: int, omega_m: int, inverse: bool):
    """(nstages, M, L) u32: stage s (DIF order, half h = M >> (s+1)) holds
    per-sublane twiddles at their PHYSICAL positions: 1 on a-lanes,
    omega_{2h}^(pos mod h) on b-lanes.  ``inverse``: elementwise inverse
    values (for the DIT undo pass; caller reverses stage order)."""
    R = 1 << (16 * L)
    nst = M.bit_length() - 1
    out = np.empty((nst, M, L), np.uint32)
    for s in range(nst):
        h = M >> (s + 1)
        base = pow(omega_m, M // (2 * h), p)
        if inverse:
            base = pow(base, -1, p)
        vals = []
        wj = 1
        for j in range(h):
            vals.append(wj)
            wj = wj * base % p
        col = [1] * M
        for b0 in range(0, M, 2 * h):
            for j in range(h):
                col[b0 + h + j] = vals[j]
        out[s] = ints_to_limbs([v * R % p for v in col], L)
    return out


def _mid_table(p: int, L: int, N1: int, N2: int, omega: int, inverse: bool,
               scale: int = 1):
    """(L, N1, N2) mid twiddle in kernel-A physical output order:
    W[j, n2] = omega^(n2 * bitrev(j)) * scale, Montgomery form."""
    R = 1 << (16 * L)
    bits = N1.bit_length() - 1
    w = pow(omega, -1, p) if inverse else omega % p
    tab = np.empty((N1, N2, L), np.uint32)
    for j in range(N1):
        base = pow(w, _bit_rev(j, bits), p)
        v = scale % p
        row = []
        for _ in range(N2):
            row.append(v * R % p)
            v = v * base % p
        tab[j] = ints_to_limbs(row, L)
    return np.transpose(tab, (2, 0, 1)).copy()


def _power_table(p: int, L: int, base: int, n: int, scale: int = 1):
    """(n, L) Montgomery table of scale * base^i."""
    R = 1 << (16 * L)
    row = []
    v = scale % p
    b = base % p
    for _ in range(n):
        row.append(v * R % p)
        v = v * b % p
    return ints_to_limbs(row, L)


def _nat_perm(N1: int, N2: int) -> np.ndarray:
    """perm such that natural[k] = fast_flat[perm[k]] for the fast order
    flat index br(k2) * N1 + br(k1)."""
    b1, b2 = N1.bit_length() - 1, N2.bit_length() - 1
    k = np.arange(N1 * N2)
    k2, k1 = k // N1, k % N1
    rev = lambda a, b: np.array([_bit_rev(int(v), b) for v in a])
    return (rev(k2, b2) * N1 + rev(k1, b1)).astype(np.int32)


# ------------------------------------------------------------------- kernels

def _dft_kern(fl: FpLimbs, L: int, M: int, direction: str, nst: int):
    """Kernel body: all log2(M) butterfly stages on a (L, M, 128) block.

    direction 'dif': natural-in, bit-reversed-out (twiddle AFTER sub).
    direction 'dit': the exact inverse network (twiddle BEFORE add/sub,
    stages in ascending h); composing dif then dit with inverse twiddles
    returns 2^nst * x (callers fold the scale into a table).
    """

    def kern(x_ref, tw_ref, o_ref):
        xs = [x_ref[i] for i in range(L)]
        iota = jax.lax.broadcasted_iota(jnp.uint32, (M, 128), 0)
        order = range(nst) if direction == "dif" else range(nst - 1, -1, -1)
        for s in order:
            h = M >> (s + 1)
            mask_a = (iota & jnp.uint32(h)) == 0
            tw_s = tw_ref[s]
            w = [jnp.broadcast_to(tw_s[:, i:i + 1], (M, 128)) for i in range(L)]
            if direction == "dif":
                up = [jnp.roll(x, -h, axis=0) for x in xs]
                dn = [jnp.roll(x, h, axis=0) for x in xs]
                partner = lselect(mask_a, up, dn)
                pre = lselect(mask_a, fl.add(xs, partner),
                              fl.sub(partner, xs))
                xs = fl.mul(pre, w)
            else:
                xw = fl.mul(xs, w)
                up = [jnp.roll(x, -h, axis=0) for x in xw]
                dn = [jnp.roll(x, h, axis=0) for x in xw]
                partner = lselect(mask_a, up, dn)
                xs = lselect(mask_a, fl.add(xw, partner),
                             fl.sub(partner, xw))
        for i in range(L):
            o_ref[i] = xs[i]

    return kern


@functools.partial(jax.jit, static_argnames=("p", "L", "M", "direction"))
def _dft_pass(p: int, L: int, M: int, direction: str, x3, tw):
    """x3: (L, M, Nb) klayout; tw: (nst, M, L).  Grid over Nb/128 lanes."""
    fl = FpLimbs(p, L)
    nst = M.bit_length() - 1
    Nb = x3.shape[2]
    spec = pl.BlockSpec((L, M, 128), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec((nst, M, L), lambda g: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    kw = {}
    if not _interpret():
        # the stage butterflies hold ~5 full (L, M, 128) temporaries plus
        # mul internals; at M = 512 that overflows the default 16 MB scoped
        # VMEM limit -- raise it (v5e VMEM is larger than the default cap)
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        _dft_kern(fl, L, M, direction, nst),
        grid=(Nb // 128,),
        in_specs=[spec, twspec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x3.shape, jnp.uint32),
        interpret=_interpret(), **kw)(x3, tw)


@functools.partial(jax.jit, static_argnames=("p", "L"))
def _mul_k(p: int, L: int, a, b):
    """Pointwise Montgomery mul on klayout (L, ...) arrays of equal shape."""
    fl = FpLimbs(p, L)
    sh = a.shape
    n = int(np.prod(sh[1:]))
    st = 8
    while (n // 128) % st:
        st -= 1
    a2 = a.reshape(L, n // 128, 128)
    b2 = b.reshape(L, n // 128, 128)
    spec = pl.BlockSpec((L, st, 128), lambda g: (0, g, 0),
                        memory_space=pltpu.VMEM)

    def kern(a_ref, b_ref, o_ref):
        out = fl.mul([a_ref[i] for i in range(L)],
                     [b_ref[i] for i in range(L)])
        for i in range(L):
            o_ref[i] = out[i]

    out = pl.pallas_call(
        kern, grid=((n // 128) // st,), in_specs=[spec, spec],
        out_specs=spec, out_shape=jax.ShapeDtypeStruct(a2.shape, jnp.uint32),
        interpret=_interpret())(a2, b2)
    return out.reshape(sh)


@functools.partial(jax.jit, static_argnames=("p", "L", "const_mont"))
def _mulsub_const_k(p: int, L: int, const_mont: tuple, a, b, c):
    """(a * b - c) * const on klayout (L, N) arrays -- the fused coset
    quotient numerator (Groth16 H pipeline), one kernel pass."""
    fl = FpLimbs(p, L)
    sh = a.shape
    n = int(np.prod(sh[1:]))
    st = 8
    while (n // 128) % st:
        st -= 1
    a2, b2, c2 = (t.reshape(L, n // 128, 128) for t in (a, b, c))
    spec = pl.BlockSpec((L, st, 128), lambda g: (0, g, 0),
                        memory_space=pltpu.VMEM)

    def kern(a_ref, b_ref, c_ref, o_ref):
        t = fl.mul([a_ref[i] for i in range(L)], [b_ref[i] for i in range(L)])
        t = fl.sub(t, [c_ref[i] for i in range(L)])
        k = [jnp.uint32(v) for v in const_mont]
        out = fl.mul(t, [jnp.zeros_like(t[0]) + k[i] for i in range(L)])
        for i in range(L):
            o_ref[i] = out[i]

    out = pl.pallas_call(
        kern, grid=((n // 128) // st,), in_specs=[spec, spec, spec],
        out_specs=spec, out_shape=jax.ShapeDtypeStruct(a2.shape, jnp.uint32),
        interpret=_interpret())(a2, b2, c2)
    return out.reshape(sh)


# ------------------------------------------------------------------ pipeline

class KNTT:
    """Two-level kernel NTT bound to one (field, log_n, omega).

    Public data contract: klayout arrays (L, N) in Montgomery form.
    ``fast_*`` methods use the fast evaluation order (br k2, br k1);
    ``ntt``/``intt`` are natural-order (one extra gather).
    """

    def __init__(self, field: Fp, log_n: int, omega: int):
        assert supported(log_n), f"kntt supports 2^14..2^20, got 2^{log_n}"
        p, L = field.p, field.n
        self.field = field
        self.p, self.L = p, L
        self.log_n = log_n
        self.n = 1 << log_n
        self.N1, self.N2 = plan(log_n)
        self.omega = omega % p
        w1 = pow(self.omega, self.N2, p)       # omega_{N1}
        w2 = pow(self.omega, self.N1, p)       # omega_{N2}
        self.twA_f = jnp.asarray(_stage_twiddles(p, L, self.N1, w1, False))
        self.twB_f = jnp.asarray(_stage_twiddles(p, L, self.N2, w2, False))
        self.twA_i = jnp.asarray(_stage_twiddles(p, L, self.N1, w1, True))
        self.twB_i = jnp.asarray(_stage_twiddles(p, L, self.N2, w2, True))
        self.mid_f = jnp.asarray(_mid_table(p, L, self.N1, self.N2,
                                            self.omega, False))
        n_inv = pow(self.n, -1, p)
        self.mid_i = jnp.asarray(_mid_table(p, L, self.N1, self.N2,
                                            self.omega, True, scale=n_inv))
        self._perm = jnp.asarray(_nat_perm(self.N1, self.N2))
        self._iperm = jnp.asarray(np.argsort(_nat_perm(self.N1, self.N2))
                                  .astype(np.int32))
        self._coset = {}

    # ---- fast (paired) order

    def fast_ntt(self, xk):
        """(L, N) natural-index input -> (L, N) fast-order evaluations."""
        p, L, N1, N2 = self.p, self.L, self.N1, self.N2
        y = _dft_pass(p, L, N1, "dif", xk.reshape(L, N1, N2), self.twA_f)
        y = _mul_k(p, L, y, self.mid_f)
        z = _dft_pass(p, L, N2, "dif", jnp.swapaxes(y, 1, 2), self.twB_f)
        return z.reshape(L, self.n)

    def fast_intt(self, zk):
        """(L, N) fast-order evaluations -> (L, N) natural coefficients
        (1/n scale included via the inverse mid table)."""
        p, L, N1, N2 = self.p, self.L, self.N1, self.N2
        y = _dft_pass(p, L, N2, "dit", zk.reshape(L, N2, N1), self.twB_i)
        y = _mul_k(p, L, jnp.swapaxes(y, 1, 2), self.mid_i)
        x = _dft_pass(p, L, N1, "dit", y, self.twA_i)
        return x.reshape(L, self.n)

    def coset_table(self, shift: int, inverse: bool):
        key = (shift % self.p, inverse)
        if key not in self._coset:
            base = pow(shift, -1, self.p) if inverse else shift
            tab = _power_table(self.p, self.L, base, self.n)
            self._coset[key] = jnp.asarray(np.transpose(tab, (1, 0)).copy())
        return self._coset[key]          # (L, N)

    def fast_coset_ntt(self, xk, shift: int):
        return self.fast_ntt(_mul_k(self.p, self.L, xk,
                                    self.coset_table(shift, False)))

    def fast_coset_intt(self, zk, shift: int):
        return _mul_k(self.p, self.L, self.fast_intt(zk),
                      self.coset_table(shift, True))

    # ---- natural order (one extra lane gather)

    def ntt(self, xk):
        return jnp.take(self.fast_ntt(xk), self._perm, axis=1)

    def intt(self, yk):
        return self.fast_intt(jnp.take(yk, self._iperm, axis=1))


@functools.lru_cache(maxsize=None)
def kntt_for(p: int, L: int, log_n: int, omega: int) -> KNTT:
    """Shared instances (table build costs ~seconds at 2^18; jit caches key
    on static identity)."""

    class _F:  # minimal Fp stand-in (avoid importing curve params here)
        pass

    f = _F()
    f.p, f.n = p, L
    return KNTT(f, log_n, omega)
