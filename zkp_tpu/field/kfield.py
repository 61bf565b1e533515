"""Elementwise Pallas field ops on (N, L) arrays (drop-in for Fp hot paths).

Wraps the limb-list core (limbs.py) in per-op Pallas kernels operating on
klayout (L, S, 128) blocks; the public API takes/returns the codebase-wide
(N, L) trailing-limb convention and pays one XLA relayout per direction —
negligible next to the >1000x kernel-vs-XLA field-multiply gap measured in
scripts/pallas_mul_proto.py.

Also provides the fused NTT butterfly (t = b*w; out (a+t, a-t)) used by the
kernelized radix-2 NTT in zkp_tpu.ntt.kntt.

TPU-only (Mosaic); callers gate on ``jax.default_backend() == "tpu"`` — the
limb-list graphs take minutes to compile on XLA:CPU, where the existing
vectorized fp.py path is the right backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import FpLimbs


class KField:
    """Pallas elementwise ops for one prime field; (N, L) API, N % 128 == 0
    handled by internal padding."""

    def __init__(self, p: int, L: int, st: int = 8):
        self.fl = FpLimbs(p, L)
        self.L = L
        self.st = st

    # -------------------------------------------------------------- layout

    def _pad(self, a):
        N = a.shape[0]
        blk = 128 * self.st
        Np = -(-N // blk) * blk
        if Np != N:
            a = jnp.concatenate(
                [a, jnp.zeros((Np - N,) + a.shape[1:], a.dtype)], axis=0)
        return a, N

    def _to_k(self, a):
        N = a.shape[0]
        return jnp.transpose(a, (1, 0)).reshape(self.L, N // 128, 128)

    def _from_k(self, k, N):
        return jnp.transpose(k.reshape(self.L, -1), (1, 0))[:N]

    def _call2(self, kernel, a, b):
        """Binary elementwise op on (N, L) operands (b broadcastable on N)."""
        N = a.shape[0]
        if b.shape[0] != N:
            b = jnp.broadcast_to(b, a.shape)
        a, N0 = self._pad(a)
        b, _ = self._pad(b)
        ka, kb = self._to_k(a), self._to_k(b)
        S = ka.shape[1]
        st = min(self.st, S)
        spec = pl.BlockSpec((self.L, st, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel, grid=(S // st,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(ka.shape, jnp.uint32))(ka, kb)
        return self._from_k(out, N0)

    # ---------------------------------------------------------------- ops

    @functools.partial(jax.jit, static_argnums=0)
    def mul(self, a, b):
        fl, L = self.fl, self.L

        def kern(a_ref, b_ref, o_ref):
            x = [a_ref[i] for i in range(L)]
            y = [b_ref[i] for i in range(L)]
            out = fl.mul(x, y)
            for i in range(L):
                o_ref[i] = out[i]

        return self._call2(kern, a, b)

    @functools.partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        fl, L = self.fl, self.L

        def kern(a_ref, b_ref, o_ref):
            out = fl.add([a_ref[i] for i in range(L)], [b_ref[i] for i in range(L)])
            for i in range(L):
                o_ref[i] = out[i]

        return self._call2(kern, a, b)

    @functools.partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        fl, L = self.fl, self.L

        def kern(a_ref, b_ref, o_ref):
            out = fl.sub([a_ref[i] for i in range(L)], [b_ref[i] for i in range(L)])
            for i in range(L):
                o_ref[i] = out[i]

        return self._call2(kern, a, b)

    @functools.partial(jax.jit, static_argnums=0)
    def mul_sub(self, a, b, c):
        """a*b - c fused (one kernel): the H-quotient pointwise step."""
        fl, L = self.fl, self.L

        def kern(a_ref, b_ref, c_ref, o_ref):
            x = [a_ref[i] for i in range(L)]
            y = [b_ref[i] for i in range(L)]
            z = [c_ref[i] for i in range(L)]
            out = fl.sub(fl.mul(x, y), z)
            for i in range(L):
                o_ref[i] = out[i]

        N = a.shape[0]
        a, N0 = self._pad(a)
        b, _ = self._pad(jnp.broadcast_to(b, (N,) + b.shape[1:]) if b.shape[0] != N else b)
        c, _ = self._pad(jnp.broadcast_to(c, (N,) + c.shape[1:]) if c.shape[0] != N else c)
        ka, kb, kc = self._to_k(a), self._to_k(b), self._to_k(c)
        S = ka.shape[1]
        st = min(self.st, S)
        spec = pl.BlockSpec((self.L, st, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern, grid=(S // st,), in_specs=[spec] * 3, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(ka.shape, jnp.uint32))(ka, kb, kc)
        return self._from_k(out, N0)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def mul_const(self, a, c_int: int):
        """a * const (const given in standard form as a python int; the
        Montgomery product a*c*R^-1 makes this from_mont when c == 1)."""
        from .limbs import const_limbs, mul_cols
        fl, L = self.fl, self.L
        cl = const_limbs(int(c_int), L)

        def kern(a_ref, o_ref):
            x = [a_ref[i] for i in range(L)]
            y = [jnp.full_like(x[0], jnp.uint32(v)) for v in cl]
            out = fl.mul(x, y)
            for i in range(L):
                o_ref[i] = out[i]

        N = a.shape[0]
        a, N0 = self._pad(a)
        ka = self._to_k(a)
        S = ka.shape[1]
        st = min(self.st, S)
        spec = pl.BlockSpec((self.L, st, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern, grid=(S // st,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(ka.shape, jnp.uint32))(ka)
        return self._from_k(out, N0)

    def from_mont(self, a):
        return self.mul_const(a, 1)

    @functools.partial(jax.jit, static_argnums=0)
    def reduce_wide(self, limbs):
        """Reduce carried (N, m<=2L) 16-bit limb values mod p (fused kernel:
        Montgomery reduce + scale back by R^2).  Drop-in for Fp.reduce_wide."""
        fl, L = self.fl, self.L
        m = limbs.shape[1]
        assert m <= 2 * L

        def kern(a_ref, o_ref):
            cols = [a_ref[i] for i in range(m)]
            zero = jnp.zeros_like(cols[0])
            cols = cols + [zero] * (2 * L - m)
            t = fl.mont_reduce_cols(cols)            # S * R^-1 mod p
            r2 = [jnp.full_like(zero, jnp.uint32(v)) for v in fl.r2_limbs]
            out = fl.mul(t, r2)                      # * R^2 * R^-1 = S mod p
            for i in range(L):
                o_ref[i] = out[i]

        N = limbs.shape[0]
        limbs, N0 = self._pad(limbs)
        Np = limbs.shape[0]
        ka = jnp.transpose(limbs, (1, 0)).reshape(m, Np // 128, 128)
        S = ka.shape[1]
        st = min(self.st, S)
        in_spec = pl.BlockSpec((m, st, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((self.L, st, 128), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern, grid=(S // st,), in_specs=[in_spec], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((self.L, S, 128), jnp.uint32))(ka)
        return self._from_k(out, N0)

    # ------------------------------------------------------------ butterfly

    @functools.partial(jax.jit, static_argnums=0)
    def butterfly_k(self, a, b, w):
        """(a + b*w, a - b*w) on klayout-flat (L, M) arrays (M % 128 == 0).

        The klayout-resident NTT uses this to avoid the two relayouts per
        stage the (N, L)-convention butterfly pays.
        """
        fl, L = self.fl, self.L

        def kern(a_ref, b_ref, w_ref, s_ref, d_ref):
            x = [a_ref[i] for i in range(L)]
            y = [b_ref[i] for i in range(L)]
            tw = [w_ref[i] for i in range(L)]
            t = fl.mul(y, tw)
            s = fl.add(x, t)
            d = fl.sub(x, t)
            for i in range(L):
                s_ref[i] = s[i]
                d_ref[i] = d[i]

        M = a.shape[1]
        S = M // 128
        st = min(self.st, S)
        while S % st:
            st -= 1
        ka = a.reshape(L, S, 128)
        kb = b.reshape(L, S, 128)
        kw = w.reshape(L, S, 128)
        spec = pl.BlockSpec((L, st, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        ss, dd = pl.pallas_call(
            kern, grid=(S // st,), in_specs=[spec] * 3, out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct(ka.shape, jnp.uint32),) * 2)(ka, kb, kw)
        return ss.reshape(L, M), dd.reshape(L, M)

    @functools.partial(jax.jit, static_argnums=0)
    def butterfly(self, a, b, w):
        """(a + b*w, a - b*w) elementwise on (N, L); the DIT NTT stage core."""
        fl, L = self.fl, self.L

        def kern(a_ref, b_ref, w_ref, s_ref, d_ref):
            x = [a_ref[i] for i in range(L)]
            y = [b_ref[i] for i in range(L)]
            tw = [w_ref[i] for i in range(L)]
            t = fl.mul(y, tw)
            s = fl.add(x, t)
            d = fl.sub(x, t)
            for i in range(L):
                s_ref[i] = s[i]
                d_ref[i] = d[i]

        N = a.shape[0]
        if w.shape[0] != N:
            w = jnp.broadcast_to(w, a.shape)
        a, N0 = self._pad(a)
        b, _ = self._pad(b)
        w, _ = self._pad(w)
        ka, kb, kw = self._to_k(a), self._to_k(b), self._to_k(w)
        S = ka.shape[1]
        st = min(self.st, S)
        spec = pl.BlockSpec((self.L, st, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        ss, dd = pl.pallas_call(
            kern, grid=(S // st,), in_specs=[spec] * 3, out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct(ka.shape, jnp.uint32),) * 2)(ka, kb, kw)
        return self._from_k(ss, N0), self._from_k(dd, N0)


_kfields: dict = {}


def kfield(p: int, L: int) -> KField:
    key = (int(p), int(L))
    if key not in _kfields:
        _kfields[key] = KField(*key)
    return _kfields[key]
