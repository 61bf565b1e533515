"""Pallas TPU kernels for the hot field ops (Montgomery multiply).

The jnp limb kernels in ``fp.py`` rely on XLA fusion; this module provides
the explicit Pallas path: each grid step loads a (TILE, L) block of limbs
into VMEM, runs the full SOS Montgomery multiply with the limb loops
unrolled in-kernel (so every intermediate stays on-chip), and writes the
reduced product back.  ``PallasFieldOps.mul`` is drop-in compatible with
``Fp.mul`` for 2-D (N, L) operands; the bench harness A/Bs the two paths.

Runs in interpreter mode automatically off-TPU so tests exercise the same
code path on CPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp import Fp, LIMB_BITS, MASK


def _mont_mul_block(a, b, p_limbs, pinv_limbs, n):
    """SOS Montgomery multiply on (TILE, n) uint32 blocks.

    Works on *unstacked* per-limb (TILE,) vectors so column accumulation is
    plain vector adds -- Mosaic has no scatter-add, and the limb axis is a
    python list anyway (fully unrolled, ~O(n^2) ops compiled once)."""
    al = [a[..., i] for i in range(n)]
    bl = [b[..., i] for i in range(n)]
    pl_ = [p_limbs[..., i] for i in range(n)]
    pv = [pinv_limbs[..., i] for i in range(n)]
    zero = jnp.zeros_like(al[0])

    def carry(cols, n_out):
        outs = []
        c = zero
        for k in range(len(cols)):
            t = cols[k] + c
            outs.append(t & MASK)
            c = t >> LIMB_BITS
        while len(outs) < n_out:
            outs.append(c & MASK)
            c = c >> LIMB_BITS
        return outs[:n_out], c

    def mul_cols(x, y, out_len):
        cols = [zero] * out_len
        for i in range(len(x)):
            for j in range(len(y)):
                k = i + j
                if k >= out_len:
                    continue
                prod = x[i] * y[j]
                cols[k] = cols[k] + (prod & MASK)
                if k + 1 < out_len:
                    cols[k + 1] = cols[k + 1] + (prod >> LIMB_BITS)
        return cols

    def sub_limbs(x, y):
        outs = []
        brw = zero
        for k in range(n):
            t = x[k] + (1 << LIMB_BITS) - y[k] - brw
            outs.append(t & MASK)
            brw = 1 - (t >> LIMB_BITS)
        return outs, brw

    t_cols = mul_cols(al, bl, 2 * n)
    t, _ = carry(t_cols, 2 * n)
    m, _ = carry(mul_cols(t[:n], pv, n), n)
    mp_cols = mul_cols(m, pl_, 2 * n)
    u, c = carry([t[k] + mp_cols[k] for k in range(2 * n)], 2 * n)
    res = u[n:]
    d, borrow = sub_limbs(res, [jnp.broadcast_to(x, res[0].shape) for x in pl_])
    take_d = (c == 1) | (borrow == 0)
    out = [jnp.where(take_d, dk, rk) for dk, rk in zip(d, res)]
    return jnp.stack(out, axis=-1)


class PallasFieldOps:
    """Pallas-backed batched field ops for one Fp instance."""

    def __init__(self, field: Fp, tile: int = 256, interpret: bool | None = None):
        self.field = field
        self.tile = tile
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self.interpret = interpret
        self._p = jnp.asarray(field.p_limbs)
        self._pinv = jnp.asarray(field.pinv_limbs)
        self._mul = jax.jit(functools.partial(self._mul_impl))

    def _kernel(self, a_ref, b_ref, p_ref, pinv_ref, o_ref):
        n = self.field.n
        o_ref[:] = _mont_mul_block(a_ref[:], b_ref[:], p_ref[0], pinv_ref[0], n)

    def _mul_impl(self, a, b):
        n = self.field.n
        N = a.shape[0]
        tile = min(self.tile, N)
        grid = -(-N // tile)
        pad = grid * tile - N
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad, n), a.dtype)])
            b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)])
        out = pl.pallas_call(
            self._kernel,
            out_shape=jax.ShapeDtypeStruct((grid * tile, n), jnp.uint32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((tile, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tile, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )(a, b, self._p[None], self._pinv[None])
        return out[:N] if pad else out

    def mul(self, a, b):
        """(N, L) x (N, L) Montgomery product via the Pallas kernel."""
        assert a.ndim == 2 and b.shape == a.shape
        return self._mul(a, b)
