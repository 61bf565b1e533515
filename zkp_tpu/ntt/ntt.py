"""Radix-2 NTT / iNTT over the scalar field, batched and XLA-friendly.

TPU-native replacement for ark-poly's ``Radix2EvaluationDomain`` (used by the
reference for QAP interpolation, ``crates/groth16-qap/src/lib.rs:100-169``).
Design:

  - iterative Cooley-Tukey DIT with one up-front bit-reversal gather and
    log2(N) stages of static-slice butterflies (reshape + concat, no dynamic
    control flow, so XLA tiles it cleanly),
  - field elements are (..., N, L) uint32 limb arrays in Montgomery form;
    batch axes vectorize over the VPU lanes,
  - one shared (N/2, L) twiddle table; stage s uses the strided view
    ``W[::N/2^s]`` so memory stays O(N),
  - coset transforms (for the evaluation-form Groth16 quotient
    H = (A.B - C) / Z on a coset, fixing reference bug SURVEY.md 2.9(7))
    are input/output scalings by coset-power tables.

The distributed (multi-chip) variant lives in ``zkp_tpu.parallel``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field.fp import Fp, ints_to_limbs


def _bit_reverse_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class Domain:
    """A radix-2 evaluation domain of size 2^log_n over a prime field."""

    def __init__(self, field: Fp, log_n: int, omega: int, coset_gen: int | None = None):
        self.field = field
        self.log_n = int(log_n)
        self.n = 1 << self.log_n
        p = field.p
        self.omega = omega % p
        assert pow(self.omega, self.n, p) == 1
        if self.n > 1:
            assert pow(self.omega, self.n // 2, p) != 1, "omega is not primitive"
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(self.n, -1, p)
        self.coset_gen = coset_gen  # set lazily via with_coset / curve default

        self._perm = jnp.asarray(_bit_reverse_perm(self.log_n))

        # twiddle tables W[j] = omega^j (mont), j < n/2 ; and inverse
        half = max(self.n // 2, 1)
        fwd, inv = [], []
        w, wi = 1, 1
        R = field.R_int
        for _ in range(half):
            fwd.append(w * R % p)
            inv.append(wi * R % p)
            w = w * self.omega % p
            wi = wi * self.omega_inv % p
        self._tw_fwd = jnp.asarray(ints_to_limbs(fwd, field.n))
        self._tw_inv = jnp.asarray(ints_to_limbs(inv, field.n))
        self._n_inv_mont = jnp.asarray(ints_to_limbs([self.n_inv * R % p], field.n)[0])
        self._pow_cache: dict = {}
        self._jit_cache: dict = {}

    # ------------------------------------------------------------- power tabs

    def powers(self, base: int, count: int | None = None):
        """(count, L) mont table of base^j, cached."""
        count = self.n if count is None else count
        key = (base % self.field.p, count)
        if key not in self._pow_cache:
            p, R = self.field.p, self.field.R_int
            vals = []
            acc = 1
            for _ in range(count):
                vals.append(acc * R % p)
                acc = acc * (base % p) % p
            self._pow_cache[key] = jnp.asarray(ints_to_limbs(vals, self.field.n))
        return self._pow_cache[key]

    # ----------------------------------------------------------------- kernel

    def _use_kernels(self) -> bool:
        import jax as _jax
        return _jax.default_backend() == "tpu" and self.n >= 512

    def _kf(self):
        from ..field.kfield import kfield
        return kfield(self.field.p, self.field.n)

    def kntt_ok(self) -> bool:
        """VMEM-resident two-level kernel transform available for this size?"""
        from . import kntt as _k
        return self._use_kernels() and _k.supported(self.log_n)

    def kn(self):
        from .kntt import kntt_for
        return kntt_for(self.field.p, self.field.n, self.log_n, self.omega)

    def _transform(self, x, tw):
        f = self.field
        N, L = self.n, f.n
        assert x.shape[-2] == N, f"expected (..., {N}, {L})"
        batch = x.shape[:-2]
        if (not batch) and self._use_kernels() and N >= 2048:
            return self._transform_klayout(x, tw)
        x = jnp.take(x, self._perm, axis=-2)
        kf = self._kf() if self._use_kernels() else None
        for s in range(1, self.log_n + 1):
            m = 1 << s
            half = m // 2
            stride = (self.n // 2) // half
            w = tw[::stride]  # (half, L)
            xv = x.reshape(batch + (N // m, m, L))
            a = xv[..., :half, :]
            b = xv[..., half:, :]
            if kf is not None:
                # fused Pallas butterfly: one kernel per stage, full lanes
                af = a.reshape(-1, L)
                bf = b.reshape(-1, L)
                wf = jnp.broadcast_to(w, a.shape).reshape(-1, L)
                sf, df = kf.butterfly(af, bf, wf)
                x = jnp.concatenate(
                    [sf.reshape(a.shape), df.reshape(a.shape)],
                    axis=-2).reshape(batch + (N, L))
            else:
                t = f.mul(b, w)
                x = jnp.concatenate(
                    [f.add(a, t), f.sub(a, t)], axis=-2).reshape(batch + (N, L))
        return x

    def _jitted(self, kind: str, *extra):
        """Whole-transform jit (TPU only): an eager stage loop pays one
        dispatch per op through the device tunnel (~ms each) -- two orders
        of magnitude over the compute at 2^18.  On CPU the eager per-op
        path stays: one fused XLA:CPU module over log2(n) stages of limb
        graphs takes minutes to compile."""
        key = (kind,) + extra
        if key not in self._jit_cache:
            if self.kntt_ok():
                # two-level VMEM-resident kernels (kntt.py); natural-order
                # contract preserved via the fast-order permutation
                kn = self.kn()
                tk = lambda x: jnp.transpose(x, (1, 0))
                if kind == "ntt":
                    f = lambda x: tk(kn.ntt(tk(x)))
                elif kind == "intt":
                    f = lambda x: tk(kn.intt(tk(x)))
                elif kind == "coset_ntt":
                    s = extra[0]
                    f = lambda x: tk(jnp.take(kn.fast_coset_ntt(tk(x), s),
                                              kn._perm, axis=1))
                elif kind == "coset_intt":
                    s = extra[0]
                    f = lambda x: tk(kn.fast_coset_intt(
                        jnp.take(tk(x), kn._iperm, axis=1), s))
                else:
                    raise ValueError(kind)
                self._jit_cache[key] = jax.jit(f)
                return self._jit_cache[key]
            if kind == "ntt":
                f = lambda x: self._transform(x, self._tw_fwd)
            elif kind == "intt":
                f = lambda x: self._mul(self._transform(x, self._tw_inv),
                                        self._n_inv_mont)
            elif kind == "coset_ntt":
                tab = self.powers(extra[0])
                f = lambda x: self._transform(self._mul(x, tab), self._tw_fwd)
            elif kind == "coset_intt":
                itab = self.powers(pow(extra[0], -1, self.field.p))
                f = lambda x: self._mul(
                    self._mul(self._transform(x, self._tw_inv),
                              self._n_inv_mont), itab)
            else:
                raise ValueError(kind)
            self._jit_cache[key] = jax.jit(f)
        return self._jit_cache[key]

    def ntt(self, coeffs):
        """Coefficients -> evaluations at [omega^0 .. omega^(n-1)] (natural order)."""
        if self.n == 1:
            return coeffs
        if self._use_kernels() and coeffs.ndim == 2:
            return self._jitted("ntt")(coeffs)
        return self._transform(coeffs, self._tw_fwd)

    def _transform_klayout(self, x, tw):
        """Limb-major (klayout-resident) transform: ONE transpose in and out;
        every stage is one fused Pallas butterfly on (L, N/2) flat arrays.

        Pairing/recombination are pure lane-axis reshape/slice/concat on the
        (L, N) array -- no (N, L) <-> (L, N) relayout per stage.
        """
        f = self.field
        N, L = self.n, f.n
        kf = self._kf()
        x = jnp.take(x, self._perm, axis=-2)
        xk = jnp.transpose(x, (1, 0))                 # (L, N)
        twk = jnp.transpose(tw, (1, 0))               # (L, N/2)
        for s in range(1, self.log_n + 1):
            m = 1 << s
            half = m // 2
            stride = (N // 2) // half
            w = twk[:, ::stride]                      # (L, half)
            xv = xk.reshape(L, N // m, m)
            a = xv[:, :, :half].reshape(L, N // 2)
            b = xv[:, :, half:].reshape(L, N // 2)
            wf = jnp.broadcast_to(w[:, None, :], (L, N // m, half)).reshape(L, N // 2)
            ss, dd = kf.butterfly_k(a, b, wf)
            xk = jnp.concatenate(
                [ss.reshape(L, N // m, half), dd.reshape(L, N // m, half)],
                axis=2).reshape(L, N)
        return jnp.transpose(xk, (1, 0))

    def _mul(self, a, b):
        """Elementwise field mul routed to the Pallas kernel on TPU."""
        if self._use_kernels() and a.ndim == 2:
            return self._kf().mul(a, jnp.broadcast_to(b, a.shape))
        return self.field.mul(a, b)

    def intt(self, evals):
        """Evaluations -> coefficients."""
        if self.n == 1:
            return evals
        if self._use_kernels() and evals.ndim == 2:
            return self._jitted("intt")(evals)
        out = self._transform(evals, self._tw_inv)
        return self._mul(out, self._n_inv_mont)

    def coset_ntt(self, coeffs, shift: int):
        """Evaluate on the coset shift * H: scale coeffs by shift^i, then NTT."""
        if self.n > 1 and self._use_kernels() and coeffs.ndim == 2:
            return self._jitted("coset_ntt", shift % self.field.p)(coeffs)
        scaled = self._mul(coeffs, self.powers(shift))
        return self.ntt(scaled)

    def coset_intt(self, evals, shift: int):
        """Interpolate from evaluations on shift * H."""
        if self.n > 1 and self._use_kernels() and evals.ndim == 2:
            return self._jitted("coset_intt", shift % self.field.p)(evals)
        coeffs = self.intt(evals)
        return self._mul(coeffs, self.powers(pow(shift, -1, self.field.p)))

    # ------------------------------------------------------------- evaluation

    def vanishing_at(self, point: int) -> int:
        """Z(point) = point^n - 1 (host int)."""
        return (pow(point, self.n, self.field.p) - 1) % self.field.p

    def vanishing_on_coset(self, shift: int) -> int:
        """Z is constant on a coset: Z(shift * w^j) = shift^n - 1."""
        return (pow(shift, self.n, self.field.p) - 1) % self.field.p

    def lagrange_coeffs_at(self, s: int):
        """(n, L) mont array of L_j(s) = Z(s) * w^j / (n * (s - w^j)).

        Used by the trusted setup to evaluate all QAP polynomials at the
        toxic point s in O(nnz) without any per-variable iNTT
        (vs reference crates/groth16-qap/src/lib.rs:143-170).
        """
        f = self.field
        p = f.p
        s = s % p
        if pow(s, self.n, p) == 1:
            # s lies on the domain: L_j(s) = [s == w^j]
            w = 1
            vals = []
            for _ in range(self.n):
                vals.append(f.R_int % p if w == s else 0)
                w = w * self.omega % p
            return jnp.asarray(ints_to_limbs(vals, f.n))
        zs_over_n = self.vanishing_at(s) * self.n_inv % p
        wj = self.powers(self.omega)                      # (n, L) mont
        s_arr = f.const(s, shape=(self.n,))
        denom = f.sub(s_arr, wj)                          # s - w^j
        denom_inv = f.batch_inv(denom)
        num = f.mul(wj, f.const(zs_over_n, shape=(self.n,)))
        return f.mul(num, denom_inv)


class DomainCache:
    """Per-curve domain cache (keyed by log_n)."""

    def __init__(self, curve):
        self.curve = curve
        self._cache = {}

    def get(self, log_n: int) -> Domain:
        if log_n not in self._cache:
            root = self.curve.domain_root(log_n)
            self._cache[log_n] = Domain(self.curve.fr, log_n, root,
                                        coset_gen=self.curve.fr_generator)
        return self._cache[log_n]


_caches: dict = {}


def domain_for(curve, log_n: int) -> Domain:
    if curve.name not in _caches:
        _caches[curve.name] = DomainCache(curve)
    return _caches[curve.name].get(log_n)
