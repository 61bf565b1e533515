"""Shape-canonicalized, AOT-cached MSM dispatch for the prover.

The prover runs 5 MSMs (3 G1 + 1 G2 + the H-basis G1 MSM; reference
Prover::prove, groth16-core/src/lib.rs:139-272).  Each distinct input
shape costs ~25 min of python tracing/StableHLO lowering on a 2-vCPU
host plus minutes of backend compile, and the axon remote-compile helper
has a per-process uptime budget that a monolithic prove compile blows
(round-4 finding).  This module:

  1. pads every MSM host-side to a canonical power-of-two shape and
     derives the Pippenger window width ``c`` from the PADDED size, so
     the three V-sized G1 MSMs share ONE compiled module and the H MSM
     (size n-1) shares another;
  2. routes each canonical shape through ``utils.aot.cached_export`` so
     tracing/lowering is paid once per source version (artifacts in
     ``.bench_cache/aot``, exportable from a CPU-only process while the
     TPU is busy);
  3. lets a prewarm driver (scripts/prewarm_prove.py) build artifacts
     and backend-compile cache entries one module per process, so a
     helper death never loses more than one module's work.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def canonical_msm_shape(n: int):
    """(Npad, c, B) for an n-point MSM; matches MSMKernel.__call__'s
    padding/window heuristics but keys ``c`` off Npad so equal padded
    sizes always produce identical modules."""
    npad = max(1 << 14, 1 << (int(n - 1).bit_length()))
    c = int(min(16, max(8, npad.bit_length() - 1 - 4)))
    b = max(128, -(-npad // 2048))
    return npad, c, b


def pad_msm_inputs(xs, ys, inf, scalars, npad: int):
    """Host-side pad to npad rows: extra points are infinity, extra
    scalars zero -- exact for the MSM sum."""
    n = xs.shape[0]
    if n == npad:
        return xs, ys, inf, scalars
    dn = npad - n
    z = lambda a: jnp.concatenate(
        [a, jnp.zeros((dn,) + a.shape[1:], a.dtype)], axis=0)
    return (z(xs), z(ys),
            jnp.concatenate([inf, jnp.ones((dn,), inf.dtype)], axis=0),
            z(scalars))


def source_tag(curve_name: str, which: str) -> str:
    """Content hash over every module whose source shapes the lowered MSM
    graph (a stale artifact would silently run old kernels)."""
    import zkp_tpu.curve.pkernels as _pk
    import zkp_tpu.field.limbs as _lb
    import zkp_tpu.msm.msm_tpu as _mt
    from ..utils.aot import source_hash
    return f"pmsm_{which}_{curve_name}_{source_hash(_mt, _pk, _lb)}"


def dummy_inputs(ops, which: str, npad: int):
    """Zero-filled device arrays with the canonical shapes (for tracing /
    prewarm without a real CRS; all points at infinity)."""
    fq, fr = ops.fq, ops.fr
    comp = (npad, fq.n) if which == "g1" else (npad, 2, fq.n)
    return (jnp.zeros(comp, jnp.uint32), jnp.zeros(comp, jnp.uint32),
            jnp.ones((npad,), bool), jnp.zeros((npad, fr.n), jnp.uint32))


_CALLS = {}  # (curve, which, npad) -> callable, per-process


# the axon remote-compile helper cannot serialize executables over 2 GiB;
# the G2 MSM module at 2^18-padded shape measured 2.7 GB (round-5 log), so
# G2 MSMs are CHUNKED: split into 2^16-padded pieces run through one
# smaller module, partial sums stacked on a lane axis for the prover's
# O(1) host-side combine (Prover.prove sums the lanes via the oracle).
CHUNK_LOG2 = {"g2": 16}


def aot_msm(ops, which: str, xs, ys, inf, scalars,
            cache_dir: str | None = None, log=lambda *a: None,
            devkind: str | None = None):
    """Run an MSM through the canonical-shape AOT cache.  Returns a
    jacobian tuple like MSMKernel.__call__, except that each coordinate
    carries a LEADING LANE AXIS of partial sums (size 1 when unchunked);
    the true result is the sum of the lanes."""
    from ..utils.aot import cached_export
    from .msm_tpu import MSMKernel

    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".bench_cache", "aot")
    n = xs.shape[0]
    chunk = 1 << CHUNK_LOG2.get(which, 60)
    npad, c, b = canonical_msm_shape(min(n, chunk))

    def one(key_npad, args):
        key = (ops.params.name, which, key_npad)
        if key not in _CALLS:
            mk = MSMKernel(ops, which)
            _, cc, bb = canonical_msm_shape(key_npad)
            fn = jax.jit(lambda a, b2, i2, s2: mk(a, b2, i2, s2, c=cc, B=bb))
            _CALLS[key] = cached_export(
                fn, args, cache_dir, source_tag(ops.params.name, which), log,
                platform="tpu", devkind=devkind)
        return _CALLS[key](*args)

    parts = []
    for lo in range(0, n, chunk):
        sl = slice(lo, min(n, lo + chunk))
        args = pad_msm_inputs(xs[sl], ys[sl], inf[sl], scalars[sl], npad)
        parts.append(one(npad, args))
    return tuple(jnp.stack([p[i] for p in parts], axis=0) for i in range(3))


def export_module(ops, which: str, npad: int, cache_dir: str,
                  devkind: str, log=print) -> None:
    """Prewarm phase 1 (CPU-safe): trace + lower + serialize one module.

    pkernels picks interpret mode off the local backend; a TPU export
    from a CPU process must force Mosaic lowering (runtime patch, not a
    source edit -- pkernels.py is part of the artifact source hash and
    editing it would invalidate every shipped artifact)."""
    from ..curve import pkernels
    from ..utils.aot import cached_export
    from .msm_tpu import MSMKernel
    _, c, b = canonical_msm_shape(npad)
    args = dummy_inputs(ops, which, npad)
    mk = MSMKernel(ops, which)
    fn = jax.jit(lambda a, bb, ii, s: mk(a, bb, ii, s, c=c, B=b))
    old = pkernels._interpret
    pkernels._interpret = lambda: False
    try:
        cached_export(fn, args, cache_dir, source_tag(ops.params.name, which),
                      log, platform="tpu", devkind=devkind, export_only=True)
    finally:
        pkernels._interpret = old


def compile_module(ops, which: str, npad: int, cache_dir: str, log=print):
    """Prewarm phase 2 (needs the TPU): deserialize the artifact, run it
    once so the backend compile lands in the persistent compile cache."""
    out = aot_msm(ops, which, *dummy_inputs(ops, which, npad),
                  cache_dir=cache_dir, log=log)
    np.asarray(jax.device_get(out[0]))
    log(f"compiled+ran {which}@{npad}")
