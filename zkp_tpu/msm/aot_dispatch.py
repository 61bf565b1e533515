"""Shape-canonicalized, AOT-cached MSM dispatch for the prover.

The prover runs 5 MSMs (3 G1 + 1 G2 + the H-basis G1 MSM; reference
Prover::prove, groth16-core/src/lib.rs:139-272).  Each distinct input
shape costs ~25 min of python tracing/StableHLO lowering on a 2-vCPU
host plus minutes of backend compile, and the remote TPU compile service
cannot serialize executables over 2 GiB.  This module:

  1. pads every MSM host-side to a canonical power-of-two shape and
     derives the Pippenger window width ``c`` from the PADDED size, so
     the three V-sized G1 MSMs share ONE compiled module and the H MSM
     (size n-1) shares another;
  2. routes each canonical shape through ``utils.aot.cached_export`` so
     tracing/lowering is paid once per source version (artifacts in
     ``.bench_cache/aot``, exportable from a CPU-only process while the
     TPU is busy);
  3. compiles G2 as TWO executables (msm_split.py: windows scan +
     bucket reduction) -- the monolithic G2 module measures ~2.78 GB of
     executable metadata at any padded shape, over the service's hard
     2 GiB serialization cap (round-5 log);
  4. lets a prewarm driver (scripts/prewarm_prove.py) build artifacts
     and backend-compile cache entries one module per process, so a
     helper death never loses more than one module's work.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# G2 runs the two-executable pipeline (see module docstring point 3)
SPLIT = {"g2"}


def canonical_msm_shape(n: int):
    """(Npad, c, B) for an n-point MSM; matches MSMKernel.__call__'s
    padding/window heuristics but keys ``c`` off Npad so equal padded
    sizes always produce identical modules."""
    npad = max(1 << 14, 1 << (int(n - 1).bit_length()))
    c = int(min(16, max(8, npad.bit_length() - 1 - 4)))
    b = max(128, -(-npad // 2048))
    return npad, c, b


def n_windows(nbits: int, c: int) -> int:
    """Static twin of pippenger.signed_digits's window count."""
    nwin = -(-nbits // c)
    if nbits - (nwin - 1) * c == c:
        nwin += 1
    return nwin


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


def source_tag(curve_name: str, which: str, part: str = "") -> str:
    """Content hash over every module whose source shapes the lowered MSM
    graph (a stale artifact would silently run old kernels)."""
    import zkp_tpu.curve.pkernels as _pk
    import zkp_tpu.field.limbs as _lb
    import zkp_tpu.msm.msm_tpu as _mt
    from ..utils.aot import source_hash
    mods = [_mt, _pk, _lb]
    if part:
        import zkp_tpu.msm.msm_split as _ms
        mods.append(_ms)
    suffix = f"_{part}" if part else ""
    return f"pmsm{suffix}_{which}_{curve_name}_{source_hash(*mods)}"


def dummy_inputs(ops, which: str, npad: int):
    """Zero-filled device arrays with the canonical shapes (for tracing /
    prewarm without a real CRS; all points at infinity)."""
    fq, fr = ops.fq, ops.fr
    comp = (npad, fq.n) if which == "g1" else (npad, 2, fq.n)
    return (jnp.zeros(comp, jnp.uint32), jnp.zeros(comp, jnp.uint32),
            jnp.ones((npad,), bool), jnp.zeros((npad, fr.n), jnp.uint32))


_CALLS = {}  # (curve, which, npad) -> callable, per-process


def _default_cache_dir():
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, ".bench_cache", "aot")


def _force_mosaic():
    """Context patch: pkernels picks interpret mode off the local backend;
    a TPU export from a CPU process must force Mosaic lowering (runtime
    patch, not a source edit -- pkernels.py is part of the artifact source
    hash and editing it would invalidate every shipped artifact)."""
    from ..curve import pkernels

    class _Ctx:
        def __enter__(self):
            self.old = pkernels._interpret
            pkernels._interpret = lambda: False

        def __exit__(self, *a):
            pkernels._interpret = self.old

    return _Ctx()


def get_call(ops, which: str, npad: int, cache_dir: str | None = None,
             devkind: str | None = None, log=lambda *a: None,
             export_only: bool = False):
    """Build (or load) the canonical-shape MSM callable.

    Returns a function (xs, ys, inf, scalars)->jac tuple (inputs already
    padded to npad), or None with ``export_only`` (prewarm phase 1)."""
    from ..utils.aot import cached_export
    from .msm_tpu import MSMKernel

    cache_dir = cache_dir or _default_cache_dir()
    curve = ops.params.name
    _, c, b = canonical_msm_shape(npad)
    args = dummy_inputs(ops, which, npad)
    mk = MSMKernel(ops, which)

    if which not in SPLIT:
        fn = jax.jit(lambda a, b2, i2, s2: mk(a, b2, i2, s2, c=c, B=b))
        with _force_mosaic() if export_only else _nullctx():
            return cached_export(fn, args, cache_dir,
                                 source_tag(curve, which), log,
                                 platform="tpu", devkind=devkind,
                                 export_only=export_only)

    # Split path: DIRECT jit, no jax.export artifact.  Measured round 5:
    # the direct windows module compiles to a 33 MB executable in ~260 s
    # (trace included) on this host class, while the SAME function routed
    # through export -> deserialize -> compile balloons to ~2.7 GB of
    # executable metadata and trips the service's 2 GiB cap.  The
    # persistent compile cache makes later processes fast; there is
    # nothing for the prewarm export phase to do.
    from .msm_split import msm_windows, msm_reduce_simple
    kg = mk.kg
    nbits = ops.params.r.bit_length()
    if export_only:
        log(f"{which}@{npad}: split modules are direct-jit "
            "(no AOT artifact); compile phase warms the persistent cache")
        return None
    pack_fn = jax.jit(lambda a, b2, i2: mk.pack(a, b2, i2))

    R = kg.R
    sd = (2, ops.fq.n) if which == "g2" else (ops.fq.n,)

    def call(a, b2, i2, s2):
        bk = msm_windows(kg, pack_fn(a, b2, i2), s2, c=c, B=b, nbits=nbits)
        out = msm_reduce_simple(kg, bk, c=c)          # (1, 3R)
        X, Y, Z = out[0, :R], out[0, R:2 * R], out[0, 2 * R:]
        return X.reshape(sd), Y.reshape(sd), Z.reshape(sd)

    return call


class _nullctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


# chunk G2 inputs so every call hits the (smaller) canonical module; the
# per-chunk partial sums stack on a lane axis for the prover's O(1)
# host-side combine (Prover.prove sums the lanes via the oracle)
CHUNK_LOG2 = {"g2": 16}


def aot_msm(ops, which: str, xs, ys, inf, scalars,
            cache_dir: str | None = None, log=lambda *a: None,
            devkind: str | None = None):
    """Run an MSM through the canonical-shape AOT cache.  Returns a
    jacobian tuple like MSMKernel.__call__, except that each coordinate
    carries a LEADING LANE AXIS of partial sums (size 1 when unchunked);
    the true result is the sum of the lanes."""
    n = xs.shape[0]
    chunk = 1 << CHUNK_LOG2.get(which, 60)
    npad, _, _ = canonical_msm_shape(min(n, chunk))
    key = (ops.params.name, which, npad)
    if key not in _CALLS:
        _CALLS[key] = get_call(ops, which, npad, cache_dir=cache_dir,
                               devkind=devkind, log=log)
    parts = []
    for lo in range(0, n, chunk):
        sl = slice(lo, min(n, lo + chunk))
        args = pad_msm_inputs(xs[sl], ys[sl], inf[sl], scalars[sl], npad)
        parts.append(_CALLS[key](*args))
    return tuple(jnp.stack([p[i] for p in parts], axis=0) for i in range(3))


def export_module(ops, which: str, npad: int, cache_dir: str,
                  devkind: str, log=print) -> None:
    """Prewarm phase 1 (CPU-safe): trace + lower + serialize the
    module(s) for one canonical shape."""
    get_call(ops, which, npad, cache_dir=cache_dir, devkind=devkind,
             log=log, export_only=True)


def compile_module(ops, which: str, npad: int, cache_dir: str, log=print):
    """Prewarm phase 2 (needs the TPU): deserialize the artifact(s), run
    once so the backend compile lands in the persistent compile cache."""
    out = aot_msm(ops, which, *dummy_inputs(ops, which, npad),
                  cache_dir=cache_dir, log=log)
    np.asarray(jax.device_get(out[0]))
    log(f"compiled+ran {which}@{npad}")
