"""AOT export cache: skip re-TRACING of the giant limb graphs.

The jax persistent compilation cache only skips the backend compile
(~320 s of the ~31 min cold MSM start on a 2-vCPU host); the remaining
~25 min is python tracing + StableHLO lowering of the unrolled limb
arithmetic, which is NOT cached.  ``jax.export`` serializes the lowered
module, so a later process deserializes and pays only backend compile --
which the persistent cache then serves in seconds.

Artifacts are keyed by a caller-supplied tag + the abstract shapes/dtypes
of the example args, and are device-kind + code-version sensitive ONLY
through the tag, so callers must include a content hash of the code they
freeze (bench.py uses the module source hashes).
"""

from __future__ import annotations

import hashlib
import os

import jax
from jax import export as jexport


def args_fingerprint(args) -> str:
    parts = []
    for a in jax.tree.leaves(args):
        parts.append(f"{getattr(a, 'dtype', type(a).__name__)}{getattr(a, 'shape', ())}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def source_hash(*modules) -> str:
    """Content hash of the given python modules' source files."""
    h = hashlib.sha256()
    for m in modules:
        try:
            with open(m.__file__, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(repr(m).encode())
    return h.hexdigest()[:16]


def cached_export(jitted, args, cache_dir: str, tag: str, log=lambda *a: None,
                  platform: str | None = None, devkind: str | None = None,
                  export_only: bool = False):
    """Return a callable running ``jitted`` via an exported-artifact cache.

    On miss: trace + lower ``jitted`` with ``jax.export``, persist the
    serialized module, return its ``call``.  On hit: deserialize (no
    tracing) and return ``call`` -- backend compile still happens once per
    process but is served by the persistent compilation cache.

    ``platform``/``devkind``: lower for a platform other than the local
    backend (e.g. trace a TPU module from a CPU-only process while the TPU
    is busy; jax.export supports cross-platform lowering).  ``devkind``
    names the artifact (defaults to the local device kind).
    ``export_only``: produce/verify the artifact without returning a live
    callable (used by the prewarm driver).
    """
    from . import artifacts
    os.makedirs(cache_dir, exist_ok=True)
    dev = (devkind or jax.devices()[0].device_kind).replace(" ", "_")
    path = os.path.join(
        cache_dir, f"aot_{tag}_{dev}_{args_fingerprint(args)}.bin")
    # reassemble .part chunks + verify sha; mismatch => treat as absent
    if artifacts.ensure_file(path, log) is not None:
        if export_only:
            log(f"AOT artifact present: {path}")
            return None
        with open(path, "rb") as f:
            exp = jexport.deserialize(f.read())
        log(f"AOT artifact loaded: {path}")
        return exp.call
    kw = {}
    if platform is not None and jax.default_backend() != platform:
        kw["platforms"] = [platform]
    exp = jexport.export(jitted, **kw)(*args)
    data = exp.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    log(f"AOT artifact exported: {path} ({len(data)/1e6:.1f} MB)")
    return None if export_only else exp.call
