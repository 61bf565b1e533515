"""Loader-side artifact handling: chunk reassembly + manifest verification.

Counterpart of scripts/ship_artifacts.py.  Shipped artifacts >100 MiB are
stored as ``<name>.partNN`` chunks (GitHub blob-size limit); loaders call
``ensure_file`` to reassemble them, and ``verify`` to check the sha256
recorded in .bench_cache/MANIFEST.json so a clone never silently runs a
corrupted or tampered binary blob (round-4 advisor finding).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_MANIFEST = os.path.join(_ROOT, ".bench_cache", "MANIFEST.json")
_cached_manifest = None


def manifest() -> dict:
    global _cached_manifest
    if _cached_manifest is None:
        try:
            with open(_MANIFEST) as f:
                _cached_manifest = json.load(f)
        except (OSError, ValueError):
            _cached_manifest = {}
    return _cached_manifest


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 24), b""):
            h.update(blk)
    return h.hexdigest()


def verify(path: str, log=lambda *a: None) -> bool:
    """True if ``path`` matches its manifest sha256 (or is unlisted --
    locally generated artifacts are trusted)."""
    rel = os.path.relpath(os.path.abspath(path), _ROOT)
    entry = manifest().get("files", {}).get(rel)
    if entry is None:
        return True
    ok = _sha256(path) == entry["sha256"]
    if not ok:
        log(f"MANIFEST MISMATCH: {rel} does not match its recorded sha256; "
            f"treating as absent")
    return ok


def check_versions(log=lambda *a: None) -> bool:
    """Compare the running jax/jaxlib against the versions that produced
    the shipped caches; a mismatch means every cache entry silently
    misses (round-4 advisor finding)."""
    m = manifest()
    if not m:
        return True
    import jax
    import jaxlib
    ok = (m.get("jax") == jax.__version__
          and m.get("jaxlib") == jaxlib.__version__)
    if not ok:
        log(f"cache/version mismatch: artifacts built with "
            f"jax {m.get('jax')}/jaxlib {m.get('jaxlib')}, running "
            f"{jax.__version__}/{jaxlib.__version__} -- expect cold compiles")
    return ok


def ensure_file(path: str, log=lambda *a: None) -> str | None:
    """Return ``path`` if present (reassembling from .partNN chunks when
    needed and verifying against the manifest); None when unavailable."""
    if os.path.exists(path):
        return path if verify(path, log) else None
    parts = sorted(glob.glob(path + ".part*"))
    if not parts:
        return None
    if not all(verify(p, log) for p in parts):
        return None
    tmp = path + ".tmp"
    with open(tmp, "wb") as out:
        for p in parts:
            with open(p, "rb") as f:
                while True:
                    blk = f.read(1 << 24)
                    if not blk:
                        break
                    out.write(blk)
    os.replace(tmp, path)
    log(f"reassembled {os.path.basename(path)} from {len(parts)} parts")
    return path
