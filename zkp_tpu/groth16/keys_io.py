"""Real on-disk (de)serialization of CRS keys and proofs.

The reference's key I/O is a stub that writes metadata-only placeholder JSON
(crates/groth16-cli/src/lib.rs:157-220, admits "core module needs
debugging").  Here keys round-trip fully: point limb arrays + the sparse QAP
matrices go into .npz, a JSON manifest carries curve/shape metadata.  Proofs
serialize as compressed points (zkp_tpu.curve.serialize) in JSON.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from ..curve.curves import curve_ops
from ..qap.qap import QAP
from .groth16 import CRS, ProvingKey, VerificationKey


def _pack_affine(prefix, aff, out):
    out[prefix + "_x"] = np.asarray(aff[0])
    out[prefix + "_y"] = np.asarray(aff[1])
    out[prefix + "_inf"] = np.asarray(aff[2])


def _unpack_affine(prefix, data):
    return (jnp.asarray(data[prefix + "_x"]), jnp.asarray(data[prefix + "_y"]),
            jnp.asarray(data[prefix + "_inf"]))


_PK_POINTS = ["alpha_g1", "beta_g1", "delta_g1", "beta_g2", "delta_g2",
              "a_g1", "b_g1", "b_g2", "l_g1", "h_g1"]
_VK_POINTS = ["alpha_g1", "beta_g2", "gamma_g2", "delta_g2", "ic_g1"]


def save_proving_key(pk: ProvingKey, path: str) -> None:
    out = {}
    for name in _PK_POINTS:
        _pack_affine(name, getattr(pk, name), out)
    qap = pk.qap
    for mname, (rows, cols, coeffs) in qap._mats.items():
        out[f"mat_{mname}_rows"] = np.asarray(rows)
        out[f"mat_{mname}_cols"] = np.asarray(cols)
        out[f"mat_{mname}_coeffs"] = np.asarray(coeffs)
    meta = {
        "kind": "groth16_proving_key",
        "curve": qap.curve.name,
        "num_variables": qap.num_variables,
        "num_public": qap.num_public,
        "num_constraints": qap.num_constraints,
        "version": 1,
    }
    out["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **out)


def load_proving_key(path: str) -> ProvingKey:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["meta"]).decode())
    assert meta["kind"] == "groth16_proving_key"
    ops = curve_ops(meta["curve"])
    coo = {m: (jnp.asarray(data[f"mat_{m}_rows"]), jnp.asarray(data[f"mat_{m}_cols"]),
               jnp.asarray(data[f"mat_{m}_coeffs"])) for m in ("a", "b", "c")}
    qap = QAP(ops.params, coo, num_variables=meta["num_variables"],
              num_public=meta["num_public"], num_constraints=meta["num_constraints"])
    points = {name: _unpack_affine(name, data) for name in _PK_POINTS}
    return ProvingKey(ops, qap, **points)


def save_verification_key(vk: VerificationKey, path: str) -> None:
    out = {}
    for name in _VK_POINTS:
        _pack_affine(name, getattr(vk, name), out)
    meta = {
        "kind": "groth16_verification_key",
        "curve": vk.ops.params.name,
        "num_public": vk.num_public,
        "version": 1,
    }
    out["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **out)


def load_verification_key(path: str) -> VerificationKey:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["meta"]).decode())
    assert meta["kind"] == "groth16_verification_key"
    ops = curve_ops(meta["curve"])
    points = {name: _unpack_affine(name, data) for name in _VK_POINTS}
    return VerificationKey(ops, meta["num_public"], **points)


def save_crs(crs: CRS, prefix: str) -> tuple:
    """Writes {prefix}_pk.npz / {prefix}_vk.npz (reference cli/lib.rs:81-92
    wrote placeholder {out}_pk.json/{out}_vk.json)."""
    pk_path, vk_path = prefix + "_pk.npz", prefix + "_vk.npz"
    save_proving_key(crs.pk, pk_path)
    save_verification_key(crs.vk, vk_path)
    return pk_path, vk_path
