"""ctypes bindings for the native host field library (native/fr256.cpp).

Compiled on first use with g++ (no pip deps); every entry point has a
pure-python fallback so the framework works without a toolchain.  Used for
host-side hot loops: witness generation, R1CS satisfaction checks at large
constraint counts, Horner evaluation -- the data-staging work that feeds the
TPU compute path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "fr256.cpp")
_LIB_PATH = os.path.join(tempfile.gettempdir(), "zkp_tpu_fr256.so")
_lock = threading.Lock()
_lib = None
_tried = False


class FrParams(ctypes.Structure):
    _fields_ = [("p", ctypes.c_uint64 * 4),
                ("pinv64", ctypes.c_uint64),
                ("r2", ctypes.c_uint64 * 4)]


def _build() -> str | None:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-march=native", "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
            if path:
                try:
                    lib = ctypes.CDLL(path)
                    u64p = ctypes.POINTER(ctypes.c_uint64)
                    i32p = ctypes.POINTER(ctypes.c_int32)
                    pp = ctypes.POINTER(FrParams)
                    for name, args in [
                        ("fr_mont_mul_vec", [u64p, u64p, u64p, ctypes.c_int64, pp]),
                        ("fr_add_vec", [u64p, u64p, u64p, ctypes.c_int64, pp]),
                        ("fr_sub_vec", [u64p, u64p, u64p, ctypes.c_int64, pp]),
                        ("fr_to_mont_vec", [u64p, u64p, ctypes.c_int64, pp]),
                        ("fr_from_mont_vec", [u64p, u64p, ctypes.c_int64, pp]),
                        ("fr_spmv_coo", [i32p, i32p, u64p, u64p, u64p, ctypes.c_int64, pp]),
                        ("fr_r1cs_check", [u64p, u64p, u64p, ctypes.c_int64, pp]),
                        ("fr_horner", [u64p, ctypes.c_int64, u64p, u64p, pp]),
                    ]:
                        fn = getattr(lib, name)
                        fn.argtypes = args
                        fn.restype = ctypes.c_int64 if name == "fr_r1cs_check" else None
                    _lib = lib
                except OSError:
                    _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


class HostField:
    """Host-side Montgomery field over <= 256-bit modulus (numpy uint64 x4)."""

    def __init__(self, p: int):
        if p.bit_length() > 256:
            raise ValueError("HostField supports <= 256-bit moduli")
        self.p = p
        self.R = 1 << 256
        self.R2 = self.R * self.R % p
        pinv64 = (-pow(p, -1, 1 << 64)) % (1 << 64)
        self.params = FrParams()
        for i in range(4):
            self.params.p[i] = (p >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
            self.params.r2[i] = (self.R2 >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
        self.params.pinv64 = pinv64

    # -- conversions
    def encode(self, ints, mont=True) -> np.ndarray:
        n = len(ints)
        out = np.empty((n, 4), dtype=np.uint64)
        for i, v in enumerate(ints):
            v = (int(v) % self.p)
            if mont:
                v = v * self.R % self.p
            for j in range(4):
                out[i, j] = (v >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
        return out

    def decode(self, arr: np.ndarray, mont=True):
        rinv = pow(self.R, -1, self.p) if mont else 1
        out = []
        for row in arr:
            v = 0
            for j in range(3, -1, -1):
                v = (v << 64) | int(row[j])
            out.append(v * rinv % self.p)
        return out

    def _p3(self, a: np.ndarray):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))

    def mul(self, a, b):
        lib = get_lib()
        out = np.empty_like(a)
        lib.fr_mont_mul_vec(self._p3(a), self._p3(b), self._p3(out), a.shape[0],
                            ctypes.byref(self.params))
        return out

    def add(self, a, b):
        lib = get_lib()
        out = np.empty_like(a)
        lib.fr_add_vec(self._p3(a), self._p3(b), self._p3(out), a.shape[0],
                       ctypes.byref(self.params))
        return out

    def spmv_coo(self, rows, cols, coeffs, z, n_rows):
        """out[r] += coeffs_k * z[c] over COO entries (all Montgomery)."""
        lib = get_lib()
        rows = np.ascontiguousarray(rows, dtype=np.int32)
        cols = np.ascontiguousarray(cols, dtype=np.int32)
        out = np.zeros((n_rows, 4), dtype=np.uint64)
        lib.fr_spmv_coo(rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        self._p3(coeffs), self._p3(z), self._p3(out),
                        rows.shape[0], ctypes.byref(self.params))
        return out

    def r1cs_check(self, av, bv, cv) -> int:
        """First violated constraint index or -1."""
        lib = get_lib()
        return int(lib.fr_r1cs_check(self._p3(av), self._p3(bv), self._p3(cv),
                                     av.shape[0], ctypes.byref(self.params)))

    def horner(self, coeffs, point: int) -> int:
        lib = get_lib()
        pt = self.encode([point])
        out = np.zeros((1, 4), dtype=np.uint64)
        lib.fr_horner(self._p3(coeffs), coeffs.shape[0], self._p3(pt),
                      self._p3(out), ctypes.byref(self.params))
        return self.decode(out)[0]


def fast_r1cs_satisfied(r1cs, assignment) -> bool:
    """Native-accelerated R1CS.is_satisfied for large systems; falls back
    to the pure-python path when the toolchain is unavailable."""
    if not available():
        return r1cs.is_satisfied(assignment)
    hf = HostField(r1cs.p)
    if len(assignment) != r1cs.num_variables or assignment[0] % r1cs.p != 1:
        return False
    z = hf.encode(assignment)
    n = r1cs.num_constraints
    evs = {}
    for name, (rows, cols, coeffs) in r1cs.to_coo().items():
        cf = hf.encode(coeffs)
        evs[name] = hf.spmv_coo(rows, cols, cf, z, n)
    return hf.r1cs_check(evs["a"], evs["b"], evs["c"]) == -1
