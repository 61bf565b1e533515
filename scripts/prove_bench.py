"""Groth16 prove wall-clock stage (BASELINE.md:27 second primary metric).

Builds (or loads from .bench_cache) a synthetic multiplication circuit of
2^log_n constraints + its CRS, then times ``Prover.prove`` warm with a
per-stage breakdown.  Importable from bench.py (stage 3 diagnostic) and
runnable standalone:  python scripts/prove_bench.py [log_n]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np


def _witness_cache(curve_name, log_n):
    return os.path.join(_ROOT, ".bench_cache",
                        f"prove_fixture_{curve_name}_{log_n}")


def build_fixture(curve_name: str, log_n: int, log=print):
    """CRS + witness for the synthetic circuit, disk-cached (setup is not
    part of the prove metric; caching it keeps the driver budget for MSM)."""
    import jax
    from zkp_tpu.curve.curves import curve_ops
    from zkp_tpu.examples import synthetic_mult_circuit
    from zkp_tpu.groth16.groth16 import (SetupParams, Witness, generate_crs)
    from zkp_tpu.groth16.keys_io import load_proving_key, save_proving_key
    from zkp_tpu.qap.qap import QAP

    ops = curve_ops(curve_name)
    base = _witness_cache(curve_name, log_n)
    os.makedirs(os.path.dirname(base), exist_ok=True)
    pk_path, w_path = base + "_pk.npz", base + "_w.npz"
    if os.path.exists(pk_path) and os.path.exists(w_path):
        t0 = time.time()
        pk = load_proving_key(pk_path)
        wvals = [int(v) for v in np.load(w_path, allow_pickle=False)["z"]]
        witness = Witness(pk.qap, wvals)
        log(f"prove fixture loaded in {time.time()-t0:.1f}s "
            f"(V={pk.qap.num_variables}, n={pk.qap.n})")
        return pk, witness

    t0 = time.time()
    nc = 1 << log_n
    r1cs, assignment = synthetic_mult_circuit(nc, curve_name, seed=3)
    qap = QAP.from_r1cs(ops.params, r1cs)
    log(f"r1cs+qap built: {time.time()-t0:.1f}s (V={qap.num_variables}, n={qap.n})")
    t0 = time.time()
    crs = generate_crs(ops, qap, SetupParams.random(ops.params, 3))
    jax.device_get(crs.pk.a_g1[0].ravel()[:1])
    log(f"setup: {time.time()-t0:.1f}s")
    save_proving_key(crs.pk, pk_path)
    # witness values as fixed-width decimal strings (unicode array: loadable
    # without pickle)
    z = np.array([str(v) for v in assignment])
    np.savez_compressed(w_path, z=z)
    return crs.pk, Witness(qap, assignment)


def run_prove_bench(curve_name: str, log_n: int, log=print, fence=None,
                    deadline=None, reps: int = 2):
    """Times warm prove; returns (wall_s, stage_report)."""
    from zkp_tpu.groth16.groth16 import Prover
    from zkp_tpu.utils.profiling import StageTimer

    from zkp_tpu.curve.curves import curve_ops

    pk, witness = build_fixture(curve_name, log_n, log=log)
    prover = Prover(curve_ops(curve_name))
    t0 = time.time()
    proof = prover.prove(pk, witness, seed=9)
    log(f"prove 2^{log_n} (first, incl compile): {time.time()-t0:.1f}s")
    best, rep = None, None
    for i in range(reps):
        if deadline is not None and deadline() < 60:
            break
        tm = StageTimer()
        t0 = time.time()
        proof = prover.prove(pk, witness, seed=10 + i, timer=tm)
        wall = time.time() - t0
        if best is None or wall < best:
            best, rep = wall, tm.report()
    log(f"prove 2^{log_n} (warm): {best:.2f}s")
    log(rep)
    return best, rep


if __name__ == "__main__":
    import jax
    # jax.config, NOT env vars (env route silently no-ops -- round-4 finding)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    run_prove_bench(os.environ.get("ZKP_BENCH_CURVE", "bls12_381"), log_n)
