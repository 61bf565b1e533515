"""Prewarm the prover's MSM modules, one per process invocation.

Phase "export" (CPU-only, runs while the TPU is busy): trace + lower one
canonical-shape MSM module and serialize it under .bench_cache/aot.
Phase "compile" (TPU): deserialize the artifact and run it once so the
backend compile lands in the repo persistent compile cache.

Usage:
    JAX_PLATFORMS=cpu python scripts/prewarm_prove.py export g1 18
    python scripts/prewarm_prove.py compile g1 18

One module per process: the ~25 min trace and the axon remote-compile
helper's uptime budget both reset per invocation, so a crash never loses
more than one module (round-4: a monolithic prove compile killed the
helper after ~40 min, twice).
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

DEVKIND = os.environ.get("ZKP_TPU_DEVKIND", "TPU v5 lite")
CACHE = os.path.join(_ROOT, ".bench_cache", "aot")


def main():
    phase, which, log_npad = sys.argv[1], sys.argv[2], int(sys.argv[3])
    curve = os.environ.get("ZKP_BENCH_CURVE", "bls12_381")
    import jax
    if phase == "export":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from zkp_tpu.curve.curves import curve_ops
    from zkp_tpu.msm import aot_dispatch as ad

    ops = curve_ops(curve)
    npad = 1 << log_npad
    t0 = time.time()

    def log(*a):
        print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)

    if phase == "export":
        ad.export_module(ops, which, npad, CACHE, DEVKIND, log)
    elif phase == "compile":
        ad.compile_module(ops, which, npad, CACHE, log)
    else:
        raise SystemExit(f"unknown phase {phase}")
    log(f"{phase} {which}@2^{log_npad} done")


if __name__ == "__main__":
    main()
