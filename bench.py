"""Benchmark harness: prints ONE JSON line with the north-star metric.

Metric (BASELINE.json): G1 Pippenger MSM points/s/chip at 2^20 points.
The reference publishes no numbers (BASELINE.md: "None exist"), so
``vs_baseline`` is reported against a documented nominal: 3.5e6 points/s,
an arkworks-class multicore-CPU rate for a 2^20 G1 MSM (~0.3 s), which is
what the reference stack would deliver on a strong host CPU.

Timeout-proof: the final JSON line is emitted from a SIGTERM/SIGALRM/atexit
handler holding the best number recorded so far, so a driver `timeout` kill
mid-stage still lands a parsed metric (round 3 lost its number to rc=124).
Stages run in order of importance under an internal deadline
(ZKP_BENCH_BUDGET_S, default 1500 s): MSM 2^20 first, then diagnostics
(NTT butterflies/s, prove wall-clock) to stderr.

Extra env knobs: ZKP_BENCH_LOG_N (default 20 on TPU, 10 elsewhere),
ZKP_BENCH_CURVE (bls12_381), ZKP_BENCH_PROVE=0 to skip the prove stage.
"""

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

# persistent compile cache (repo-local): Mosaic/XLA compiles of the limb
# kernels take minutes; cache entries survive across driver invocations.
_ROOT = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_ROOT, ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

NOMINAL_BASELINE_PPS = 3.5e6
T0 = time.time()
BUDGET = float(os.environ.get("ZKP_BENCH_BUDGET_S", "1500"))

_result = {"metric": "msm_g1_points_per_s", "value": 0.0,
           "unit": "points/s", "vs_baseline": 0.0}
_emitted = False


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def record(log_n, pps):
    _result.update({
        "metric": f"msm_g1_points_per_s_2^{log_n}",
        "value": round(pps, 1),
        "vs_baseline": round(pps / NOMINAL_BASELINE_PPS, 4),
    })


def emit(*_args):
    """Print the ONE stdout JSON line exactly once, then die if signalled."""
    global _emitted
    if not _emitted:
        _emitted = True
        print(json.dumps(_result), flush=True)
    if _args:  # called as a signal handler
        os._exit(0)


def time_left():
    return BUDGET - (time.time() - T0)


def fence(out):
    """True device sync: fetch one element (jax.block_until_ready is a no-op
    under the axon TPU tunnel -- verified empirically, scripts/tpu_microbench4)."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    return jax.device_get(leaf.ravel()[:1])


def get_points(ops, n, curve_name, platform):
    """n pseudorandom affine points [k_i]G, disk-cached (repo-local first:
    /tmp can be wiped between driver rounds; .bench_cache is gitignored but
    persists in the working tree)."""
    import jax
    import jax.numpy as jnp
    fr, fq, g1 = ops.fr, ops.fq, ops.g1
    log_n = n.bit_length() - 1
    fname = f"zkp_bench_points_{curve_name}_{log_n}.npz"
    repo_cache = os.path.join(_ROOT, ".bench_cache")
    os.makedirs(repo_cache, exist_ok=True)
    paths = [os.path.join(repo_cache, fname), os.path.join("/tmp", fname)]
    t0 = time.time()
    from zkp_tpu.utils.artifacts import ensure_file
    ensure_file(paths[0], log)    # reassemble .part chunks + verify sha
    for p in paths:
        if os.path.exists(p):
            d = np.load(p)
            xs, ys = jnp.asarray(d["xs"]), jnp.asarray(d["ys"])
            log(f"points loaded from {p} in {time.time()-t0:.1f}s")
            if not os.path.exists(paths[0]):
                np.savez(paths[0], xs=d["xs"], ys=d["ys"])
            return xs, ys
    ks = fr.random(seed=11, shape=(n,), mont=False)
    if platform == "tpu":
        from zkp_tpu.msm.msm_tpu import FixedBaseKernel
        fbk = FixedBaseKernel(ops, "g1")
        P = fbk(ks)                      # one kernelized pass, all lanes
        xs, ys, _ = g1.to_affine(P)
        xs_np, ys_np = np.asarray(xs), np.asarray(ys)
    else:
        from zkp_tpu.curve.fixed_base import FixedBaseTable
        tab = FixedBaseTable(g1, ops.g1_gen_affine, c=8, nbits=fr.nbits + 1)
        chunk = min(n, 1 << 14)
        mul = jax.jit(lambda s: g1.to_affine(tab.scalar_mul(s))[:2])
        xs_np = np.empty((n, fq.n), dtype=np.uint32)
        ys_np = np.empty((n, fq.n), dtype=np.uint32)
        for i in range(0, n, chunk):
            cx, cy = mul(ks[i:i + chunk])
            xs_np[i:i + chunk] = np.asarray(cx)
            ys_np[i:i + chunk] = np.asarray(cy)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    np.savez(paths[0], xs=xs_np, ys=ys_np)
    log(f"points generated in {time.time()-t0:.1f}s")
    return xs, ys


def main():
    signal.signal(signal.SIGTERM, emit)
    signal.signal(signal.SIGALRM, emit)
    signal.alarm(max(60, int(BUDGET)))   # belt and braces
    atexit.register(emit)

    import jax
    import jax.numpy as jnp

    # env-var names are version-fragile; set the config explicitly (the
    # round-4 baseline run compiled 2141s and persisted NOTHING)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from zkp_tpu.utils.artifacts import check_versions
    check_versions(log)   # stale-toolchain detection (round-4 advisor)

    platform = jax.devices()[0].platform
    log_n = int(os.environ.get("ZKP_BENCH_LOG_N", 20 if platform != "cpu" else 10))
    curve_name = os.environ.get("ZKP_BENCH_CURVE", "bls12_381")
    n = 1 << log_n
    record(log_n, 0.0)
    log(f"bench: platform={platform} curve={curve_name} n=2^{log_n} budget={BUDGET:.0f}s")

    from zkp_tpu.curve.curves import curve_ops
    from zkp_tpu.msm.pippenger import MSM

    ops = curve_ops(curve_name)
    fr = ops.fr
    xs, ys = get_points(ops, n, curve_name, platform)
    inf = jnp.zeros((n,), dtype=bool)
    scalars = fr.random(seed=12, shape=(n,), mont=False)

    # ---- stage 1: MSM (Pallas-kernelized path on TPU, generic elsewhere)
    if platform == "tpu":
        from zkp_tpu.msm.msm_tpu import MSMKernel
        mk = MSMKernel(ops, "g1")
        msm = mk
        # AOT export cache: tracing+lowering of the limb graph is ~25 min
        # on this host class and is NOT covered by the persistent compile
        # cache; the exported artifact skips it (keyed by source hash)
        try:
            import zkp_tpu.msm.msm_tpu as _msm_mod
            import zkp_tpu.curve.pkernels as _pk_mod
            import zkp_tpu.field.limbs as _lb_mod
            from zkp_tpu.utils.aot import cached_export, source_hash
            tag = f"msm_g1_{curve_name}_{source_hash(_msm_mod, _pk_mod, _lb_mod)}"
            fn = jax.jit(lambda a, b, c_, d: mk(a, b, c_, d))
            msm = cached_export(
                fn, (xs, ys, inf, scalars),
                os.path.join(_ROOT, ".bench_cache", "aot"), tag, log)
        except Exception as e:
            log(f"AOT export cache unavailable ({e!r}); direct path")
    else:
        msm = MSM(ops.g1)
    cache_before = set(os.listdir(_CACHE)) if os.path.isdir(_CACHE) else set()
    t0 = time.time()
    out = msm(xs, ys, inf, scalars)
    fence(out)
    first = time.time() - t0
    log(f"MSM compile+first run: {first:.1f}s")
    new_entries = (set(os.listdir(_CACHE)) if os.path.isdir(_CACHE)
                   else set()) - cache_before
    log(f"persistent compile cache: "
        + (f"MISS, {len(new_entries)} new entries written" if new_entries
           else "HIT (no new entries)"))
    record(log_n, n / first)             # provisional: first-run rate
    times = []
    for _ in range(3):
        t0 = time.time()
        out = msm(xs, ys, inf, scalars)
        fence(out)
        times.append(time.time() - t0)
        record(log_n, n / min(times))    # improves as reps land
    best = min(times)
    pps = n / best
    log(f"MSM 2^{log_n}: best {best*1000:.1f} ms -> {pps:,.0f} points/s")
    try:
        from zkp_tpu.utils.roofline import ROUND4_MEASURED, report
        meas = dict(ROUND4_MEASURED)
        meas["total_ms"] = best * 1000
        log(report(meas, n=n))
    except Exception as e:
        log(f"roofline report skipped: {e}")

    # ---- stage 2 (diagnostic): NTT butterflies/s
    if time_left() > 120:
        try:
            from zkp_tpu.ntt.ntt import domain_for
            ntt_log_n = min(log_n, 18)
            dom = domain_for(ops.params, ntt_log_n)
            coeffs = fr.random(seed=13, shape=(1 << ntt_log_n,))
            t0 = time.time(); fence(dom.ntt(coeffs))
            log(f"NTT compile+first: {time.time()-t0:.1f}s")
            t0 = time.time(); fence(dom.ntt(coeffs))
            ntt_t = time.time() - t0
            bfly = (1 << ntt_log_n) // 2 * ntt_log_n
            log(f"NTT 2^{ntt_log_n}: {ntt_t*1000:.1f} ms -> {bfly/ntt_t:,.0f} butterflies/s (single call, ~24 ms tunnel sync included)")
            # marginal (in-pipeline) cost: 8 chained transforms in ONE jit --
            # what a prove pays per transform, no per-call dispatch overhead
            try:
                import jax as _j
                reps = 8
                f8 = _j.jit(lambda x: _j.lax.fori_loop(
                    0, reps, lambda i, v: dom._jitted("ntt")(v), x))
                fence(f8(coeffs))
                t0 = time.time(); fence(f8(coeffs))
                tm = (time.time() - t0) / reps
                log(f"NTT 2^{ntt_log_n} marginal: {tm*1000:.1f} ms/transform "
                    f"-> {bfly/tm:,.0f} butterflies/s (8 chained in one jit)")
            except Exception as e:
                log(f"marginal NTT timing skipped: {e}")
        except Exception as e:  # diagnostics must not kill the primary metric
            log(f"NTT bench skipped: {e}")

    # ---- stage 3 (diagnostic): Groth16 prove wall-clock (BASELINE.md:27).
    # Default OFF: the axon remote-compile helper reproducibly dies
    # (exit 1, stale TPU_WORKER_HOSTNAMES complaint) compiling the prover's
    # 2^18-shape MSM modules after ~40 min of compile -- two attempts on
    # 2026-08-21; the 2^20 bench module compiles fine.  Enable with
    # ZKP_BENCH_PROVE=1 once the helper is fixed (the 2^16 fixture is
    # cached in .bench_cache, so the stage starts at the prove compiles).
    if platform == "tpu" and time_left() > 300 and \
            os.environ.get("ZKP_BENCH_PROVE", "0") == "1":
        try:
            prove_log_n = int(os.environ.get("ZKP_BENCH_PROVE_LOG_N", "16"))
            from scripts.prove_bench import run_prove_bench
            run_prove_bench(curve_name, prove_log_n, log, fence,
                            deadline=time_left)
        except Exception as e:
            log(f"prove bench skipped: {e}")

    emit()


if __name__ == "__main__":
    main()
