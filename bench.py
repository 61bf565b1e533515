"""Benchmark harness: prints ONE JSON line with the north-star metric.

Metric (BASELINE.json): G1 Pippenger MSM points/s/chip at 2^20 points.
The reference publishes no numbers (BASELINE.md: "None exist"), so
``vs_baseline`` is reported against a documented nominal: 3.5e6 points/s,
an arkworks-class multicore-CPU rate for a 2^20 G1 MSM (~0.3 s), which is
what the reference stack would deliver on a strong host CPU.

Extra diagnostics (NTT butterflies/s, prove wall-clock) go to stderr;
stdout carries exactly the one JSON line the driver records.

Env knobs: ZKP_BENCH_LOG_N (default 20 on TPU, 10 elsewhere),
ZKP_BENCH_CURVE (bls12_381).
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache (repo-local): Mosaic/XLA compiles of the limb
# kernels take minutes; cache entries survive across driver invocations.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

NOMINAL_BASELINE_PPS = 3.5e6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(out):
    """True device sync: fetch one element (jax.block_until_ready is a no-op
    under the axon TPU tunnel -- verified empirically, scripts/tpu_microbench4)."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    return jax.device_get(leaf.ravel()[:1])


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    log_n = int(os.environ.get("ZKP_BENCH_LOG_N", 20 if platform != "cpu" else 10))
    curve_name = os.environ.get("ZKP_BENCH_CURVE", "bls12_381")
    n = 1 << log_n
    log(f"bench: platform={platform} curve={curve_name} n=2^{log_n}")

    from zkp_tpu.curve.curves import curve_ops
    from zkp_tpu.msm.pippenger import MSM

    ops = curve_ops(curve_name)
    fr, fq, g1 = ops.fr, ops.fq, ops.g1

    # ---- generate n pseudorandom points as [k_i]G via the fixed-base window
    # table, in chunks (a full-batch 2^20 double-and-add OOMs a single chip:
    # every field mul materializes (lanes, 2L) u32 temps).
    cache = f"/tmp/zkp_bench_points_{curve_name}_{log_n}.npz"
    t0 = time.time()
    if os.path.exists(cache):
        d = np.load(cache)
        xs, ys = jnp.asarray(d["xs"]), jnp.asarray(d["ys"])
        log(f"points loaded from cache in {time.time()-t0:.1f}s")
    else:
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
        np.savez(cache, xs=xs_np, ys=ys_np)
        log(f"points generated in {time.time()-t0:.1f}s")
    inf = jnp.zeros((n,), dtype=bool)
    scalars = fr.random(seed=12, shape=(n,), mont=False)

    # ---- MSM timing (Pallas-kernelized path on TPU, generic path elsewhere)
    if platform == "tpu":
        from zkp_tpu.msm.msm_tpu import MSMKernel
        msm = MSMKernel(ops, "g1")
    else:
        msm = MSM(g1)
    t0 = time.time()
    out = msm(xs, ys, inf, scalars)
    fence(out)
    log(f"MSM compile+first run: {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.time()
        out = msm(xs, ys, inf, scalars)
        fence(out)
        times.append(time.time() - t0)
    best = min(times)
    pps = n / best
    log(f"MSM 2^{log_n}: best {best*1000:.1f} ms -> {pps:,.0f} points/s")

    # ---- NTT diagnostic
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
        log(f"NTT 2^{ntt_log_n}: {ntt_t*1000:.1f} ms -> {bfly/ntt_t:,.0f} butterflies/s")
    except Exception as e:  # diagnostics must not kill the primary metric
        log(f"NTT bench skipped: {e}")

    print(json.dumps({
        "metric": f"msm_g1_points_per_s_2^{log_n}",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / NOMINAL_BASELINE_PPS, 4),
    }))


if __name__ == "__main__":
    main()
