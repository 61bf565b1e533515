"""Validate kntt (two-level kernel NTT) against a python-int oracle.

CPU (interpret mode): BabyBear p = 2^31 - 2^27 + 1 (2-adicity 27, L = 2
limbs -> small XLA:CPU graphs).  TPU: BLS12-381 Fr at 2^14..2^18, A/B vs
the existing Domain path, plus timing.

  JAX_PLATFORMS=cpu python scripts/kntt_test.py cpu
  python scripts/kntt_test.py tpu [log_n]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def oracle_ntt(vals, omega, p):
    n = len(vals)
    if n == 1:
        return list(vals)
    ev = oracle_ntt(vals[0::2], omega * omega % p, p)
    od = oracle_ntt(vals[1::2], omega * omega % p, p)
    out = [0] * n
    w = 1
    for k in range(n // 2):
        t = w * od[k] % p
        out[k] = (ev[k] + t) % p
        out[k + n // 2] = (ev[k] - t) % p
        w = w * omega % p
    return out


def run(p, L, log_n, omega, label, time_it=False):
    import jax
    import jax.numpy as jnp
    from zkp_tpu.field.fp import ints_to_limbs, limbs_to_ints
    from zkp_tpu.ntt.kntt import kntt_for, _nat_perm

    n = 1 << log_n
    k = kntt_for(p, L, log_n, omega)
    R = 1 << (16 * L)
    rng = np.random.default_rng(7)
    nbytes = (p.bit_length() + 7) // 8 + 1
    xs = [int.from_bytes(rng.bytes(nbytes), "little") % p for _ in range(n)]
    xk = jnp.asarray(np.transpose(
        ints_to_limbs([v * R % p for v in xs], L), (1, 0)).copy())  # (L, N)

    t0 = time.time()
    fast = np.asarray(jax.device_get(k.fast_ntt(xk)))
    t_first = time.time() - t0

    ref = oracle_ntt(xs, omega, p)
    perm = _nat_perm(k.N1, k.N2)
    got = [v * pow(R, -1, p) % p
           for v in limbs_to_ints(np.transpose(fast, (1, 0)))]
    nat = [got[perm[i]] for i in range(n)]
    assert nat == ref, f"{label}: fast_ntt mismatch"
    print(f"{label} 2^{log_n}: fast_ntt OK (first {t_first:.1f}s)")

    # round trip through the fast order
    back = np.asarray(jax.device_get(k.fast_intt(jnp.asarray(fast))))
    gotb = [v * pow(R, -1, p) % p
            for v in limbs_to_ints(np.transpose(back, (1, 0)))]
    assert gotb == xs, f"{label}: fast_intt round-trip mismatch"
    print(f"{label} 2^{log_n}: fast_intt round-trip OK")

    # natural wrappers + coset round trip
    natv = np.asarray(jax.device_get(k.ntt(xk)))
    gn = [v * pow(R, -1, p) % p
          for v in limbs_to_ints(np.transpose(natv, (1, 0)))]
    assert gn == ref, f"{label}: natural ntt mismatch"
    shift = 5
    cz = k.fast_coset_ntt(xk, shift)
    cb = np.asarray(jax.device_get(k.fast_coset_intt(cz, shift)))
    gc = [v * pow(R, -1, p) % p
          for v in limbs_to_ints(np.transpose(cb, (1, 0)))]
    assert gc == xs, f"{label}: coset round-trip mismatch"
    print(f"{label} 2^{log_n}: natural + coset OK")

    if time_it:
        import jax
        f = jax.jit(k.fast_ntt)
        jax.device_get(f(xk))[0]
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = f(xk)
        jax.device_get(out)[0, :1]
        dt = (time.time() - t0) / reps
        bfly = n // 2 * log_n
        print(f"{label} 2^{log_n}: fast_ntt {dt*1000:.2f} ms "
              f"-> {bfly/dt/1e6:.1f} M butterflies/s")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    import jax
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        p = (1 << 31) - (1 << 27) + 1          # BabyBear
        g = next(g for g in range(2, 50)
                 if pow(g, (p - 1) // 2, p) == p - 1)   # full 2-adic order
        # find an element of order 2^log_n
        for log_n in (14, 16):
            omega = pow(g, (p - 1) >> log_n, p)
            assert pow(omega, 1 << log_n, p) == 1
            assert pow(omega, 1 << (log_n - 1), p) != 1
            run(p, 2, log_n, omega, "babybear")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        from zkp_tpu.curve.curves import curve_ops
        ops = curve_ops("bls12_381")
        fr = ops.fr
        log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 14
        from zkp_tpu.ntt.ntt import domain_for
        dom = domain_for(ops.params, log_n)
        run(fr.p, fr.n, log_n, dom.omega, "bls12_381-fr", time_it=True)


if __name__ == "__main__":
    main()
