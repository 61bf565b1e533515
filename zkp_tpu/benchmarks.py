"""Micro-benchmark suite mirroring the reference's criterion groups
(crates/groth16-benchmarks/src/lib.rs): field ops (:113-132), R1CS
satisfaction at 10/100/1000 (:14-47), R1CS->QAP at 10/100 (:50-77), CRS
generation at 10/50 (:80-110) -- plus prove/verify timing, which the
reference never benchmarks (SURVEY.md section 6).

Usage: ``python -m zkp_tpu.benchmarks [--sizes small|full]``.
Emits structured metrics via zkp_tpu.utils.profiling.Metrics.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

from .curve.curves import curve_ops
from .examples import synthetic_mult_circuit
from .groth16.groth16 import Prover, SetupParams, Verifier, Witness, generate_crs
from .qap.qap import QAP
from .utils.profiling import Metrics, StageTimer


def _time(fn, iters=3, warm=1, stats=None):
    """Mean seconds per call; criterion-style per-sample statistics
    (mean/std/min/max over ``iters`` samples) land in ``stats`` if given."""
    import statistics

    def run_once():
        out = fn()
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None

    for _ in range(warm):
        run_once()
    samples = []
    for _ in range(iters):
        t0 = time.time()
        run_once()
        samples.append(time.time() - t0)
    if stats is not None:
        stats.update({
            "iters": iters,
            "mean_s": statistics.fmean(samples),
            "std_s": statistics.pstdev(samples) if len(samples) > 1 else 0.0,
            "min_s": min(samples),
            "max_s": max(samples),
        })
    return sum(samples) / iters


def bench_field_operations(metrics: Metrics, curve_name="bls12_381", n=1 << 14):
    ops = curve_ops(curve_name)
    fr = ops.fr
    a = fr.random(1, (n,))
    b = fr.random(2, (n,))
    for name, fn in [("field_add", lambda: fr.add(a, b)),
                     ("field_mul", lambda: fr.mul(a, b)),
                     ("field_inverse_batch", lambda: fr.batch_inv(a))]:
        st = {}
        t = _time(fn, iters=5, stats=st)
        metrics.record(name, n / t, "ops/s", batch=n, **st)


def bench_r1cs(metrics: Metrics, curve_name="bls12_381", sizes=(10, 100, 1000)):
    for n in sizes:
        r1cs, assignment = synthetic_mult_circuit(n, curve_name, seed=n)
        st = {}
        t = _time(lambda: r1cs.is_satisfied(assignment), iters=3, stats=st)
        metrics.record("r1cs_satisfaction", n / t, "constraints/s",
                       constraints=n, **st)


def bench_qap_conversion(metrics: Metrics, curve_name="bls12_381", sizes=(10, 100)):
    ops = curve_ops(curve_name)
    for n in sizes:
        r1cs, assignment = synthetic_mult_circuit(n, curve_name, seed=n)
        st = {}
        t = _time(lambda: QAP.from_r1cs(ops.params, r1cs), iters=2, stats=st)
        metrics.record("r1cs_to_qap", n / t, "constraints/s", constraints=n, **st)


def bench_trusted_setup(metrics: Metrics, curve_name="bls12_381", sizes=(10, 50)):
    ops = curve_ops(curve_name)
    for n in sizes:
        r1cs, _ = synthetic_mult_circuit(n, curve_name, seed=n)
        qap = QAP.from_r1cs(ops.params, r1cs)
        params = SetupParams.random(ops.params, 7)

        def run():
            crs = generate_crs(ops, qap, params)
            jax.block_until_ready(crs.pk.a_g1[0])
            return crs
        t = _time(run, iters=1, warm=1)
        metrics.record("crs_generation", t, "s", constraints=n)


def bench_prove_verify(metrics: Metrics, curve_name="bls12_381", n=256):
    """The benchmark the reference lacks: full prove + verify wall clock."""
    ops = curve_ops(curve_name)
    r1cs, assignment = synthetic_mult_circuit(n, curve_name, seed=3)
    qap = QAP.from_r1cs(ops.params, r1cs)
    crs = generate_crs(ops, qap, SetupParams.random(ops.params, 7))
    w = Witness(qap, assignment)
    prover = Prover(ops)
    timer = StageTimer()
    proof = prover.prove(crs.pk, w, seed=9, timer=timer)  # warm/compile
    t0 = time.time()
    proof = prover.prove(crs.pk, w, seed=10)
    metrics.record("groth16_prove", time.time() - t0, "s", constraints=n)
    verifier = Verifier(ops)
    verifier.verify(crs.vk, proof, w.public_inputs)  # compile
    t0 = time.time()
    ok = verifier.verify(crs.vk, proof, w.public_inputs)
    metrics.record("groth16_verify", time.time() - t0, "s", constraints=n)
    assert ok
    print("prove stage breakdown:", file=sys.stderr)
    print(timer.report(), file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", default="bls12_381")
    ap.add_argument("--groups", default="field,r1cs,qap,setup,prove",
                    help="comma list of bench groups")
    args = ap.parse_args(argv)
    m = Metrics()
    groups = set(args.groups.split(","))
    if "field" in groups:
        bench_field_operations(m, args.curve)
    if "r1cs" in groups:
        bench_r1cs(m, args.curve)
    if "qap" in groups:
        bench_qap_conversion(m, args.curve)
    if "setup" in groups:
        bench_trusted_setup(m, args.curve)
    if "prove" in groups:
        bench_prove_verify(m, args.curve)
    print(m.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
