"""Command-line interface: generate-crs / prove / verify.

Mirrors the reference CLI surface (crates/groth16-cli/src/main.rs:14-58) and
its JSON circuit/witness schemas with hex-encoded field elements
(cli/lib.rs:17-52) -- but ``prove`` and ``verify`` are fully implemented
(the reference's are stubs printing "not yet implemented", cli/lib.rs:117-119,
146-147, SURVEY.md 2.9(5)).

Circuit JSON schema:
  {"num_public": 1,
   "constraints": [{"a": [[var, "0x..."]], "b": [...], "c": [...]}, ...]}
Witness JSON: {"values": ["0x...", ...]}      (private witness, in order)
Public JSON:  {"values": ["0x...", ...]}
Proof JSON:   {"a": hex, "b": hex, "c": hex}  (compressed points)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from .curve.curves import curve_ops
from .groth16 import keys_io
from .groth16.groth16 import (
    Prover, SetupParams, Verifier, Witness, generate_crs, proof_to_dict,
    proof_from_dict,
)
from .qap.qap import QAP
from .r1cs.r1cs import R1CS, LinearCombination, Variable


def _hex(v: int) -> str:
    return hex(v)


def _unhex(s) -> int:
    return int(s, 16) if isinstance(s, str) else int(s)


def circuit_to_json(r1cs: R1CS) -> dict:
    cons = []
    for c in r1cs.constraints:
        cons.append({
            name: [[idx, _hex(coeff)] for idx, coeff in sorted(getattr(c, name).terms.items())]
            for name in ("a", "b", "c")
        })
    return {"num_public": r1cs.num_public,
            "num_variables": r1cs.num_variables,
            "constraints": cons}


def circuit_from_json(d: dict, p: int) -> R1CS:
    r = R1CS(p, num_public=int(d["num_public"]))
    r.num_variables = int(d["num_variables"])
    for c in d["constraints"]:
        lcs = {}
        for name in ("a", "b", "c"):
            lc = LinearCombination(p)
            for idx, coeff in c[name]:
                lc.add_term(Variable(int(idx)), _unhex(coeff))
            lcs[name] = lc
        r.add_constraint(lcs["a"], lcs["b"], lcs["c"])
    return r


def _dummy_circuit(num_constraints: int, curve_name: str, seed: int):
    from .examples import synthetic_mult_circuit
    return synthetic_mult_circuit(num_constraints, curve_name, seed)


def cmd_generate_crs(args) -> int:
    ops = curve_ops(args.curve)
    t0 = time.time()
    if args.circuit:
        with open(args.circuit) as f:
            r1cs = circuit_from_json(json.load(f), ops.params.r)
    else:
        # dummy circuit of N multiplication constraints (reference
        # cli/lib.rs:57-70)
        r1cs, _ = _dummy_circuit(args.num_constraints, args.curve, args.seed)
        with open(args.output + "_circuit.json", "w") as f:
            json.dump(circuit_to_json(r1cs), f)
    qap = QAP.from_r1cs(ops.params, r1cs)
    params = SetupParams.random(ops.params, args.seed)
    crs = generate_crs(ops, qap, params)
    pk_path, vk_path = keys_io.save_crs(crs, args.output)
    print(f"CRS generated in {time.time()-t0:.2f}s: {pk_path}, {vk_path} "
          f"(constraints={r1cs.num_constraints}, domain={qap.n})")
    return 0


def cmd_prove(args) -> int:
    pk = keys_io.load_proving_key(args.pk)
    ops = pk.ops
    qap = pk.qap
    with open(args.witness) as f:
        wvals = [_unhex(v) for v in json.load(f)["values"]]
    if args.public_inputs:
        with open(args.public_inputs) as f:
            pub = [_unhex(v) for v in json.load(f)["values"]]
    else:
        pub = []
    if args.circuit:
        with open(args.circuit) as f:
            r1cs = circuit_from_json(json.load(f), ops.params.r)
        if r1cs.num_constraints != qap.num_constraints:
            print("circuit does not match proving key", file=sys.stderr)
            return 2
    assignment = [1] + pub + wvals
    t0 = time.time()
    witness = Witness(qap, assignment)
    proof = Prover(ops).prove(pk, witness, args.seed)
    with open(args.output, "w") as f:
        json.dump(proof_to_dict(proof, ops.params.name), f)
    print(f"proof written to {args.output} in {time.time()-t0:.2f}s")
    return 0


def cmd_verify(args) -> int:
    vk = keys_io.load_verification_key(args.vk)
    with open(args.public_inputs) as f:
        pub = [_unhex(v) for v in json.load(f)["values"]]
    with open(args.proof) as f:
        proof = proof_from_dict(json.load(f), vk.ops.params.name)
    t0 = time.time()
    ok = Verifier(vk.ops).verify(vk, proof, pub)
    print(f"verification: {'ACCEPT' if ok else 'REJECT'} ({time.time()-t0:.2f}s)")
    return 0 if ok else 1


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="zkp-tpu",
                                 description="TPU-native Groth16 zkSNARK CLI")
    ap.add_argument("--curve", default="bls12_381",
                    choices=["bls12_381", "bn254", "toy_bn", "toy_bn3"])
    sub = ap.add_subparsers(dest="command", required=True)

    g = sub.add_parser("generate-crs", help="trusted setup -> pk/vk files")
    g.add_argument("--num-constraints", type=int, default=16)
    g.add_argument("--circuit", help="circuit JSON (else dummy circuit)")
    g.add_argument("--output", required=True, help="output path prefix")
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_generate_crs)

    p = sub.add_parser("prove", help="generate a proof")
    p.add_argument("--pk", required=True)
    p.add_argument("--circuit")
    p.add_argument("--witness", required=True)
    p.add_argument("--public-inputs")
    p.add_argument("--output", required=True)
    p.add_argument("--seed", type=int, default=7)
    p.set_defaults(fn=cmd_prove)

    v = sub.add_parser("verify", help="verify a proof")
    v.add_argument("--vk", required=True)
    v.add_argument("--public-inputs", required=True)
    v.add_argument("--proof", required=True)
    v.set_defaults(fn=cmd_verify)
    return ap


def main(argv=None) -> int:
    import os
    if os.environ.get("ZKP_PLATFORM"):
        # the deployment env's sitecustomize overrides JAX_PLATFORMS, so we
        # offer an explicit escape hatch (e.g. ZKP_PLATFORM=cpu)
        import jax
        jax.config.update("jax_platforms", os.environ["ZKP_PLATFORM"])
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
