"""CLI round trip + example circuits end-to-end.

Runs on the 3-limb toy BN curve (same code paths as production curves; see
tests/test_groth16.py header for the compile-time rationale).
"""

import json
import os

import pytest

from zkp_tpu import cli
from zkp_tpu.examples import (
    boolean_circuit, cubic_circuit, multiplication_circuit, quadratic_circuit,
    range_check_circuit, run_example,
)

TEST_CURVE = os.environ.get("ZKP_TEST_CURVE", "toy_bn3")


@pytest.mark.parametrize("builder", [multiplication_circuit, quadratic_circuit,
                                     boolean_circuit, range_check_circuit],
                         ids=["mult", "quad", "bool", "range"])
def test_examples_prove_and_verify(builder):
    run_example(builder, curve_name=TEST_CURVE, verbose=False)


def test_circuit_json_roundtrip():
    r1cs, assignment = cubic_circuit(TEST_CURVE)
    d = cli.circuit_to_json(r1cs)
    back = cli.circuit_from_json(d, r1cs.p)
    assert back.num_constraints == r1cs.num_constraints
    assert back.num_variables == r1cs.num_variables
    assert back.is_satisfied(assignment)


def test_cli_full_roundtrip(tmp_path, capsys):
    prefix = str(tmp_path / "crs")
    rc = cli.main(["--curve", TEST_CURVE, "generate-crs", "--num-constraints",
                   "4", "--output", prefix, "--seed", "5"])
    assert rc == 0
    assert os.path.exists(prefix + "_pk.npz")
    assert os.path.exists(prefix + "_circuit.json")

    # witness for the dummy circuit (same seed the CLI used)
    from zkp_tpu.examples import synthetic_mult_circuit
    r1cs, assignment = synthetic_mult_circuit(4, TEST_CURVE, 5)
    wit_path = str(tmp_path / "wit.json")
    with open(wit_path, "w") as f:
        json.dump({"values": [hex(v) for v in assignment[1:]]}, f)
    pub_path = str(tmp_path / "pub.json")
    with open(pub_path, "w") as f:
        json.dump({"values": []}, f)

    proof_path = str(tmp_path / "proof.json")
    rc = cli.main(["prove", "--pk", prefix + "_pk.npz", "--witness", wit_path,
                   "--output", proof_path, "--seed", "6"])
    assert rc == 0 and os.path.exists(proof_path)

    rc = cli.main(["verify", "--vk", prefix + "_vk.npz",
                   "--public-inputs", pub_path, "--proof", proof_path])
    assert rc == 0

    # tampered proof rejects (exit code 1)
    with open(proof_path) as f:
        d = json.load(f)
    d["a"], d["c"] = d["c"], d["a"]
    bad_path = str(tmp_path / "bad.json")
    with open(bad_path, "w") as f:
        json.dump(d, f)
    rc = cli.main(["verify", "--vk", prefix + "_vk.npz",
                   "--public-inputs", pub_path, "--proof", bad_path])
    assert rc == 1
