"""zkp_tpu — a TPU-native zkSNARK (Groth16) framework in JAX/XLA/Pallas.

A from-scratch rebuild of the capability surface of the reference Rust
workspace ``vats98754/zero-knowledge-proofs`` (Groth16 over BLS12-381 on
arkworks), re-designed for TPU hardware:

  - prime/extension field arithmetic as 16-bit-limb uint32 vector kernels
    (VPU-friendly; Pallas kernels for the hot paths),
  - radix-2 NTT/iNTT with batched and mesh-sharded variants,
  - G1/G2 Jacobian curve ops vectorized over point lanes,
  - Pippenger MSM via sort + segmented reduction (no random-access scatter),
  - optimal-ate pairing (Fq2/Fq6/Fq12 towers, Miller loop, final exp),
  - the full Groth16 pipeline: R1CS builder -> QAP -> trusted setup ->
    prove -> verify / batch-verify, plus CLI, examples and benchmarks.

Layer map mirrors SURVEY.md section 1 (field -> r1cs -> qap -> setup ->
core -> cli/examples/benchmarks), but the numerics that the reference
delegated to arkworks are first-class TPU modules here.
"""

__version__ = "0.1.0"

from .field.params import bls12_381, bn254, get_curve  # noqa: F401
