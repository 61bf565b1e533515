"""Groth16: trusted setup, prover, verifier, batch verifier (TPU-native).

Mirrors the reference protocol layer (crates/groth16-setup/src/lib.rs,
crates/groth16-core/src/lib.rs) with the mathematically correct equations --
the reference's known bugs are deliberately not replicated (SURVEY.md 2.9):

  (1) no 64-bit truncation: the witness field *is* the scalar field here,
  (2) pi_C includes the -r*s*delta term (missing at core/lib.rs:223-265),
  (3) the H basis is [s^i * Z(s) / delta]_1 so pi_C carries H(s)Z(s)/delta
      (the reference's h_g1 = [s^i/delta]_1 at setup/lib.rs:232-241 drops
      the Z(s) factor),
  (6) ProvingKey references the shared QAP instead of cloning it,
  plus seeded determinism everywhere (same seed => identical proof bytes).

Equations (domain size n, variables 0..V-1, publics 0..l):
  pk: [alpha]1 [beta]1 [delta]1 {[A_i(s)]1} {[B_i(s)]1} [beta]2 [delta]2
      {[B_i(s)]2} {[(beta A_i + alpha B_i + C_i)(s)/delta]1 : i > l}
      {[s^i Z(s)/delta]1 : i <= n-2}
  vk: [alpha]1 [beta]2 [gamma]2 [delta]2
      {[(beta A_i + alpha B_i + C_i)(s)/gamma]1 : i <= l}
  prove: pi_A = [alpha + A(s) + r delta]1
         pi_B = [beta + B(s) + s delta]2   (and its G1 shadow)
         pi_C = [(sum_priv w_i K_i(s) + H(s)Z(s))/delta]1
                + s pi_A + r pi_B1 - r s [delta]1
  verify: e(A,B) = e(alpha,beta) e(IC,gamma) e(C,delta)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..field.params import CurveParams
from ..curve.curves import CurveOps, curve_ops
from ..msm.pippenger import MSM
from ..pairing.pairing import PairingEngine, pairing_engine
from ..qap.qap import QAP


class GrothError(Exception):
    """(reference: GrothError, groth16-core/src/lib.rs:48-77)"""


class InvalidWitness(GrothError):
    pass


class SetupError(GrothError):
    """(reference: SetupError, groth16-setup/src/lib.rs:96-113)"""


# ----------------------------------------------------------------- setup


@dataclass
class SetupParams:
    """Toxic waste (alpha, beta, gamma, delta, s); discard after the ceremony."""

    alpha: int
    beta: int
    gamma: int
    delta: int
    s: int

    @classmethod
    def random(cls, curve: CurveParams, seed: int) -> "SetupParams":
        vals = curve.fr.random_ints(seed, 5, nonzero=True)
        return cls(*vals)

    def validate(self, r: int) -> None:
        for name in ("alpha", "beta", "gamma", "delta", "s"):
            if getattr(self, name) % r == 0:
                raise SetupError(f"{name} must be nonzero")


def _affine_arrays(curve_group, P):
    """Jacobian batch -> (x, y, inf) affine arrays."""
    return curve_group.to_affine(P)


class ProvingKey:
    def __init__(self, ops: CurveOps, qap: QAP, alpha_g1, beta_g1, delta_g1,
                 beta_g2, delta_g2, a_g1, b_g1, b_g2, l_g1, h_g1):
        self.ops = ops
        self.qap = qap  # shared, not cloned (fixes reference 2.9(6))
        self.alpha_g1 = alpha_g1      # single affine (x, y, inf)
        self.beta_g1 = beta_g1
        self.delta_g1 = delta_g1
        self.beta_g2 = beta_g2
        self.delta_g2 = delta_g2
        self.a_g1 = a_g1              # (V,) affine arrays
        self.b_g1 = b_g1
        self.b_g2 = b_g2
        self.l_g1 = l_g1              # (V - 1 - l,) for private variables
        self.h_g1 = h_g1              # (n - 1,) powers basis [s^i Z(s)/delta]

    @property
    def num_public(self):
        return self.qap.num_public


class VerificationKey:
    def __init__(self, ops: CurveOps, num_public: int,
                 alpha_g1, beta_g2, gamma_g2, delta_g2, ic_g1):
        self.ops = ops
        self.num_public = num_public
        self.alpha_g1 = alpha_g1
        self.beta_g2 = beta_g2
        self.gamma_g2 = gamma_g2
        self.delta_g2 = delta_g2
        self.ic_g1 = ic_g1            # (l + 1,) affine arrays


@dataclass
class CRS:
    pk: ProvingKey
    vk: VerificationKey


def generate_crs(ops: CurveOps, qap: QAP, params: SetupParams) -> CRS:
    """Trusted setup from a QAP (reference CRS::generate_from_qap,
    setup/lib.rs:141-268, with the 2.9 corrections)."""
    fr = ops.fr
    r = fr.p
    params.validate(r)
    a, b, g, d, s = (params.alpha % r, params.beta % r, params.gamma % r,
                     params.delta % r, params.s % r)
    d_inv = pow(d, -1, r)
    g_inv = pow(g, -1, r)

    a_s, b_s, c_s = qap.evaluate_all_at(s)      # (V, L) mont
    alpha_m = fr.const(a, shape=(1,))
    beta_m = fr.const(b, shape=(1,))
    k_s = fr.add(fr.add(fr.mul(beta_m, a_s), fr.mul(alpha_m, b_s)), c_s)
    l_scal = fr.mul(k_s, fr.const(d_inv, shape=(1,)))    # /delta
    ic_scal = fr.mul(k_s, fr.const(g_inv, shape=(1,)))   # /gamma

    npub = qap.num_public
    n = qap.n
    zs = qap.domain.vanishing_at(s)
    h_ints = []
    acc = zs * d_inv % r
    for _ in range(n - 1):                       # i = 0 .. n-2
        h_ints.append(acc)
        acc = acc * s % r

    # to standard-form limb scalars for the batched fixed-base muls
    def std(x_mont):
        return fr.from_mont(x_mont)

    # one big G1 batch: [alpha, beta, delta] + A + B + L(priv) + IC(pub) + H
    # fixed-base window tables replace per-element double-and-add
    consts = fr.encode([a, b, d], mont=False)
    scal_g1 = jnp.concatenate([
        consts, std(a_s), std(b_s),
        std(l_scal[npub + 1:]), std(ic_scal[: npub + 1]),
        fr.encode(h_ints, mont=False) if h_ints else fr.zeros((0,)),
    ], axis=0)
    P1 = ops.g1_fixed_base().scalar_mul(scal_g1)
    x1, y1, i1 = _affine_arrays(ops.g1, P1)

    V = qap.num_variables
    ofs = 3
    take = lambda arr, k0, k1: tuple(t[k0:k1] for t in (x1, y1, i1))
    alpha_g1 = tuple(t[0] for t in (x1, y1, i1))
    beta_g1 = tuple(t[1] for t in (x1, y1, i1))
    delta_g1 = tuple(t[2] for t in (x1, y1, i1))
    a_g1 = take(None, ofs, ofs + V); ofs += V
    b_g1 = take(None, ofs, ofs + V); ofs += V
    l_g1 = take(None, ofs, ofs + (V - npub - 1)); ofs += V - npub - 1
    ic_g1 = take(None, ofs, ofs + npub + 1); ofs += npub + 1
    h_g1 = take(None, ofs, ofs + n - 1); ofs += n - 1

    # G2 batch: [beta, gamma, delta] + B
    scal_g2 = jnp.concatenate([fr.encode([b, g, d], mont=False), std(b_s)], axis=0)
    P2 = ops.g2_fixed_base().scalar_mul(scal_g2)
    x2, y2, i2 = _affine_arrays(ops.g2, P2)
    beta_g2 = tuple(t[0] for t in (x2, y2, i2))
    gamma_g2 = tuple(t[1] for t in (x2, y2, i2))
    delta_g2 = tuple(t[2] for t in (x2, y2, i2))
    b_g2 = tuple(t[3:3 + V] for t in (x2, y2, i2))

    pk = ProvingKey(ops, qap, alpha_g1, beta_g1, delta_g1, beta_g2, delta_g2,
                    a_g1, b_g1, b_g2, l_g1, h_g1)
    vk = VerificationKey(ops, npub, alpha_g1, beta_g2, gamma_g2, delta_g2, ic_g1)
    return CRS(pk, vk)


# ----------------------------------------------------------------- witness


class Witness:
    """Assignment wrapper with validation (reference core/lib.rs:38-132)."""

    def __init__(self, qap: QAP, assignment: Sequence[int]):
        if len(assignment) != qap.num_variables:
            raise InvalidWitness(
                f"expected {qap.num_variables} values, got {len(assignment)}")
        r = qap.fr.p
        if assignment[0] % r != 1:
            raise InvalidWitness("z[0] must be 1")
        self.qap = qap
        self.values = [v % r for v in assignment]
        self._mont = qap.fr.encode(self.values)

    @property
    def public_inputs(self) -> List[int]:
        return self.values[1: 1 + self.qap.num_public]

    def validate(self) -> None:
        if not self.qap.is_satisfied(self._mont):
            raise InvalidWitness("QAP not satisfied by witness")

    def device(self):
        return self._mont


# ------------------------------------------------------------------- proof


@dataclass
class Proof:
    """pi = (A in G1, B in G2, C in G1), affine python-int coordinates.

    (reference Proof {a, b, c}, core/lib.rs:28-36; serialization in
    zkp_tpu.curve.serialize)."""

    a: tuple          # (x, y) ints or None for infinity
    b: tuple          # ((x0,x1),(y0,y1)) ints or None
    c: tuple

    def to_json(self) -> str:
        return json.dumps(proof_to_dict(self))

    @staticmethod
    def from_json(s: str, curve_name: str = "bls12_381") -> "Proof":
        return proof_from_dict(json.loads(s), curve_name)


def proof_to_dict(proof: Proof) -> dict:
    from ..curve import serialize as ser
    return {
        "a": ser.g1_compress(proof.a).hex(),
        "b": ser.g2_compress(proof.b).hex(),
        "c": ser.g1_compress(proof.c).hex(),
    }


def proof_from_dict(d: dict, curve_name: str = "bls12_381") -> Proof:
    from ..curve import serialize as ser
    cp = curve_ops(curve_name).params
    return Proof(
        a=ser.g1_decompress(bytes.fromhex(d["a"]), cp),
        b=ser.g2_decompress(bytes.fromhex(d["b"]), cp),
        c=ser.g1_decompress(bytes.fromhex(d["c"]), cp),
    )


# ------------------------------------------------------------------ prover


class Prover:
    """Groth16 prover: 3 G1 MSMs + 1 G2 MSM + the NTT quotient pipeline
    (reference Prover::prove, core/lib.rs:139-272, corrected)."""

    def __init__(self, ops: CurveOps):
        self.ops = ops
        self.msm_g1 = MSM(ops.g1)
        self.msm_g2 = MSM(ops.g2)

    def prove(self, pk: ProvingKey, witness: Witness, seed: int,
              skip_validation: bool = False, timer=None) -> Proof:
        from ..utils.profiling import StageTimer
        tm = timer if timer is not None else StageTimer(enabled=False)
        ops = self.ops
        fr = ops.fr
        qap = pk.qap
        with tm.stage("validate_witness"):
            if not skip_validation:
                witness.validate()
        z = witness.device()
        z_std = fr.from_mont(z)
        npub = qap.num_public

        r_blind, s_blind = fr.random_ints(seed, 2)
        rs = fr.encode([r_blind, s_blind, r_blind * s_blind % fr.p], mont=False)

        # H coefficients (degree <= n-2)
        with tm.stage("quotient_ntt") as hh:
            h = qap.compute_h(z)
            h_std = fr.from_mont(h)[: qap.n - 1]
            hh["out"] = h_std

        g1 = ops.g1
        g2 = ops.g2

        # pi_A = alpha + sum w_i [A_i(s)] + r delta
        with tm.stage("msm_a_g1") as hh:
            A_msm = self.msm_g1(*pk.a_g1, z_std)
            hh["out"] = A_msm
        delta_jac = g1.from_affine(*pk.delta_g1[:2], inf=pk.delta_g1[2])
        rdelta = g1.scalar_mul(delta_jac, rs[0])
        piA = g1.add(g1.add(A_msm, g1.from_affine(*pk.alpha_g1[:2], inf=pk.alpha_g1[2])), rdelta)

        # pi_B (G2) and its G1 shadow
        with tm.stage("msm_b_g2") as hh:
            B2_msm = self.msm_g2(*pk.b_g2, z_std)
            hh["out"] = B2_msm
        delta2_jac = g2.from_affine(*pk.delta_g2[:2], inf=pk.delta_g2[2])
        sdelta2 = g2.scalar_mul(delta2_jac, rs[1])
        piB = g2.add(g2.add(B2_msm, g2.from_affine(*pk.beta_g2[:2], inf=pk.beta_g2[2])), sdelta2)

        with tm.stage("msm_b_g1") as hh:
            B1_msm = self.msm_g1(*pk.b_g1, z_std)
            hh["out"] = B1_msm
        sdelta1 = g1.scalar_mul(delta_jac, rs[1])
        piB1 = g1.add(g1.add(B1_msm, g1.from_affine(*pk.beta_g1[:2], inf=pk.beta_g1[2])), sdelta1)

        # pi_C = L-msm(priv) + H-msm + s piA + r piB1 - rs delta
        with tm.stage("msm_l_g1") as hh:
            L_msm = self.msm_g1(*pk.l_g1, z_std[npub + 1:])
            hh["out"] = L_msm
        with tm.stage("msm_h_g1") as hh:
            H_msm = self.msm_g1(*pk.h_g1, h_std)
            hh["out"] = H_msm
        with tm.stage("combine_and_affine") as hh:
            piA_aff = g1.to_affine(tuple(t[None] for t in piA))
            piB1_aff = g1.to_affine(tuple(t[None] for t in piB1))
            s_piA = g1.scalar_mul(g1.from_affine(piA_aff[0][0], piA_aff[1][0], inf=piA_aff[2][0]), rs[1])
            r_piB1 = g1.scalar_mul(g1.from_affine(piB1_aff[0][0], piB1_aff[1][0], inf=piB1_aff[2][0]), rs[0])
            rsdelta = g1.scalar_mul(delta_jac, rs[2])
            piC = g1.add(g1.add(g1.add(L_msm, H_msm), g1.add(s_piA, r_piB1)), g1.neg(rsdelta))
            proof = Proof(
                a=_g1_to_ints(ops, piA),
                b=_g2_to_ints(ops, piB),
                c=_g1_to_ints(ops, piC),
            )
        return proof


def _g1_to_ints(ops, P):
    x, y, inf = ops.g1.to_affine(tuple(t[None] for t in P))
    if bool(inf[0]):
        return None
    return (int(ops.fq.decode(x[0])), int(ops.fq.decode(y[0])))


def _g2_to_ints(ops, P):
    x, y, inf = ops.g2.to_affine(tuple(t[None] for t in P))
    if bool(inf[0]):
        return None
    xv, yv = ops.fq.decode(x[0]), ops.fq.decode(y[0])
    return ((int(xv[0]), int(xv[1])), (int(yv[0]), int(yv[1])))


# ----------------------------------------------------------------- verifier


class Verifier:
    """Pairing-check verifier (reference Verifier::verify, core/lib.rs:308-355)."""

    def __init__(self, ops: CurveOps):
        self.ops = ops
        self.engine = pairing_engine(ops.params.name)
        self.msm_g1 = MSM(ops.g1)

    def _ic(self, vk: VerificationKey, public_inputs: Sequence[int]):
        """IC = IC_0 + sum x_i IC_i."""
        ops = self.ops
        fr = ops.fr
        if len(public_inputs) != vk.num_public:
            raise GrothError(
                f"expected {vk.num_public} public inputs, got {len(public_inputs)}")
        scalars = fr.encode([1] + [int(v) % fr.p for v in public_inputs], mont=False)
        return self.msm_g1(*vk.ic_g1, scalars)

    def verify(self, vk: VerificationKey, proof: Proof,
               public_inputs: Sequence[int]) -> bool:
        """e(A,B) e(-alpha,beta) e(-IC,gamma) e(-C,delta) == 1."""
        ops = self.ops
        fq = ops.fq
        q = ops.params.q
        if proof.a is None or proof.b is None or proof.c is None:
            return False
        IC = self._ic(vk, public_inputs)
        icx, icy, icinf = ops.g1.to_affine(tuple(t[None] for t in IC))
        if bool(icinf[0]):
            return False

        ax, ay = proof.a
        cx, cy = proof.c
        (bx0, bx1), (by0, by1) = proof.b
        # G1 side: [A, -alpha, -IC, -C] (negation = y sign flip)
        xp = jnp.stack([fq.encode([ax])[0], vk.alpha_g1[0], icx[0], fq.encode([cx])[0]])
        yp = jnp.stack([fq.encode([ay])[0], fq.neg(vk.alpha_g1[1]), fq.neg(icy[0]),
                        fq.neg(fq.encode([cy])[0])])

        bx = fq.encode([[bx0, bx1]])[0]
        by = fq.encode([[by0, by1]])[0]
        xq = jnp.stack([bx, vk.beta_g2[0], vk.gamma_g2[0], vk.delta_g2[0]])
        yq = jnp.stack([by, vk.beta_g2[1], vk.gamma_g2[1], vk.delta_g2[1]])
        return self.engine.pairing_check(xp, yp, xq, yq)


class BatchVerifier:
    """Randomized batch verification (reference BatchVerifier, core/lib.rs:363-433).

    Correct folding: with random t_i,
      prod_i e(t_i A_i, B_i) * e(-sum t_i IC_i, gamma)
            * e(-sum t_i C_i, delta) * e(-(sum t_i) alpha, beta) == 1.
    (The reference folds A and B linearly, which is not sound for the
    e(A_i, B_i) terms; we keep those pairs separate.)"""

    def __init__(self, ops: CurveOps):
        self.ops = ops
        self.engine = pairing_engine(ops.params.name)
        self.verifier = Verifier(ops)

    def verify_batch(self, vk: VerificationKey, proofs: Sequence[Proof],
                     public_inputs: Sequence[Sequence[int]], seed: int) -> bool:
        ops = self.ops
        fq, fr = ops.fq, ops.fr
        ref_scalars = fr.random_ints(seed, len(proofs), nonzero=True)
        if any(p.a is None or p.b is None or p.c is None for p in proofs):
            return False
        g1 = ops.g1

        # t_i A_i (affine via oracle-free device scalar mul), and the sums
        ax = fq.encode([p.a[0] for p in proofs])
        ay = fq.encode([p.a[1] for p in proofs])
        t_limbs = fr.encode(ref_scalars, mont=False)
        tA = g1.scalar_mul(g1.from_affine(ax, ay), t_limbs)
        tAx, tAy, tAinf = g1.to_affine(tA)

        cx = fq.encode([p.c[0] for p in proofs])
        cy = fq.encode([p.c[1] for p in proofs])
        tC = g1.scalar_mul(g1.from_affine(cx, cy), t_limbs)
        sumC = g1.reduce_sum(tC)

        # sum_i t_i IC(x_i)
        ics = []
        for t, pi in zip(ref_scalars, public_inputs):
            ic = self.verifier._ic(vk, pi)
            ics.append(ic)
        icX = jnp.stack([ic[0] for ic in ics])
        icY = jnp.stack([ic[1] for ic in ics])
        icZ = jnp.stack([ic[2] for ic in ics])
        icA = g1.to_affine((icX, icY, icZ))
        tIC = g1.scalar_mul(g1.from_affine(icA[0], icA[1], inf=icA[2]), t_limbs)
        sumIC = g1.reduce_sum(tIC)

        t_total = sum(ref_scalars) % fr.p
        alpha_jac = g1.from_affine(vk.alpha_g1[0], vk.alpha_g1[1], inf=vk.alpha_g1[2])
        tAlpha = g1.scalar_mul(alpha_jac, fr.encode([t_total], mont=False)[0])

        # assemble the multi-pairing: N + 3 pairs
        negC = g1.neg(sumC)
        negIC = g1.neg(sumIC)
        negAl = g1.neg(tAlpha)
        extra = [negAl, negIC, negC]
        exX, exY, exI = g1.to_affine(tuple(jnp.stack([e[i] for e in extra]) for i in range(3)))

        xp = jnp.concatenate([tAx, exX])
        yp = jnp.concatenate([tAy, exY])
        infp = jnp.concatenate([tAinf, exI])

        bx = fq.encode([[p.b[0][0], p.b[0][1]] for p in proofs])
        by = fq.encode([[p.b[1][0], p.b[1][1]] for p in proofs])
        xq = jnp.concatenate([bx, jnp.stack([vk.beta_g2[0], vk.gamma_g2[0], vk.delta_g2[0]])])
        yq = jnp.concatenate([by, jnp.stack([vk.beta_g2[1], vk.gamma_g2[1], vk.delta_g2[1]])])
        return self.engine.pairing_check(xp, yp, xq, yq, inf_mask=infp)
