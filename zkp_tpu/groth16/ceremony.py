"""Multi-party setup ceremony (reference: groth16-setup ceremony module,
crates/groth16-setup/src/lib.rs:282-352).

Each participant multiplies fresh nonzero randomness into all five toxic
parameters; finalize yields the combined SetupParams and verify checks the
transcript (product of per-participant contributions, same semantics as the
reference's accumulate/verify/finalize flow :319-344).  Security note (as in
the reference): honest-majority is not enough for Groth16 -- one honest
participant destroying their randomness suffices; this mirrors the API only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from ..field.params import CurveParams
from .groth16 import SetupError, SetupParams

_PARAM_NAMES = ("alpha", "beta", "gamma", "delta", "s")


@dataclass
class Participant:
    """One contributor's multiplicative randomness."""

    name: str
    contributions: dict

    @classmethod
    def random(cls, curve: CurveParams, name: str, seed: int) -> "Participant":
        vals = curve.fr.random_ints(seed, len(_PARAM_NAMES), nonzero=True)
        return cls(name=name, contributions=dict(zip(_PARAM_NAMES, vals)))

    def validate(self, r: int) -> None:
        for k, v in self.contributions.items():
            if v % r == 0:
                raise SetupError(f"participant {self.name}: zero contribution to {k}")


class Ceremony:
    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.participants: List[Participant] = []
        self._acc = {k: 1 for k in _PARAM_NAMES}

    def contribute(self, participant: Participant) -> None:
        participant.validate(self.curve.r)
        r = self.curve.r
        for k in _PARAM_NAMES:
            self._acc[k] = self._acc[k] * participant.contributions[k] % r
        self.participants.append(participant)

    def verify(self) -> bool:
        """Recompute the accumulated product from the transcript."""
        r = self.curve.r
        acc = {k: 1 for k in _PARAM_NAMES}
        for part in self.participants:
            for k in _PARAM_NAMES:
                acc[k] = acc[k] * part.contributions[k] % r
        return acc == self._acc and all(v % r != 0 for v in self._acc.values())

    def finalize(self) -> SetupParams:
        if not self.participants:
            raise SetupError("ceremony has no participants")
        if not self.verify():
            raise SetupError("ceremony transcript inconsistent")
        return SetupParams(**self._acc)
