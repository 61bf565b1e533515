from .fp import Fp, int_to_limbs, limbs_to_int, ints_to_limbs, limbs_to_ints  # noqa: F401
from .params import CurveParams, bls12_381, bn254, toy_bn, get_curve  # noqa: F401
