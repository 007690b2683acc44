from .limbs import LIMB_BITS, N_BITS, N_LIMBS  # noqa: F401
