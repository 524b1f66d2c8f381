from vimz_tpu.fields.prime import FQ, FR, PrimeField
from vimz_tpu.fields.limbs import LimbField, FR_LIMBS, FQ_LIMBS

__all__ = ["PrimeField", "FR", "FQ", "LimbField", "FR_LIMBS", "FQ_LIMBS"]
