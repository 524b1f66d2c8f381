from vimz_tpu.curves.curve import (
    CurveRef,
    BatchedCurve,
    BN254_G1,
    GRUMPKIN,
    bn254_batched,
    grumpkin_batched,
)

__all__ = [
    "CurveRef",
    "BatchedCurve",
    "BN254_G1",
    "GRUMPKIN",
    "bn254_batched",
    "grumpkin_batched",
]
