from vimz_tpu.poseidon.params import (
    PoseidonParams,
    arkworks_params,
    circomlib_params,
)
from vimz_tpu.poseidon.sponge import BatchedPoseidon

__all__ = [
    "PoseidonParams",
    "arkworks_params",
    "circomlib_params",
    "BatchedPoseidon",
]
