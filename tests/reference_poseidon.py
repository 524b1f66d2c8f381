"""Slow pure-Python Poseidon reference used as a test oracle (re-export)."""

from vimz_tpu.poseidon.pyref import (
    permute,
    circom_poseidon,
    ark_sponge_hash,
    ark_two_to_one,
    circom_array_hash,
)

__all__ = [
    "permute",
    "circom_poseidon",
    "ark_sponge_hash",
    "ark_two_to_one",
    "circom_array_hash",
]
