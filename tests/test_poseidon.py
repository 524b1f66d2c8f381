"""Poseidon: known-answer vectors + batched-vs-reference differential tests."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from vimz_tpu.fields import FR, FR_LIMBS
from vimz_tpu.poseidon import BatchedPoseidon, arkworks_params, circomlib_params

from tests import reference_poseidon as refpos

# circomlib known-answer vectors (public circomlib test suite values).
CIRCOMLIB_KAT = [
    ([1], 18586133768512220936620570745912940619677854269274689475585506675881198879027),
    ([1, 2], 7853200120776062878684798364095072458815029376092732009249414926327459813530),
]


@pytest.mark.parametrize("inputs,expected", CIRCOMLIB_KAT)
def test_circomlib_known_vectors_python(inputs, expected):
    assert refpos.circom_poseidon(inputs) == expected


@pytest.mark.parametrize("inputs,expected", CIRCOMLIB_KAT)
def test_circomlib_known_vectors_batched(inputs, expected):
    pos = BatchedPoseidon(circomlib_params(len(inputs)))
    x = jnp.asarray(FR_LIMBS.to_limbs_mont([inputs, inputs]))  # batch of 2
    out = FR_LIMBS.from_limbs_mont(np.asarray(pos.circom_hash(x)))
    assert out[0] == expected and out[1] == expected


def test_ark_sponge_batched_matches_python():
    rng = random.Random(7)
    for L in (2, 16, 17, 33, 128):
        batch = [[rng.randrange(FR.p) for _ in range(L)] for _ in range(2)]
        pos = BatchedPoseidon(arkworks_params())
        x = jnp.asarray(FR_LIMBS.to_limbs_mont(batch))
        got = FR_LIMBS.from_limbs_mont(np.asarray(pos.sponge_hash(x)))
        for b in range(2):
            assert got[b] == refpos.ark_sponge_hash(batch[b]), f"L={L} b={b}"


def test_ark_two_to_one_batched_matches_python():
    rng = random.Random(8)
    pairs = [(rng.randrange(FR.p), rng.randrange(FR.p)) for _ in range(3)]
    pos = BatchedPoseidon(arkworks_params())
    left = jnp.asarray(FR_LIMBS.to_limbs_mont([a for a, _ in pairs]))
    right = jnp.asarray(FR_LIMBS.to_limbs_mont([b for _, b in pairs]))
    got = FR_LIMBS.from_limbs_mont(np.asarray(pos.two_to_one(left, right)))
    for i, (a, b) in enumerate(pairs):
        assert got[i] == refpos.ark_two_to_one(a, b)


def test_circom_array_hash_batched_matches_python():
    rng = random.Random(9)
    from vimz_tpu.commit.image_hash import ImageHasher

    hasher = ImageHasher()
    for L in (8, 64, 128):
        rows = [[rng.randrange(1 << 240) for _ in range(L)] for _ in range(2)]
        x = jnp.asarray(FR_LIMBS.to_limbs_mont(rows))
        got = FR_LIMBS.from_limbs_mont(np.asarray(hasher.array_hash_circom(x)))
        for b in range(2):
            assert got[b] == refpos.circom_array_hash(rows[b]), f"L={L} b={b}"
