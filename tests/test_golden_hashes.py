"""Bit-exactness oracle tests against the reference's golden fixtures.

- marketplace/image-data/*.hash were produced by the reference's pyvimz
  image-hasher (circomlib Poseidon, window-8 row fold).
- marketplace/proofs/*.proof embed the IVC initial/final states of proofs
  generated with the circom frontend; their hash values agree with the .hash
  fixtures (verified here), so both pin the circomlib-flavor pipeline:
  final[0] = source image hash, final[1] = target image hash, and for the
  convolution circuits final[2:] are the window-fold hashes of the last
  source rows (incl. the zero padding row).

These pin down, end to end: Grain LFSR constant generation, the Poseidon
permutation, the window-8 fold (with the reference's numRounds quirk), the
2-to-1 accumulator chain, and pixel packing.

The arkworks rate-16 flavor has no offline oracle (the fixtures all come from
the circom pipeline); it is tested against an independent pure-Python mirror
of the arkworks sponge spec in test_poseidon.py.
"""

import os

import pytest

REF = "/root/reference/marketplace"
needs_fixtures = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference fixtures")


def _load_image(name):
    from PIL import Image
    import numpy as np

    with Image.open(os.path.join(REF, "image-data", f"{name}.png")) as im:
        return np.array(im)


def _golden_hash(name) -> int:
    with open(os.path.join(REF, "image-data", f"{name}.hash")) as f:
        return int(f.read().strip())


def proof_states(name):
    """Parse a .proof calldata file -> (steps, initial_state, final_state)."""
    with open(os.path.join(REF, "proofs", f"{name}.proof"), "rb") as f:
        data = f.read()[4:]
    assert len(data) % 32 == 0
    words = [int.from_bytes(data[i : i + 32], "big") for i in range(0, len(data), 32)]
    steps = words[0]
    proof_len = 25
    state_len = (len(words) - 1 - proof_len) // 2
    initial = words[1 : 1 + state_len]
    final = words[1 + state_len : 1 + 2 * state_len]
    return steps, initial, final


@needs_fixtures
def test_circom_flavor_matches_golden_hash():
    from vimz_tpu.commit import hash_image_circom

    img = _load_image("img1")
    assert hash_image_circom(img) == _golden_hash("img1")


@needs_fixtures
def test_circom_flavor_matches_golden_hash_grayscale_image():
    from vimz_tpu.commit import hash_image_circom

    img = _load_image("img1-grayscale")
    assert hash_image_circom(img) == _golden_hash("img1-grayscale")


@needs_fixtures
def test_proof_states_match_hashes():
    """Proof final states == the golden hashes (fixture self-consistency) and
    initial states match ivc_initial_state semantics."""
    steps, initial, final = proof_states("img1-grayscale")
    assert steps == 720
    assert initial == [0, 0]
    assert final[0] == _golden_hash("img1")
    assert final[1] == _golden_hash("img1-grayscale")

    steps, initial, final = proof_states("img2-contrast")
    assert initial == [0, 0, 14]  # factor 1.4 -> info 14
    assert final[0] == _golden_hash("img2")
    assert final[1] == _golden_hash("img2-contrast")
    assert final[2] == 14


@needs_fixtures
def test_convolution_final_state_row_hashes():
    """blur/sharpness proofs carry window-fold hashes of the last source rows;
    final[3] is the fold of the all-zero padding row."""
    from tests.reference_poseidon import circom_array_hash

    _, _, final_blur = proof_states("img1-blur")
    _, _, final_sharp = proof_states("img1-sharpness")
    assert final_blur[2:] == final_sharp[2:]  # same source image
    assert final_blur[3] == circom_array_hash([0] * 128)

    # final[2] = fold of the last real source row (row 719 of img1).
    from vimz_tpu.commit.image_hash import pack_rows_limbs
    from vimz_tpu.fields import FR_LIMBS

    words = pack_rows_limbs(_load_image("img1"))[719]
    row_ints = [int(v) for v in FR_LIMBS.from_limbs(words)]
    assert final_blur[2] == circom_array_hash(row_ints)
