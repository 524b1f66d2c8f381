"""Step-circuit tests on tiny synthetic images.

Each test synthesizes the batched R1CS for a few fold steps and checks
satisfaction; `synthesize` itself asserts that the in-circuit state update
agrees with the independently computed (device-batched) hash chains.
"""

import numpy as np
import pytest

from vimz_tpu.circuits import synthesize
from vimz_tpu.editor import (
    adjust_brightness,
    adjust_contrast,
    blur_image,
    convert_to_grayscale,
    redact_image,
    sharpen_image,
)
from vimz_tpu.editor.ops import pack_words_blocks, pack_words_rows
from vimz_tpu.pipeline.input import Resolution, Transformation, VIMzInput


def tiny_image(h=4, w=20, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def make_input(orig_img, tran_img=None, extra=None, blocks=False, pad_conv=False):
    pack = pack_words_blocks if blocks else pack_words_rows
    orig = pack(orig_img)
    if pad_conv:
        zero = np.zeros((1, orig.shape[1]), dtype=object)
        orig = np.concatenate([zero, orig, zero])
    tran = pack(tran_img) if tran_img is not None else None
    return VIMzInput(orig, tran, extra or {})


def assert_satisfied(r1cs):
    assert r1cs.check_satisfied(), "R1CS not satisfied"
    # negative check: corrupt a witness value
    bad = r1cs.witness.copy()
    col = 1 + r1cs.n_pub + 5
    bad[0, col] = (bad[0, col] + 1) % (2**64)
    orig = r1cs.witness
    r1cs.witness = bad
    assert not r1cs.check_satisfied(), "corrupted witness still satisfies"
    r1cs.witness = orig


def test_hash_circuit():
    img = tiny_image()
    r1cs = synthesize(Transformation.HASH, make_input(img))
    assert r1cs.n_pub == 2
    assert_satisfied(r1cs)


def test_grayscale_circuit():
    img = tiny_image()
    r1cs = synthesize(Transformation.GRAYSCALE, make_input(img, convert_to_grayscale(img)))
    assert r1cs.n_pub == 4
    assert_satisfied(r1cs)









