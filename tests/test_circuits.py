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


def test_brightness_circuit():
    img = tiny_image()
    inp = make_input(img, adjust_brightness(img, 1.4), {"factor": 14})
    r1cs = synthesize(Transformation.BRIGHTNESS, inp)
    assert_satisfied(r1cs)


def test_contrast_circuit():
    img = tiny_image()
    inp = make_input(img, adjust_contrast(img, 1.4), {"factor": 14})
    r1cs = synthesize(Transformation.CONTRAST, inp)
    assert_satisfied(r1cs)


def test_blur_circuit():
    img = tiny_image()
    inp = make_input(img, blur_image(img), pad_conv=True)
    r1cs = synthesize(Transformation.BLUR, inp)
    assert_satisfied(r1cs)


def test_sharpness_circuit():
    img = tiny_image()
    inp = make_input(img, sharpen_image(img), pad_conv=True)
    r1cs = synthesize(Transformation.SHARPNESS, inp)
    assert_satisfied(r1cs)


def test_crop_circuit():
    img = tiny_image(h=6, w=20, seed=3)
    x, y = 10, 2
    inp = make_input(img, extra={"info": x * 2**24 + y * 2**12})
    ctx = {"crop_out_words": 1, "crop_height": 2}
    r1cs = synthesize(Transformation.CROP, inp, ctx=ctx)
    assert_satisfied(r1cs)


def _resize_hd_semantics(img, new_h, new_w):
    """The reference's 720-branch bilinear formula on a tiny image."""
    h, w, _ = img.shape
    out = np.zeros((new_h, new_w, 3), dtype=np.uint8)
    xr, yr = w / new_w, h / new_h
    for i in range(new_h):
        for j in range(new_w):
            x_l, y_l = int(j * xr), int(i * yr)
            a = img[y_l, x_l].astype(float)
            b = img[y_l, x_l + 1].astype(float)
            c = img[y_l + 1, x_l].astype(float)
            d = img[y_l + 1, x_l + 1].astype(float)
            wgt = (2.0 if i % 2 == 0 else 1.0) / 3
            out[i, j] = (a * wgt + b * wgt + c * (1 - wgt) + d * (1 - wgt)) / 2
    return out


def test_resize_circuit():
    img = tiny_image(h=6, w=20, seed=4)
    tran = _resize_hd_semantics(img, 4, 10)
    inp = make_input(img, tran)
    r1cs = synthesize(Transformation.RESIZE, inp, resolution=Resolution.HD)
    assert_satisfied(r1cs)


def test_redact_circuit():
    img = tiny_image(h=40, w=80, seed=5)
    tran, indicators = redact_image(img)
    assert indicators == [0, 1]
    inp = make_input(img, tran, {"redact": indicators}, blocks=True)
    r1cs = synthesize(Transformation.REDACT, inp)
    assert_satisfied(r1cs)
