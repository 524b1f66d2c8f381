"""Editor transformations vs the reference's transformed-PNG fixtures."""

import os

import numpy as np
import pytest

REF = "/root/reference/marketplace/image-data"
needs_fixtures = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference fixtures")


def load(name):
    from PIL import Image

    with Image.open(os.path.join(REF, f"{name}.png")) as im:
        return np.array(im)


@needs_fixtures
def test_grayscale_matches_fixture():
    from vimz_tpu.editor import convert_to_grayscale

    assert np.array_equal(convert_to_grayscale(load("img1")), load("img1-grayscale"))


@needs_fixtures
def test_sharpness_matches_fixture():
    from vimz_tpu.editor import sharpen_image

    assert np.array_equal(sharpen_image(load("img1")), load("img1-sharpness"))


@needs_fixtures
def test_blur_matches_fixture():
    from vimz_tpu.editor import blur_image

    assert np.array_equal(blur_image(load("img1")), load("img1-blur"))


@needs_fixtures
def test_contrast_matches_fixture():
    from vimz_tpu.editor import adjust_contrast

    assert np.array_equal(adjust_contrast(load("img2"), 1.4), load("img2-contrast"))


@needs_fixtures
def test_chained_matches_fixture():
    from vimz_tpu.editor import convert_to_grayscale, sharpen_image

    got = convert_to_grayscale(sharpen_image(load("img1")))
    assert np.array_equal(got, load("img1-sharpness-grayscale"))
    from vimz_tpu.editor import adjust_contrast

    got2 = sharpen_image(adjust_contrast(load("img2"), 1.4))
    assert np.array_equal(got2, load("img2-contrast-sharpness"))


def test_resize_hd_to_sd_shape_and_semantics():
    from vimz_tpu.editor import resize_image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
    out = resize_image(img, 480, 640)
    assert out.shape == (480, 640, 3)
    # spot-check the reference formula at a few pixels
    for i, j in [(0, 0), (1, 5), (479, 639), (100, 321)]:
        x_l = int(j * 2.0)
        y_l = int(i * 1.5)
        a, b = img[y_l, x_l].astype(float), img[y_l, x_l + 1].astype(float)
        c, d = img[y_l + 1, x_l].astype(float), img[y_l + 1, x_l + 1].astype(float)
        w = (2.0 if i % 2 == 0 else 1.0) / 3.0
        expect = ((a * w + b * w + c * (1 - w) + d * (1 - w)) / 2).astype(np.uint8)
        assert np.array_equal(out[i, j], expect)


def test_redact_checkerboard():
    from vimz_tpu.editor import redact_image

    img = np.full((80, 120, 3), 7, dtype=np.uint8)
    out, ind = redact_image(img)
    assert ind == [0, 1, 0, 1, 0, 1]
    assert out[:40, :40].max() == 7 and out[:40, 40:80].max() == 0
    assert out[40:, :40].max() == 0 and out[40:, 40:80].max() == 7
