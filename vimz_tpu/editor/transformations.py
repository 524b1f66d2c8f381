"""Image transformations with bit-exact reference semantics.

Each function mirrors the integer/float behavior of
pyvimz/pyvimz/img/transformations.py (the witness data generator of the
reference) but vectorized. The transformed PNG fixtures in
marketplace/image-data/ are the oracles (tests/test_editor.py).
"""

from __future__ import annotations

import numpy as np

from vimz_tpu.editor.ops import conv2d_clamped

SHARPEN_KERNEL = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]])
BLUR_KERNEL = np.ones((3, 3), dtype=np.int64)


def _per_channel(image: np.ndarray, fn) -> np.ndarray:
    image = np.asarray(image)
    return np.dstack([fn(image[..., c]) for c in range(3)])


def sharpen_image(image: np.ndarray) -> np.ndarray:
    return _per_channel(image, lambda ch: conv2d_clamped(ch, SHARPEN_KERNEL))


def blur_image(image: np.ndarray) -> np.ndarray:
    return _per_channel(image, lambda ch: conv2d_clamped(ch, BLUR_KERNEL, 9))


def convert_to_grayscale(image: np.ndarray) -> np.ndarray:
    """PIL Image.convert('L') semantics: L = (R*299 + G*587 + B*114) / 1000,
    computed via PIL itself so rounding matches the reference exactly."""
    from PIL import Image

    return np.array(Image.fromarray(np.asarray(image, dtype=np.uint8)).convert("L"))


def adjust_contrast(image: np.ndarray, factor: float) -> np.ndarray:
    """((ch - 128.0) * factor + 128.0).clip(0,255).astype(uint8), float64 math
    (pyvimz transformations.py:45-58)."""
    img = np.asarray(image)

    def f(ch):
        return ((ch - 128.0) * factor + 128.0).clip(0, 255).astype(np.uint8)

    return _per_channel(img, f)


def adjust_brightness(image: np.ndarray, factor: float) -> np.ndarray:
    img = np.asarray(image).astype(float)
    return np.clip(img * factor, 0, 255).astype(np.uint8)


def crop_image(image: np.ndarray, x: int, y: int, new_width: int, new_height: int) -> np.ndarray:
    return np.asarray(image)[y : y + new_height, x : x + new_width]


def redact_image(image: np.ndarray, block: int = 40, indicators=None):
    """Zero out redacted 40x40 blocks; default is the reference's demo
    checkerboard ((by+bx) odd). Returns (transformed, indicator list of 0/1
    ints, block-raster order)."""
    img = np.asarray(image).copy()
    h, w = img.shape[:2]
    by, bx = h // block, w // block
    if indicators is None:
        indicators = [(r + c) % 2 for r in range(by) for c in range(bx)]
    assert len(indicators) == by * bx
    for idx, red in enumerate(indicators):
        if red:
            r, c = divmod(idx, bx)
            img[r * block : (r + 1) * block, c * block : (c + 1) * block] = 0
    return img, [int(v) for v in indicators]


def resize_image(image: np.ndarray, new_height: int, new_width: int) -> np.ndarray:
    """Integer-indexed bilinear resize matching pyvimz transformations.py:97-147.

    HD (720-row) sources use alternating 2/3 | 1/3 row weights; other sources
    use 1/2 weights. Float64 math, final truncation via uint8 assignment.
    """
    img = np.asarray(image)
    height, width, _ = img.shape
    x_ratio = float(width) / float(new_width)
    y_ratio = float(height) / float(new_height)

    j = np.arange(new_width)
    i = np.arange(new_height)
    x_l = (j * x_ratio).astype(int)
    x_h = x_l + 1
    y_l = (i * y_ratio).astype(int)
    y_h = y_l + 1

    # Clamp reads like numpy fancy-indexing would fail otherwise; the
    # reference indexes img_array[y_h, x_h] directly, so y_h/x_h stay in
    # bounds for its supported ratios (3:2 and 2:1 with these dims).
    a = img[np.ix_(y_l, x_l)].astype(np.float64)
    b = img[np.ix_(y_l, x_h)].astype(np.float64)
    c = img[np.ix_(y_h, x_l)].astype(np.float64)
    d = img[np.ix_(y_h, x_h)].astype(np.float64)

    if height == 720:
        wgt = np.where(i % 2 == 0, 2.0, 1.0) / 3.0
        wgt = wgt[:, None, None]
        summ = a * wgt + b * wgt + c * (1 - wgt) + d * (1 - wgt)
    else:
        summ = (a + b + c + d) * 0.5
    out = np.zeros((new_height, new_width, img.shape[2]), dtype=np.uint8)
    out[...] = summ / 2  # uint8 assignment truncates like the reference
    return out
