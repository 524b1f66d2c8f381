"""Step-circuit tests: crop and resize.

Split one file per circuit family so the compile-cache warm phase (see
conftest.pytest_sessionstart) runs each family in its own crash-isolated
process — this jaxlib's XLA CPU pipeline becomes unstable after many fresh
compiles in one process.
"""

import numpy as np

from vimz_tpu.circuits import synthesize
from vimz_tpu.pipeline.input import Resolution, Transformation

from tests.test_circuits import assert_satisfied, make_input, tiny_image

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


