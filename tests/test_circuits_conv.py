"""Step-circuit tests: blur and sharpness.

Split one file per circuit family so the compile-cache warm phase (see
conftest.pytest_sessionstart) runs each family in its own crash-isolated
process — this jaxlib's XLA CPU pipeline becomes unstable after many fresh
compiles in one process.
"""

import numpy as np

from vimz_tpu.circuits import synthesize
from vimz_tpu.pipeline.input import Resolution, Transformation

from tests.test_circuits import assert_satisfied, make_input, tiny_image
from vimz_tpu.editor import blur_image, sharpen_image

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


