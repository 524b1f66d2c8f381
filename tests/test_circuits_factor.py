"""Step-circuit tests: brightness and contrast.

Split one file per circuit family so the compile-cache warm phase (see
conftest.pytest_sessionstart) runs each family in its own crash-isolated
process — this jaxlib's XLA CPU pipeline becomes unstable after many fresh
compiles in one process.
"""

import numpy as np

from vimz_tpu.circuits import synthesize
from vimz_tpu.pipeline.input import Resolution, Transformation

from tests.test_circuits import assert_satisfied, make_input, tiny_image
from vimz_tpu.editor import adjust_brightness, adjust_contrast

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


