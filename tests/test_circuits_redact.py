"""Step-circuit tests: redact (block mode).

Split one file per circuit family so the compile-cache warm phase (see
conftest.pytest_sessionstart) runs each family in its own crash-isolated
process — this jaxlib's XLA CPU pipeline becomes unstable after many fresh
compiles in one process.
"""

import numpy as np

from vimz_tpu.circuits import synthesize
from vimz_tpu.pipeline.input import Resolution, Transformation

from tests.test_circuits import assert_satisfied, make_input, tiny_image
from vimz_tpu.editor import redact_image

def test_redact_circuit():
    img = tiny_image(h=40, w=80, seed=5)
    tran, indicators = redact_image(img)
    assert indicators == [0, 1]
    inp = make_input(img, tran, {"redact": indicators}, blocks=True)
    r1cs = synthesize(Transformation.REDACT, inp)
    assert_satisfied(r1cs)

