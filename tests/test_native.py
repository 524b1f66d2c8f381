"""Native C loader tests: exactness vs the pure-Python path."""

import numpy as np

from vimz_tpu.fields.limbs import FR_LIMBS
from vimz_tpu.utils.native import get_loader, hex_rows_to_limbs


def test_hex_rows_to_limbs_matches_python():
    rng = np.random.default_rng(1)
    ints = [[int(rng.integers(0, 2**62)) ** 4 % (2**240) for _ in range(7)] for _ in range(5)]
    rows = [["0x%060x" % v for v in row] for row in ints]
    got = hex_rows_to_limbs(rows)
    want = FR_LIMBS.to_limbs(np.array(ints, dtype=object))
    assert np.array_equal(got, want)


def test_native_loader_ragged_and_prefix():
    if get_loader() is None:
        import pytest

        pytest.skip("no C toolchain")
    rows = [["0x00", "0xFF", "ff", "0"]]
    got = hex_rows_to_limbs(rows)
    want = FR_LIMBS.to_limbs(np.array([[0, 255, 255, 0]], dtype=object))
    assert np.array_equal(got, want)


def test_pack_pixels_matches_python():
    loader = get_loader()
    if loader is None:
        import pytest

        pytest.skip("no C toolchain")
    from vimz_tpu.commit.image_hash import pack_rows_limbs

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (3, 20, 3), dtype=np.uint8)
    want = pack_rows_limbs(img)
    rgb = img.reshape(3 * 2, 30).tobytes()
    raw = loader.pack_pixels_to_limbs(rgb, 6)
    got = np.frombuffer(raw, dtype=np.uint32).reshape(3, 2, 16)
    assert np.array_equal(got, want)
