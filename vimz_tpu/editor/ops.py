"""Packing and convolution primitives for witness-input generation.

Byte-compatible with the reference's pyvimz output format
(pyvimz/pyvimz/img/ops.py): rows packed 10 pixels per hex word (little-endian
bytes, fixed-width 60 hex chars), 40x40 blocks packed to 160 words. The
implementations here are vectorized numpy (the reference loops per pixel).
"""

from __future__ import annotations

import numpy as np


def _words_from_rgb(flat: np.ndarray) -> np.ndarray:
    """(..., 10, 3) uint8 -> (...,) object array of packed little-endian ints."""
    b = flat.astype(object)
    val = np.zeros(flat.shape[:-2], dtype=object)
    for i in range(flat.shape[-2]):
        px = b[..., i, 0] + (b[..., i, 1] << 8) + (b[..., i, 2] << 16)
        val += px << (24 * i)
    return val


def _to_rgb(image: np.ndarray) -> np.ndarray:
    image = np.asarray(image)
    if image.ndim == 2:
        out = np.zeros(image.shape + (3,), dtype=np.uint8)
        out[..., 0] = image
        return out
    return image.astype(np.uint8)


def pack_words_rows(image: np.ndarray) -> np.ndarray:
    """Image -> (H, W/10) object array of packed word ints."""
    rgb = _to_rgb(image)
    h, w, _ = rgb.shape
    assert w % 10 == 0
    return _words_from_rgb(rgb.reshape(h, w // 10, 10, 3))


def pack_words_blocks(image: np.ndarray, block: int = 40) -> np.ndarray:
    """Image -> (n_blocks, 160) object array of packed word ints."""
    rgb = _to_rgb(image)
    h, w, _ = rgb.shape
    assert h % block == 0 and w % block == 0
    by, bx = h // block, w // block
    blocks = (
        rgb.reshape(by, block, bx, block, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(by * bx, block * block // 10, 10, 3)
    )
    return _words_from_rgb(blocks)


def _hex(word: int) -> str:
    return "0x" + format(int(word), "060x")


def compress_by_rows_hex(image: np.ndarray) -> list[list[str]]:
    """Reference-format hex rows (pyvimz compress_by_rows semantics)."""
    return [[_hex(w) for w in row] for row in pack_words_rows(image)]


def compress_by_blocks_hex(image: np.ndarray) -> list[list[str]]:
    return [[_hex(w) for w in blk] for blk in pack_words_blocks(image)]


def zero_row_hex(width_words: int) -> list[str]:
    """The reference emits blur/sharpness zero-padding rows as '0x00' literals
    (pyvimz/pyvimz/img/transformations.py:18,37)."""
    return ["0x00"] * width_words


def conv2d_clamped(channel: np.ndarray, kernel: np.ndarray, weight: int = 1) -> np.ndarray:
    """Zero-padded 3x3 (or any odd) conv with floor-div by `weight` and clamp
    to [0, 255] — exact integer semantics of pyvimz/pyvimz/img/ops.py:73-105,
    vectorized."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    padded = np.pad(channel.astype(np.int64), ((ph, ph), (pw, pw)))
    h, w = channel.shape
    acc = np.zeros((h, w), dtype=np.int64)
    for di in range(kh):
        for dj in range(kw):
            k = int(kernel[di, dj])
            if k:
                acc += k * padded[di : di + h, dj : dj + w]
    return np.clip(acc // weight, 0, 255).astype(np.uint8)
