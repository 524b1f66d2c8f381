#!/usr/bin/env python3
"""Generate deterministic synthetic source images (SD/HD/FHD).

The reference ships camera photos in source_image/ (reference:
source_image/, used by its Makefile input-data targets). This framework
generates its own fixtures instead of copying binaries: a smooth multi-hue
gradient with geometric detail, deterministic (no RNG seed drift) and
PNG-compressible, exercising the full 0..255 range in every channel.
"""

import os
import sys

import numpy as np

SIZES = {"SD": (480, 640), "HD": (720, 1280), "FHD": (1080, 1920)}


def synth(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    u, v = x / w, y / h
    r = 255 * (0.5 + 0.5 * np.sin(2 * np.pi * (u * 3 + v)))
    g = 255 * (0.5 + 0.5 * np.cos(2 * np.pi * (u - v * 2)))
    b = 255 * (u * v)
    # geometric detail: concentric rings + a diagonal checker band
    ring = np.sin(((u - 0.5) ** 2 + (v - 0.5) ** 2) * 200) > 0
    checker = ((x // 40 + y // 40) % 2).astype(bool) & (np.abs(u - v) < 0.1)
    r = np.where(ring, 255 - r, r)
    g = np.where(checker, 255 - g, g)
    img = np.stack([r, g, b], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "source_image"
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    for name, (h, w) in SIZES.items():
        path = os.path.join(out_dir, f"{name}.png")
        Image.fromarray(synth(h, w)).save(path)
        print(f"wrote {path} ({w}x{h})")


if __name__ == "__main__":
    main()
