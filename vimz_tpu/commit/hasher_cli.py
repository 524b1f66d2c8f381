"""image-hasher CLI: Poseidon commitment of an image.

Mirrors both reference hashers:
- default (circom flavor): pyvimz `image-hasher` — the flavor of the golden
  marketplace fixtures and of this framework's flagship pipeline
  (usage: image-hasher <image> [output] like pyvimz/pyvimz/image_hasher.py).
- --mode arkworks[-block]: the Rust `image-hasher` binary's rate-16 sponge
  (vimz/src/bin/image_hasher.rs).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="image-hasher")
    p.add_argument("image")
    p.add_argument("output", nargs="?")
    p.add_argument("--rows", type=int, help="limit to the first N rows/blocks")
    p.add_argument(
        "--mode",
        default="circom",
        choices=["circom", "arkworks", "arkworks-block"],
    )
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from vimz_tpu.commit import hash_image_arkworks, hash_image_circom

    with Image.open(args.image) as im:
        img = np.array(im)

    if args.mode == "circom":
        h = hash_image_circom(img, nsteps=args.rows)
    else:
        mode = "block-wise" if args.mode == "arkworks-block" else "row-wise"
        h = hash_image_arkworks(img, mode=mode, nsteps=args.rows)

    print(f"Computed hash:       {h}")
    print(f"Computed hash (hex): {hex(h)}")
    if args.output:
        with open(args.output, "w") as f:
            f.write(str(h))
        print(f"Hash saved to: {args.output}")


if __name__ == "__main__":
    main()
