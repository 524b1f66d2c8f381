"""image-editor CLI: apply a transformation and emit the witness JSON.

Command-line compatible with the reference's pyvimz `image-editor`
(pyvimz/pyvimz/image_editor.py:42-150); the JSON output uses the same keys
(original/transformed + factor|info|redact) and hex-word packing, so witness
files are interchangeable between the two stacks.
"""

from __future__ import annotations

import argparse
import json
import os
from os import path

import numpy as np

from vimz_tpu.editor import (
    adjust_brightness,
    adjust_contrast,
    blur_image,
    convert_to_grayscale,
    crop_image,
    redact_image,
    resize_image,
    sharpen_image,
)
from vimz_tpu.editor.ops import compress_by_blocks_hex, compress_by_rows_hex, zero_row_hex

OPERATIONS = [
    "blur",
    "brightness",
    "contrast",
    "crop",
    "grayscale",
    "hash",
    "redact",
    "resize",
    "sharpness",
]

SIZE_MAP = {"sd": (640, 480), "hd": (1280, 720), "fhd": (1920, 1080)}
RESIZE_MAP = {"hd to sd": (640, 480), "4k to fhd": (1920, 1080)}


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Image formatting tool (vimz_tpu)")
    parser.add_argument("operation", type=str, choices=OPERATIONS)
    parser.add_argument("--image-path", "-i", required=True)
    parser.add_argument("--output", "-o", default="./")
    parser.add_argument("--save-png")
    parser.add_argument("--factor", type=float)
    parser.add_argument("--x", type=int)
    parser.add_argument("--y", type=int)
    parser.add_argument("--crop-size", choices=["SD", "HD", "FHD"])
    parser.add_argument("--resize-option", choices=["HD to SD", "4K to FHD"])
    parser.add_argument(
        "--preview",
        nargs="?",
        const="show",
        metavar="PNG",
        help="side-by-side before/after preview: no value = interactive "
        "window, with a path = save the figure there",
    )
    return parser.parse_args(argv)


def build_witness(operation: str, image: np.ndarray, args) -> tuple[dict, np.ndarray | None]:
    """Returns (witness dict, transformed image or None)."""
    out = {"original": compress_by_rows_hex(image)}
    transformed = None

    if operation == "hash":
        pass
    elif operation == "grayscale":
        transformed = convert_to_grayscale(image)
    elif operation in ("brightness", "contrast"):
        fn = adjust_brightness if operation == "brightness" else adjust_contrast
        transformed = fn(image, args.factor)
        out["factor"] = int(args.factor * 10)
    elif operation in ("sharpness", "blur"):
        transformed = sharpen_image(image) if operation == "sharpness" else blur_image(image)
        zeros = [zero_row_hex(image.shape[1] // 10)]
        out["original"] = zeros + out["original"] + zeros
    elif operation == "crop":
        w, h = SIZE_MAP[args.crop_size.lower()]
        transformed = crop_image(image, args.x, args.y, w, h)
        out["info"] = args.x * 2**24 + args.y * 2**12
    elif operation == "redact":
        out["original"] = compress_by_blocks_hex(image)
        transformed, indicators = redact_image(image)
        out["redact"] = [hex(v) for v in indicators]
        out["transformed"] = compress_by_blocks_hex(transformed)
    elif operation == "resize":
        w, h = RESIZE_MAP[args.resize_option.lower()]
        transformed = resize_image(image, h, w)

    if transformed is not None and operation != "redact":
        out["transformed"] = compress_by_rows_hex(transformed)
    return out, transformed


def main(argv=None):
    from PIL import Image

    args = parse_args(argv)
    operation = args.operation
    with Image.open(args.image_path) as im:
        image = np.array(im)

    out, transformed = build_witness(operation, image, args)

    if os.path.isdir(args.output):
        output_path = path.join(args.output, f"{operation}.json")
    else:
        output_path = args.output
    with open(output_path, "w") as fp:
        json.dump(out, fp, indent=4)
    print(f"Transformation {operation} applied. Data saved to {output_path}.")

    if args.save_png and transformed is not None:
        Image.fromarray(transformed).save(args.save_png)
        print(f"Transformed image saved as {args.save_png}")

    if args.preview and transformed is not None:
        from vimz_tpu.editor.plotting import preview_pair

        show = args.preview == "show"
        preview_pair(
            image,
            transformed,
            save_to=None if show else args.preview,
            show=show,
        )
        if not show:
            print(f"Preview saved as {args.preview}")


if __name__ == "__main__":
    main()
