from vimz_tpu.editor.transformations import (
    adjust_brightness,
    adjust_contrast,
    blur_image,
    convert_to_grayscale,
    crop_image,
    redact_image,
    resize_image,
    sharpen_image,
)
from vimz_tpu.editor.ops import compress_by_rows_hex, compress_by_blocks_hex, conv2d_clamped

__all__ = [
    "adjust_brightness",
    "adjust_contrast",
    "blur_image",
    "convert_to_grayscale",
    "crop_image",
    "redact_image",
    "resize_image",
    "sharpen_image",
    "compress_by_rows_hex",
    "compress_by_blocks_hex",
    "conv2d_clamped",
]
