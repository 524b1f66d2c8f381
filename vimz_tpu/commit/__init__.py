from vimz_tpu.commit.image_hash import (
    pack_rows_limbs,
    pack_blocks_limbs,
    hash_image_arkworks,
    hash_image_circom,
    ImageHasher,
)

__all__ = [
    "pack_rows_limbs",
    "pack_blocks_limbs",
    "hash_image_arkworks",
    "hash_image_circom",
    "ImageHasher",
]
