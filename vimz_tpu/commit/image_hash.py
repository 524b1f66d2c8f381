"""Image commitments: Poseidon running hashes over packed pixel rows/blocks.

Packing: 10 pixels x 3 bytes, little-endian, per field element ("word"), so a
1280-wide row is 128 words (reference: vimz/src/image_hash.rs:50-56,
pyvimz/pyvimz/img/ops.py:4-34). Grayscale pixels pack as [v, 0, 0].

Two running-hash flavors, matching the reference's two pipelines:

- arkworks flavor (`hash_image_arkworks`): per chunk,
  h' = TwoToOneCRH(h, CRH(words)) with the rate-16 sponge
  (reference: vimz/src/image_hash.rs:20-48). Used by the sonobe/arkworks
  pipeline; the final IVC state holds exactly these values.

- circomlib flavor (`hash_image_circom`): per row,
  h' = Poseidon2(h, WindowFold8(words)) where WindowFold8 is circomlib-based
  window folding (reference: circuits/src/utils/hashers.circom:40-74,
  circuits/image_running_hash.circom). NOTE: the window fold reproduces the
  reference's round-count computation faithfully, including the quirk that
  for a 128-word row only the first 113 words enter the hash
  (numRounds = ceil(128/8) = 16 windows consuming 8 + 15*7 = 113 words).
  The golden `.hash` fixtures in marketplace/image-data confirm this.

Row hashes for all rows are computed in one batched permutation sweep; only
the tiny accumulator chain is sequential (a lax.scan of 2-to-1 hashes).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vimz_tpu.fields.limbs import FR_LIMBS
from vimz_tpu.poseidon.params import arkworks_params, circomlib_params
from vimz_tpu.poseidon.sponge import BatchedPoseidon

PACKING_FACTOR = 10
BLOCK_SIZE = 40


def _to_rgb_rows(img: np.ndarray) -> np.ndarray:
    """(H, W) grayscale or (H, W, 3) RGB uint8 -> (H, W, 3) uint8."""
    img = np.asarray(img)
    if img.ndim == 2:  # grayscale: v -> [v, 0, 0] (24-bit LE value)
        out = np.zeros(img.shape + (3,), dtype=np.uint8)
        out[..., 0] = img
        return out
    assert img.ndim == 3 and img.shape[2] == 3, f"unsupported image shape {img.shape}"
    return img.astype(np.uint8)


def _bytes_to_limbs(b: np.ndarray) -> np.ndarray:
    """(..., 30) uint8 LE bytes -> (..., 16) uint32 16-bit limbs."""
    b = b.astype(np.uint32)
    limbs = np.zeros(b.shape[:-1] + (16,), dtype=np.uint32)
    limbs[..., :15] = b[..., 0::2] + (b[..., 1::2] << 8)
    return limbs


def pack_rows_limbs(img: np.ndarray) -> np.ndarray:
    """Image -> (H, ceil(W/10), 16) uint32 packed words (standard form)."""
    rgb = _to_rgb_rows(img)
    h, w, _ = rgb.shape
    pad = (-w) % PACKING_FACTOR
    if pad:
        rgb = np.pad(rgb, ((0, 0), (0, pad), (0, 0)))
    words = rgb.reshape(h, (w + pad) // PACKING_FACTOR, PACKING_FACTOR * 3)
    return _bytes_to_limbs(words)


def pack_blocks_limbs(img: np.ndarray, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Image -> (n_blocks, block_size*block_size//10, 16) packed block words.

    Blocks iterate row-major (y outer, x inner); pixels within a block
    row-major (reference: vimz/src/image_hash.rs:72-94).
    """
    rgb = _to_rgb_rows(img)
    h, w, _ = rgb.shape
    assert h % block_size == 0 and w % block_size == 0
    by, bx = h // block_size, w // block_size
    blocks = (
        rgb.reshape(by, block_size, bx, block_size, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(by * bx, block_size * block_size, 3)
    )
    words = blocks.reshape(by * bx, block_size * block_size // PACKING_FACTOR, 30)
    return _bytes_to_limbs(words)


class ImageHasher:
    """Batched running-hash engines for both Poseidon flavors."""

    def __init__(self, field=FR_LIMBS):
        self.f = field
        self.ark = BatchedPoseidon(arkworks_params(), field)
        self._circom = {}

    def _circom_pos(self, n_inputs: int) -> BatchedPoseidon:
        if n_inputs not in self._circom:
            self._circom[n_inputs] = BatchedPoseidon(circomlib_params(n_inputs), self.f)
        return self._circom[n_inputs]

    # -- arkworks flavor -------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def chunk_hashes_arkworks(self, words_mont):
        """(S, L, 16) Montgomery words -> (S, 16) CRH per chunk (batched)."""
        return self.ark.sponge_hash(words_mont)

    @partial(jax.jit, static_argnums=0)
    def running_hash_arkworks(self, words_mont, acc0=None):
        """(S, L, 16) Montgomery words -> (16,) final accumulator."""
        chunk_hashes = self.chunk_hashes_arkworks(words_mont)
        return self.accumulate_arkworks(chunk_hashes, acc0)

    def accumulate_arkworks(self, chunk_hashes, acc0=None):
        """Sequential fold acc' = TwoToOne(acc, h) over (S, 16) chunk hashes."""
        if acc0 is None:
            acc0 = jnp.zeros((16,), dtype=jnp.uint32)

        def step(acc, h):
            return self.ark.two_to_one(acc, h), None

        acc, _ = lax.scan(step, acc0, chunk_hashes)
        return acc

    # -- circomlib flavor ------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def array_hash_circom(self, words_mont):
        """circom ArrayHasher (window-8 fold) over (..., L, 16) -> (..., 16).

        First window: Poseidon(8) of words[0:8]; subsequent windows fold 7 new
        words with the running hash via Poseidon(8). Reproduces the reference's
        numRounds = ceil(L/8) (circuits/src/utils/hashers.circom:40-74), which
        leaves trailing words unhashed for L > 8 + 7*(ceil(L/8)-1).
        """
        L = words_mont.shape[-2]
        window = 8
        num_rounds = (L + window - 1) // window
        first = min(L, window)
        h = self._circom_pos(first).circom_hash(words_mont[..., :first, :])
        processed = first
        # Full windows of 7 go through one traced scan body.
        n_full = 0
        while n_full < num_rounds - 1 and processed + (n_full + 1) * (window - 1) <= L:
            n_full += 1
        if n_full:
            pos8 = self._circom_pos(window)
            chunks = words_mont[..., processed : processed + n_full * 7, :]
            chunks = chunks.reshape(chunks.shape[:-2] + (n_full, 7, 16))
            chunks = jnp.moveaxis(chunks, -3, 0)

            def body(acc, chunk):
                inputs = jnp.concatenate([acc[..., None, :], chunk], axis=-2)
                return pos8.circom_hash(inputs), None

            h, _ = lax.scan(body, h, chunks)
            processed += n_full * 7
        # Ragged final window, if any.
        for _ in range(num_rounds - 1 - n_full):
            size = min(L - processed, window - 1)
            chunk = words_mont[..., processed : processed + size, :]
            inputs = jnp.concatenate([h[..., None, :], chunk], axis=-2)
            h = self._circom_pos(size + 1).circom_hash(inputs)
            processed += size
        return h

    @partial(jax.jit, static_argnums=0)
    def running_hash_circom(self, words_mont, acc0=None):
        """(S, L, 16) Montgomery words -> (16,) final accumulator."""
        return self.chain_circom(words_mont, acc0)[-1]

    @partial(jax.jit, static_argnums=0)
    def chain_circom(self, words_mont, acc0=None):
        """(S, L, 16) Montgomery words -> (S+1, 16) accumulator chain
        (index i = state before absorbing chunk i)."""
        row_hashes = self.array_hash_circom(words_mont)
        return self.accumulate_chain_circom(row_hashes, acc0)

    @partial(jax.jit, static_argnums=0)
    def accumulate_chain_circom(self, chunk_hashes, acc0=None):
        """(S, 16) chunk hashes -> (S+1, 16) P2-fold accumulator chain."""
        if acc0 is None:
            acc0 = jnp.zeros((16,), dtype=jnp.uint32)
        p2 = self._circom_pos(2)

        def step(acc, h):
            nxt = p2.circom_hash(jnp.stack([acc, h], axis=-2))
            return nxt, nxt

        _, accs = lax.scan(step, acc0, chunk_hashes)
        return jnp.concatenate([acc0[None], accs], axis=0)


_HASHER = None


def _hasher() -> ImageHasher:
    global _HASHER
    if _HASHER is None:
        _HASHER = ImageHasher()
    return _HASHER


def _prep(words: np.ndarray, nsteps=None):
    f = FR_LIMBS
    if nsteps is not None:
        words = words[: min(nsteps, words.shape[0])]
    return f.to_mont_j(jnp.asarray(words))


def hash_image_arkworks(img: np.ndarray, mode: str = "row-wise", nsteps=None) -> int:
    """Arkworks-flavor image commitment (matches `vimz image-hasher` Rust bin,
    reference: vimz/src/bin/image_hasher.rs:21-25)."""
    words = pack_rows_limbs(img) if mode == "row-wise" else pack_blocks_limbs(img)
    h = _hasher()
    acc = h.running_hash_arkworks(_prep(words, nsteps))
    return int(h.f.from_limbs_mont(np.asarray(acc))[()])


def hash_image_circom(img: np.ndarray, nsteps=None) -> int:
    """Circomlib-flavor image commitment (matches the pyvimz `image-hasher`
    CLI and the golden marketplace/image-data fixtures)."""
    words = pack_rows_limbs(img)
    h = _hasher()
    acc = h.running_hash_circom(_prep(words, nsteps))
    return int(h.f.from_limbs_mont(np.asarray(acc))[()])
