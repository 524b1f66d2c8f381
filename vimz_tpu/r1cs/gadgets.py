"""R1CS gadget library: range checks, comparisons, selection, Poseidon.

Gadgets mirror the *semantics* of the reference's constraint helpers
(arkworks-small-values-ops: abs_diff / min / max / le / enforce_in_bound /
one_hot_encode, and circomlib templates), with layouts designed fresh for
this framework. Every gadget works on `VLC` pairs (linear combination +
batched values) so witness values flow alongside constraint construction
without re-evaluating LCs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from vimz_tpu.r1cs.builder import LC, Builder, P
from vimz_tpu.poseidon.params import PoseidonParams, circomlib_params


@dataclass
class VLC:
    """A linear combination together with its batched value vector."""

    lc: LC
    vals: np.ndarray  # (S,) object ints

    def __add__(self, other: "VLC") -> "VLC":
        return VLC(self.lc + other.lc, (self.vals + other.vals) % P)

    def __sub__(self, other: "VLC") -> "VLC":
        return VLC(self.lc - other.lc, (self.vals - other.vals) % P)

    def scale(self, c: int) -> "VLC":
        c %= P
        return VLC(self.lc.scale(c), (self.vals * c) % P)

    def add_const(self, c: int) -> "VLC":
        c %= P
        return VLC(self.lc + LC.const(c), (self.vals + c) % P)


def vconst(b: Builder, c: int) -> VLC:
    return VLC(LC.const(c), np.full(b.S, c % P, dtype=object))


def valloc(b: Builder, vals, public: bool = False) -> VLC:
    vals = np.asarray(vals, dtype=object) % P
    return VLC(b.alloc(vals, public=public), vals)


def vsum(items) -> VLC:
    items = list(items)
    out = items[0]
    for x in items[1:]:
        out = out + x
    return out


def mul(b: Builder, x: VLC, y: VLC) -> VLC:
    prod = (x.vals * y.vals) % P
    w = b.alloc(prod)
    b.enforce(x.lc, y.lc, w)
    return VLC(w, prod)


def enforce_equal(b: Builder, x: VLC, y: VLC):
    b.enforce_equal(x.lc, y.lc)


def enforce_bool(b: Builder, x: VLC):
    b.enforce(x.lc, x.lc - LC.const(1), LC())


def to_bits(b: Builder, x: VLC, n: int) -> list[VLC]:
    """Allocate n boolean wires with sum(2^i b_i) = x. Values must fit n bits."""
    bits = []
    for i in range(n):
        bv = (x.vals >> i) & 1
        w = valloc(b, bv)
        enforce_bool(b, w)
        bits.append(w)
    recomposed = vsum(bit.scale(1 << i) for i, bit in enumerate(bits))
    b.enforce_equal(recomposed.lc, x.lc)
    return bits


def from_bits(bits: list[VLC]) -> VLC:
    return vsum(bit.scale(1 << i) for i, bit in enumerate(bits))


def le(b: Builder, x: VLC, y: VLC, n: int) -> VLC:
    """Boolean (x <= y), for x, y < 2^n. Decomposes y - x + 2^n into n+1 bits;
    the top bit is the result (same trick as arkworks-small-values-ops `le`)."""
    d = y - x
    d = d.add_const(1 << n)
    bits = to_bits(b, d, n + 1)
    return bits[n]


def select(b: Builder, cond: VLC, x: VLC, y: VLC) -> VLC:
    """cond ? x : y (cond boolean)."""
    return mul(b, cond, x - y) + y


def abs_diff(b: Builder, x: VLC, y: VLC, n: int) -> VLC:
    """|x - y| for x, y < 2^n (reference: arkworks-small-values-ops abs_diff)."""
    geq = le(b, y, x, n)  # x >= y
    sign = geq.scale(2).add_const(P - 1)  # 2*geq - 1 in {1, -1}
    diff_vals = np.where(geq.vals == 1, (x.vals - y.vals) % P, (y.vals - x.vals) % P)
    d = valloc(b, diff_vals)
    b.enforce(x.lc - y.lc, sign.lc, d.lc)
    to_bits(b, d, n)
    return d


def enforce_le_const(b: Builder, x: VLC, bound: int, n: int):
    """x <= bound, for x < 2^n (bound static)."""
    r = le(b, x, vconst(b, bound), n)
    b.enforce_equal(r.lc, LC.const(1))


def vmin(b: Builder, x: VLC, y: VLC, n: int) -> VLC:
    c = le(b, x, y, n)
    return select(b, c, x, y)


def vmax(b: Builder, x: VLC, y: VLC, n: int) -> VLC:
    c = le(b, x, y, n)
    return select(b, c, y, x)


def saturating_sub(b: Builder, x: VLC, y: VLC, n: int) -> VLC:
    """max(x - y, 0) for x, y < 2^n (reference: saturating_sub in contrast)."""
    geq = le(b, y, x, n)  # x >= y
    diff = mul(b, geq, x - y)
    to_bits(b, diff, n)
    return diff


def is_zero(b: Builder, x: VLC) -> VLC:
    """Boolean (x == 0): standard inverse trick."""
    inv_vals = np.array(
        [0 if v == 0 else pow(int(v), P - 2, P) for v in x.vals], dtype=object
    )
    z_vals = np.where(x.vals == 0, 1, 0).astype(object)
    inv = valloc(b, inv_vals)
    z = valloc(b, z_vals)
    b.enforce(x.lc, inv.lc, LC.const(1) - z.lc)  # x*inv = 1 - z
    b.enforce(x.lc, z.lc, LC())  # x*z = 0
    return z


# ----------------------------------------------------------------------
# Packed-word decompression
# ----------------------------------------------------------------------


def decompress_word_bytes(b: Builder, word: VLC, n_bytes: int = 30) -> list[VLC]:
    """Packed word -> n_bytes little-endian byte values (each range-checked).

    Constraint: word == sum(byte_i * 2^(8i)); bytes bit-decomposed. This is
    the sound core of the reference's Decompressor
    (circuits/src/utils/pixels.circom:6-47) / decompress_pixels
    (arkworks compression.rs:12-41).
    """
    bytes_ = []
    for i in range(n_bytes):
        bv = (word.vals >> (8 * i)) & 255
        byte = valloc(b, bv)
        to_bits(b, byte, 8)
        bytes_.append(byte)
    packed = vsum(byte.scale(1 << (8 * i)) for i, byte in enumerate(bytes_))
    b.enforce_equal(packed.lc, word.lc)
    return bytes_


def word_to_pixels(b: Builder, word: VLC) -> list[tuple[VLC, VLC, VLC]]:
    """Packed word -> 10 (r, g, b) byte triples."""
    bytes_ = decompress_word_bytes(b, word)
    return [(bytes_[3 * i], bytes_[3 * i + 1], bytes_[3 * i + 2]) for i in range(10)]


def word_to_gray_values(b: Builder, word: VLC) -> list[VLC]:
    """Packed word -> 10 24-bit luma values (semantics of DecompressorGray /
    decompress_grayscale: each pixel slot is one 24-bit value)."""
    bytes_ = decompress_word_bytes(b, word)
    out = []
    for i in range(10):
        v = bytes_[3 * i] + bytes_[3 * i + 1].scale(1 << 8) + bytes_[3 * i + 2].scale(1 << 16)
        out.append(v)
    return out


# ----------------------------------------------------------------------
# Poseidon gadget (circomlib profile — the oracle-verified hash flavor)
# ----------------------------------------------------------------------


class PoseidonGadget:
    """In-circuit Poseidon permutation for a fixed parameter set."""

    def __init__(self, params: PoseidonParams):
        self.params = params

    def permute(self, b: Builder, state: list[VLC]) -> list[VLC]:
        p = self.params
        t = p.t
        half = p.full_rounds // 2
        for r in range(p.rounds):
            state = [s.add_const(p.ark[r][i]) for i, s in enumerate(state)]
            if r < half or r >= half + p.partial_rounds:
                state = [self._sbox(b, s) for s in state]
            else:
                state = [self._sbox(b, state[0])] + state[1:]
            state = [
                vsum(state[j].scale(p.mds[i][j]) for j in range(t)) for i in range(t)
            ]
        return state

    @staticmethod
    def _sbox(b: Builder, x: VLC) -> VLC:
        x2 = mul(b, x, x)
        x4 = mul(b, x2, x2)
        return mul(b, x4, x)


_GADGETS: dict[int, PoseidonGadget] = {}


def circom_gadget(n_inputs: int) -> PoseidonGadget:
    if n_inputs not in _GADGETS:
        _GADGETS[n_inputs] = PoseidonGadget(circomlib_params(n_inputs))
    return _GADGETS[n_inputs]


def poseidon_hash(b: Builder, inputs: list[VLC]) -> VLC:
    """circomlib Poseidon(n): state [0, inputs...], one permutation, out[0]."""
    g = circom_gadget(len(inputs))
    state = [vconst(b, 0)] + list(inputs)
    return g.permute(b, state)[0]


def window_fold_hash(b: Builder, words: list[VLC]) -> VLC:
    """circom ArrayHasher window-8 fold over a word row
    (circuits/src/utils/hashers.circom:40-74, incl. the numRounds quirk)."""
    L = len(words)
    window = 8
    num_rounds = (L + window - 1) // window
    first = min(L, window)
    h = poseidon_hash(b, words[:first])
    processed = first
    for _ in range(num_rounds - 1):
        size = min(L - processed, window - 1)
        h = poseidon_hash(b, [h] + words[processed : processed + size])
        processed += size
    return h


def head_tail_hash(b: Builder, acc: VLC, words: list[VLC]) -> VLC:
    """circom HeadTailHasher: Poseidon2(acc, ArrayHasher(words))."""
    return poseidon_hash(b, [acc, window_fold_hash(b, words)])
