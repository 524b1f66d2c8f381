"""R1CS gadget library: range checks, comparisons, selection, Poseidon.

Gadgets mirror the *semantics* of the reference's constraint helpers
(arkworks-small-values-ops: abs_diff / min / max / le, and circomlib
templates), with layouts designed fresh for this framework. Gadgets operate
purely on linear combinations (`LC`); witness values are produced later by
the batched device tape executor (r1cs/witness.py), so no Python-int math
happens per fold step during synthesis.
"""

from __future__ import annotations

from vimz_tpu.r1cs.builder import LC, Builder, P
from vimz_tpu.poseidon.params import PoseidonParams, circomlib_params


def vconst(c: int) -> LC:
    return LC.const(c)


def vsum(items) -> LC:
    items = list(items)
    out = items[0]
    for x in items[1:]:
        out = out + x
    return out


def mul(b: Builder, x: LC, y: LC) -> LC:
    return b.op_mul(x, y)


def enforce_equal(b: Builder, x: LC, y: LC):
    b.enforce_equal(x, y)


def enforce_bool(b: Builder, x: LC):
    b.enforce(x, x - LC.const(1), LC())


def to_bits(b: Builder, x: LC, n: int) -> list[LC]:
    """n boolean wires with sum(2^i b_i) = x. Values must fit n bits."""
    return b.op_bits(x, n)


def from_bits(bits: list[LC]) -> LC:
    return vsum(bit.scale(1 << i) for i, bit in enumerate(bits))


def le(b: Builder, x: LC, y: LC, n: int) -> LC:
    """Boolean (x <= y), for x, y < 2^n. Decomposes y - x + 2^n into n+1 bits;
    the top bit is the result (same trick as arkworks-small-values-ops `le`)."""
    d = (y - x).add_const(1 << n)
    bits = to_bits(b, d, n + 1)
    return bits[n]


def select(b: Builder, cond: LC, x: LC, y: LC) -> LC:
    """cond ? x : y (cond boolean)."""
    return mul(b, cond, x - y) + y


def abs_diff(b: Builder, x: LC, y: LC, n: int) -> LC:
    """|x - y| for x, y < 2^n (reference: arkworks-small-values-ops abs_diff)."""
    geq = le(b, y, x, n)  # x >= y
    sign = geq.scale(2).add_const(P - 1)  # 2*geq - 1 in {1, -1}
    d = mul(b, x - y, sign)
    to_bits(b, d, n)
    return d


def enforce_le_const(b: Builder, x: LC, bound: int, n: int):
    """x <= bound, for x < 2^n (bound static)."""
    r = le(b, x, vconst(bound), n)
    b.enforce_equal(r, LC.const(1))


def enforce_abs_diff_le(b: Builder, x: LC, y: LC, bound: int):
    """|x - y| <= bound via ONE tolerance-width decomposition.

    d = x - y + bound is decomposed to n = bits(2*bound) bits, then d <=
    2*bound. Sound whenever x and y are already range-bounded far below P
    (every call site compares scaled bytes, < 2^35): a negative x - y + bound
    wraps mod P to a ~254-bit value that cannot satisfy the n-bit
    decomposition, so the integer relation -bound <= x - y <= bound is
    enforced exactly. Replaces abs_diff + enforce_le_const (3n+7 constraints
    at the *operand* width n) with 2n'+4 at the *tolerance* width n' — the
    semantics of the reference checkers (e.g. grayscale.rs:16-49 tolerance
    1000, blur.rs:22-64 tolerance 9) at a fraction of the rows."""
    n = max(1, (2 * bound).bit_length())
    d = (x - y).add_const(bound)
    to_bits(b, d, n)
    if 2 * bound < (1 << n) - 1:
        enforce_le_const(b, d, 2 * bound, n)


def vmin(b: Builder, x: LC, y: LC, n: int) -> LC:
    c = le(b, x, y, n)
    return select(b, c, x, y)


def vmax(b: Builder, x: LC, y: LC, n: int) -> LC:
    c = le(b, x, y, n)
    return select(b, c, y, x)


def saturating_sub(b: Builder, x: LC, y: LC, n: int) -> LC:
    """max(x - y, 0) for x, y < 2^n (reference: saturating_sub in contrast)."""
    geq = le(b, y, x, n)  # x >= y
    diff = mul(b, geq, x - y)
    to_bits(b, diff, n)
    return diff


def is_zero(b: Builder, x: LC) -> LC:
    """Boolean (x == 0): standard inverse trick."""
    return b.op_iszero(x)


# ----------------------------------------------------------------------
# Packed-word decompression
# ----------------------------------------------------------------------


def decompress_word_bytes(b: Builder, word: LC, n_bytes: int = 30) -> list[LC]:
    """Packed word -> n_bytes little-endian byte LCs over one bit decomposition.

    The bit decomposition's recomposition equality IS the packing constraint
    (sound core of the reference's Decompressor,
    circuits/src/utils/pixels.circom:6-47 / decompress_pixels,
    arkworks compression.rs:12-41)."""
    bits = to_bits(b, word, 8 * n_bytes)
    return [
        vsum(bits[8 * i + j].scale(1 << j) for j in range(8)) for i in range(n_bytes)
    ]


def word_to_pixels(b: Builder, word: LC) -> list[tuple[LC, LC, LC]]:
    """Packed word -> 10 (r, g, b) byte triples."""
    bytes_ = decompress_word_bytes(b, word)
    return [(bytes_[3 * i], bytes_[3 * i + 1], bytes_[3 * i + 2]) for i in range(10)]


def word_to_gray_values(b: Builder, word: LC) -> list[LC]:
    """Packed word -> 10 24-bit luma values (semantics of DecompressorGray /
    decompress_grayscale: each pixel slot is one 24-bit value)."""
    bytes_ = decompress_word_bytes(b, word)
    out = []
    for i in range(10):
        v = (
            bytes_[3 * i]
            + bytes_[3 * i + 1].scale(1 << 8)
            + bytes_[3 * i + 2].scale(1 << 16)
        )
        out.append(v)
    return out


# ----------------------------------------------------------------------
# Poseidon gadget (circomlib profile — the oracle-verified hash flavor)
# ----------------------------------------------------------------------


class PoseidonGadget:
    """In-circuit Poseidon permutation for a fixed parameter set.

    Emits one `perm` tape op for the whole permutation (so the witness
    executor evaluates all rounds in a single batched kernel,
    r1cs/witness.py) plus the standard 3-constraints-per-sbox R1CS rows
    referencing the op's preallocated x2/x4/x5 wires.
    """

    def __init__(self, params: PoseidonParams):
        self.params = params
        p = params
        self.n_sbox = p.full_rounds * p.t + p.partial_rounds

    def permute(self, b: Builder, state: list[LC]) -> list[LC]:
        p = self.params
        t = p.t
        half = p.full_rounds // 2
        w = b.op_perm(list(state), n_inputs=t - 1, n_out=3 * self.n_sbox)
        for r in range(p.rounds):
            state = [s.add_const(p.ark[r][i]) for i, s in enumerate(state)]
            if r < half or r >= half + p.partial_rounds:
                state = [self._sbox(b, s, w + 3 * i) for i, s in enumerate(state)]
                w += 3 * t
            else:
                state = [self._sbox(b, state[0], w)] + state[1:]
                w += 3
            state = [
                vsum(state[j].scale(p.mds[i][j]) for j in range(t)) for i in range(t)
            ]
        return state

    @staticmethod
    def _sbox(b: Builder, x: LC, w: int) -> LC:
        x2, x4, x5 = LC({w: 1}), LC({w + 1: 1}), LC({w + 2: 1})
        b.enforce(x, x, x2)
        b.enforce(x2, x2, x4)
        b.enforce(x4, x, x5)
        return x5


_GADGETS: dict[int, PoseidonGadget] = {}


def circom_gadget(n_inputs: int) -> PoseidonGadget:
    if n_inputs not in _GADGETS:
        _GADGETS[n_inputs] = PoseidonGadget(circomlib_params(n_inputs))
    return _GADGETS[n_inputs]


def poseidon_hash(b: Builder, inputs: list[LC]) -> LC:
    """circomlib Poseidon(n): state [0, inputs...], one permutation, out[0]."""
    g = circom_gadget(len(inputs))
    state = [vconst(0)] + list(inputs)
    return g.permute(b, state)[0]


def window_fold_hash(b: Builder, words: list[LC]) -> LC:
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


def head_tail_hash(b: Builder, acc: LC, words: list[LC]) -> LC:
    """circom HeadTailHasher: Poseidon2(acc, ArrayHasher(words))."""
    return poseidon_hash(b, [acc, window_fold_hash(b, words)])
