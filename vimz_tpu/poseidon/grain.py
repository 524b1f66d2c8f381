"""Grain-LFSR generation of Poseidon round constants and MDS matrices.

This reproduces, from the published specification, the parameter-derivation
procedure used by both of the reference's Poseidon instantiations:

- the arkworks `find_poseidon_ark_and_mds` used by the sonobe pipeline
  (reference: vimz/src/sonobe_backend/circuits/arkworks/mod.rs:18-41, which
  calls into ark-crypto-primitives), and
- the original Poseidon reference `generate_parameters_grain.sage`, which is
  where circomlib's hardcoded constants come from.

Both derive an 80-bit Grain LFSR seeded from (field type, sbox type, field
bits, state width t, full rounds, partial rounds), discard 160 bits, and then
draw round constants by rejection sampling and MDS Cauchy-matrix generators
by modular reduction.
"""

from __future__ import annotations

from functools import lru_cache


class GrainLFSR:
    def __init__(
        self,
        prime_num_bits: int,
        state_len: int,
        full_rounds: int,
        partial_rounds: int,
        sbox_is_inverse: bool = False,
    ):
        self.prime_num_bits = prime_num_bits
        state = [False] * 80
        # b0..b1: field type (prime field -> 01)
        state[1] = True
        # b2..b5: sbox type (x^alpha -> 0000, 1/x -> 0001 at b5)
        if sbox_is_inverse:
            state[5] = True

        def fill(lo: int, hi: int, value: int):
            for i in range(hi, lo - 1, -1):
                state[i] = bool(value & 1)
                value >>= 1

        fill(6, 17, prime_num_bits)  # b6..b17: field size
        fill(18, 29, state_len)  # b18..b29: t
        fill(30, 39, full_rounds)  # b30..b39: R_F
        fill(40, 49, partial_rounds)  # b40..b49: R_P
        for i in range(50, 80):
            state[i] = True

        self.state = state
        self.head = 0
        for _ in range(160):
            self._update()

    def _update(self) -> bool:
        s, h = self.state, self.head
        new_bit = (
            s[(h + 62) % 80]
            ^ s[(h + 51) % 80]
            ^ s[(h + 38) % 80]
            ^ s[(h + 23) % 80]
            ^ s[(h + 13) % 80]
            ^ s[h]
        )
        s[h] = new_bit
        self.head = (h + 1) % 80
        return new_bit

    def get_bits(self, num_bits: int) -> list[bool]:
        """Shrinking generator: only emit the second of a bit pair when the
        first bit of the pair is 1."""
        res = []
        for _ in range(num_bits):
            first = self._update()
            while not first:
                self._update()  # discard the second bit of the pair
                first = self._update()
            res.append(self._update())
        return res

    def _next_int(self) -> int:
        bits = self.get_bits(self.prime_num_bits)
        value = 0
        for b in bits:  # MSB first
            value = (value << 1) | int(b)
        return value

    def field_elements_rejection_sampling(self, p: int, num: int) -> list[int]:
        res = []
        while len(res) < num:
            candidate = self._next_int()
            if candidate < p:
                res.append(candidate)
        return res

    def field_elements_mod_p(self, p: int, num: int) -> list[int]:
        return [self._next_int() % p for _ in range(num)]


@lru_cache(maxsize=None)
def generate_ark_and_mds(
    p: int,
    prime_num_bits: int,
    t: int,
    full_rounds: int,
    partial_rounds: int,
    skip_matrices: int = 0,
    transpose_mds: bool = False,
):
    """Round constants (R x t) and the effective MDS matrix (t x t).

    The returned `mds` is oriented so that the permutation computes
    ``new_state[i] = sum_j mds[i][j] * state[j]``. arkworks applies the Cauchy
    matrix directly; circomlib's Mix template computes ``sum_j M[j][i]*s[j]``,
    i.e. the transpose — set `transpose_mds=True` for circomlib semantics.
    """
    lfsr = GrainLFSR(prime_num_bits, t, full_rounds, partial_rounds)
    rounds = full_rounds + partial_rounds
    ark = [lfsr.field_elements_rejection_sampling(p, t) for _ in range(rounds)]
    for _ in range(skip_matrices):
        lfsr.field_elements_mod_p(p, 2 * t)
    xs = lfsr.field_elements_mod_p(p, t)
    ys = lfsr.field_elements_mod_p(p, t)
    mds = [[pow(xs[i] + ys[j], p - 2, p) for j in range(t)] for i in range(t)]
    if transpose_mds:
        mds = [[mds[j][i] for j in range(t)] for i in range(t)]
    return ark, mds
