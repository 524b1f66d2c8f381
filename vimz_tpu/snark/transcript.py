"""Fiat–Shamir transcript for the compression SNARK (Poseidon sponge chain).

Same hash as the folding transcript (circomlib Poseidon-2 chaining over Fr,
vimz_tpu/folding/transcript.py) with its own domain separators. All absorbed
values are Fr scalars; curve points are absorbed as four 128-bit halves (an
injective embedding of the two Fq coordinates into Fr).

The reference's compression stage delegates transcript management to
nova-snark's Spartan / sonobe's Groth16 decider (vimz/src/nova_snark_backend/
mod.rs:52-67, vimz/src/sonobe_backend/decider.rs:13-46); this framework
verifies its own proofs, so the only requirements are determinism and domain
separation.
"""

from __future__ import annotations

from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.poseidon.pyref import circom_poseidon

MASK128 = (1 << 128) - 1


class Transcript:
    """Sequential Poseidon-2 absorption chain with labeled challenges."""

    def __init__(self, domain: bytes):
        self._acc = int.from_bytes(domain, "little") % P

    def absorb(self, *values: int):
        for v in values:
            self._acc = circom_poseidon([self._acc, int(v) % P])

    def absorb_point(self, pt):
        if pt is None:
            self.absorb(0, 0, 0, 0)
        else:
            x, y = pt
            self.absorb(x & MASK128, x >> 128, y & MASK128, y >> 128)

    def challenge(self, label: bytes = b"") -> int:
        lab = int.from_bytes(label, "little") % P
        self._acc = circom_poseidon([self._acc, lab])
        return self._acc

    def challenges(self, n: int, label: bytes = b"") -> list[int]:
        return [self.challenge(label) for _ in range(n)]
