"""Fiat–Shamir transcript for the fold tree (Poseidon-based).

Challenges bind the full fold structure: each instance has a digest
(absorbing u, public IO, and both commitments), and each tree node's
challenge absorbs the two child digests plus the cross-term commitment.
Commitment coordinates live in Fq; they are absorbed as two 128-bit halves
each, which injectively embeds them into Fr.

This is this framework's own transcript design (the reference delegates to
sonobe's Poseidon transcript); proofs are verified by this framework's own
verifier, so the only requirements are determinism and domain separation.
"""

from __future__ import annotations

from vimz_tpu.fields.prime import P_FR
from vimz_tpu.poseidon.pyref import circom_poseidon

MASK128 = (1 << 128) - 1

DS_INSTANCE = int.from_bytes(b"vimz-tpu/instance/v1", "little")
DS_FOLD = int.from_bytes(b"vimz-tpu/fold/v1", "little")


def _chain(init: int, values) -> int:
    acc = init % P_FR
    for v in values:
        acc = circom_poseidon([acc, int(v) % P_FR])
    return acc


def point_parts(pt) -> list[int]:
    """Affine point (x, y) or None -> 4 Fr-embeddable values."""
    if pt is None:
        return [0, 0, 0, 0]
    x, y = pt
    return [x & MASK128, x >> 128, y & MASK128, y >> 128]


def instance_digest(u: int, x: list[int], comm_w, comm_e) -> int:
    return _chain(DS_INSTANCE, [u, *x, *point_parts(comm_w), *point_parts(comm_e)])


def fold_challenge(d_left: int, d_right: int, comm_t) -> int:
    return _chain(DS_FOLD, [d_left, d_right, *point_parts(comm_t)])
