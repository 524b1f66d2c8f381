"""Python-int reference implementation of the BN254 prime fields.

This is the ground-truth oracle for the vectorized limb kernels in
`vimz_tpu.fields.limbs` and is used for one-off constant generation (Poseidon
round constants / MDS matrices, Pedersen generator derivation), where speed is
irrelevant and clarity matters.

Field moduli match the reference prover's curve cycle
(reference: vimz/src/sonobe_backend/folding.rs:22 uses bn254/grumpkin):

- FR: the BN254 scalar field (= Grumpkin base field). All circuit values,
  image hashes and IVC state live here.
- FQ: the BN254 base field (= Grumpkin scalar field). Coordinates of BN254 G1
  points (Pedersen commitments) live here.
"""

from __future__ import annotations

# BN254 scalar field modulus (ark_bn254::Fr).
P_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
# BN254 base field modulus (ark_bn254::Fq, = ark_grumpkin scalar field).
P_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583


class PrimeField:
    """A prime field GF(p) over Python ints."""

    def __init__(self, p: int, name: str = "F"):
        self.p = p
        self.name = name
        self.bits = p.bit_length()

    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def inv(self, a: int) -> int:
        if a % self.p == 0:
            raise ZeroDivisionError(f"inverse of 0 in {self.name}")
        return pow(a, self.p - 2, self.p)

    def sqrt(self, a: int) -> int | None:
        """Square root for p = 3 (mod 4); returns None if `a` is a non-residue."""
        assert self.p % 4 == 3
        r = pow(a, (self.p + 1) // 4, self.p)
        return r if r * r % self.p == a % self.p else None

    def from_le_bytes_mod_order(self, data: bytes) -> int:
        return int.from_bytes(data, "little") % self.p

    def __repr__(self) -> str:
        return f"PrimeField({self.name}, {self.bits} bits)"


FR = PrimeField(P_FR, "Fr")
FQ = PrimeField(P_FQ, "Fq")
