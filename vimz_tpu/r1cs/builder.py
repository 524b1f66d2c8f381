"""Batched R1CS constraint builder.

The builder plays the role of arkworks' ConstraintSystem + witness assignment
in the reference (vimz/src/sonobe_backend/circuits/arkworks/), but is
*batched*: every wire carries a vector of values — one per fold step — so one
build pass produces the constraint matrices (shared by all steps) AND the
witness matrix for every step of the image at once. This replaces the
reference's per-step WASM witness-generator runs / per-step constraint
synthesis.

Conventions:

- wire 0 is the constant 1 (the `u` slot of the relaxed R1CS Z-vector).
- public wires come next (after `finalize()` permutes them there), then
  private witness wires. Z = [u, x, w].
- A linear combination (LC) maps wire index -> coefficient; linear
  constraints are free (folded into LCs), only multiplications allocate
  constraints, exactly like R1CS synthesis in arkworks/circom.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from vimz_tpu.fields.prime import P_FR

P = P_FR


class LC:
    """Linear combination over wires: sum(coeff * wire)."""

    __slots__ = ("terms",)

    def __init__(self, terms: dict[int, int] | None = None):
        self.terms = terms or {}

    @classmethod
    def const(cls, c: int) -> "LC":
        c %= P
        return cls({0: c} if c else {})

    def __add__(self, other) -> "LC":
        if isinstance(other, int):
            other = LC.const(other)
        out = dict(self.terms)
        for k, v in other.terms.items():
            nv = (out.get(k, 0) + v) % P
            if nv:
                out[k] = nv
            elif k in out:
                del out[k]
        return LC(out)

    def __sub__(self, other) -> "LC":
        if isinstance(other, int):
            other = LC.const(other)
        return self + other.scale(P - 1)

    def __radd__(self, other):
        return self + other

    def scale(self, c: int) -> "LC":
        c %= P
        if c == 0:
            return LC()
        return LC({k: (v * c) % P for k, v in self.terms.items()})

    def is_zero(self) -> bool:
        return not self.terms


@dataclass
class R1CS:
    """Finalized constraint system + batched assignments."""

    n_pub: int
    n_wires: int  # total including constant wire 0 and publics
    a_rows: list  # list of dict[int, int]
    b_rows: list
    c_rows: list
    witness: np.ndarray  # (S, n_wires) object ints, full Z rows with u=1
    perm_note: str = ""

    @property
    def n_constraints(self) -> int:
        return len(self.a_rows)

    def public_inputs(self) -> np.ndarray:
        return self.witness[:, 1 : 1 + self.n_pub]

    def private_witness(self) -> np.ndarray:
        return self.witness[:, 1 + self.n_pub :]

    def check_satisfied(self, rows=None) -> bool:
        """Plain R1CS check (u=1, E=0): (A z) * (B z) == C z, per step."""
        z = self.witness if rows is None else self.witness[rows]

        def matvec(rows_):
            out = np.zeros((z.shape[0], len(rows_)), dtype=object)
            for i, row in enumerate(rows_):
                acc = np.zeros(z.shape[0], dtype=object)
                for col, coeff in row.items():
                    acc = acc + z[:, col] * coeff
                out[:, i] = acc % P
            return out

        az = matvec(self.a_rows)
        bz = matvec(self.b_rows)
        cz = matvec(self.c_rows)
        return bool(np.all((az * bz - cz) % P == 0))

    def max_lc_terms(self) -> int:
        return max(
            (len(r) for rows in (self.a_rows, self.b_rows, self.c_rows) for r in rows),
            default=0,
        )


class Builder:
    def __init__(self, batch_size: int):
        self.S = batch_size
        self.values: list[np.ndarray] = [np.ones(batch_size, dtype=object)]
        self.public_flags: list[bool] = [False]
        self.a_rows: list[dict] = []
        self.b_rows: list[dict] = []
        self.c_rows: list[dict] = []

    # -- allocation -----------------------------------------------------

    def _coerce(self, values) -> np.ndarray:
        arr = np.asarray(values, dtype=object)
        if arr.shape == ():
            arr = np.full(self.S, int(arr[()]) % P, dtype=object)
        assert arr.shape == (self.S,), f"bad value shape {arr.shape}"
        return arr % P

    def alloc(self, values, public: bool = False) -> LC:
        idx = len(self.values)
        self.values.append(self._coerce(values))
        self.public_flags.append(public)
        return LC({idx: 1})

    def alloc_public(self, values) -> LC:
        return self.alloc(values, public=True)

    # -- evaluation -----------------------------------------------------

    def eval(self, lc: LC) -> np.ndarray:
        acc = np.zeros(self.S, dtype=object)
        for k, v in lc.terms.items():
            acc = acc + self.values[k] * v
        return acc % P

    # -- constraints ----------------------------------------------------

    def enforce(self, a: LC, b: LC, c: LC):
        self.a_rows.append(dict(a.terms))
        self.b_rows.append(dict(b.terms))
        self.c_rows.append(dict(c.terms))

    def enforce_zero(self, lc: LC):
        self.enforce(lc, LC.const(1), LC())

    def enforce_equal(self, a: LC, b: LC):
        self.enforce_zero(a - b)

    def mul(self, a: LC, b: LC) -> LC:
        """Witness wire w = a * b with constraint a * b = w."""
        prod = (self.eval(a) * self.eval(b)) % P
        w = self.alloc(prod)
        self.enforce(a, b, w)
        return w

    # -- finalize -------------------------------------------------------

    def finalize(self) -> R1CS:
        """Permute wires to [const, publics..., witness...] and freeze."""
        n = len(self.values)
        pub_idx = [i for i in range(1, n) if self.public_flags[i]]
        wit_idx = [i for i in range(1, n) if not self.public_flags[i]]
        old_to_new = {0: 0}
        for new, old in enumerate(pub_idx, start=1):
            old_to_new[old] = new
        for new, old in enumerate(wit_idx, start=1 + len(pub_idx)):
            old_to_new[old] = new

        def remap(rows):
            return [
                {old_to_new[k]: v for k, v in row.items()} for row in rows
            ]

        witness = np.zeros((self.S, n), dtype=object)
        for old in range(n):
            witness[:, old_to_new[old]] = self.values[old]

        return R1CS(
            n_pub=len(pub_idx),
            n_wires=n,
            a_rows=remap(self.a_rows),
            b_rows=remap(self.b_rows),
            c_rows=remap(self.c_rows),
            witness=witness,
        )
