"""Tape-recording R1CS constraint builder (structure only, no values).

The builder plays the role of arkworks' ConstraintSystem in the reference
(vimz/src/sonobe_backend/circuits/arkworks/), but is redesigned TPU-first:
constraint *structure* and witness *values* are fully separated. Building a
circuit records

- the A/B/C constraint rows (linear combinations over wire indices), and
- a **witness tape**: a straight-line program of elementary ops
  (MUL / BITS / ISZERO over linear combinations of earlier wires)

so that witness generation for *all fold steps at once* runs as batched
Montgomery-limb kernels on device (see r1cs/witness.py) — this replaces the
reference's per-step WASM witness-generator processes
(vimz/src/nova_snark_backend/folding.rs:28-43) and is where the TPU design
gets its batch parallelism.

Conventions:

- wire 0 is the constant 1 (the `u` slot of the relaxed R1CS Z-vector).
- input wires (public state IO first, then private external inputs) come
  immediately after; their values are supplied at witness-generation time.
- linear constraints are free in *wires* (folded into LCs); only
  multiplications / decompositions allocate wires, exactly like R1CS
  synthesis in arkworks/circom.
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

    def add_const(self, c: int) -> "LC":
        return self + LC.const(c)

    def is_zero(self) -> bool:
        return not self.terms

    def single_wire(self) -> int | None:
        """Wire index if this LC is exactly 1*wire, else None."""
        if len(self.terms) == 1:
            (k, v), = self.terms.items()
            if v == 1:
                return k
        return None


@dataclass
class Op:
    """One witness-tape entry. Allocates `n_out` wires starting at `out`."""

    kind: str  # "mul" | "bits" | "iszero" | "perm"
    out: int
    n_out: int
    lcs: tuple  # mul: (a, b); bits/iszero: (x,); perm: the t state LCs
    meta: int = 0  # bits: bit count; perm: circomlib n_inputs (t - 1)
    depth: int = 0


@dataclass
class R1CS:
    """Finalized constraint structure + witness tape + input values.

    The witness matrix is computed on demand: on device in Montgomery limb
    form (`w_mont`, the prover hot path — see r1cs/witness.py) or as host
    Python ints (`witness`, for small tests).
    """

    n_pub: int
    n_inputs: int  # publics + private external inputs (wires 1..n_inputs)
    n_wires: int
    a_rows: list  # list of dict[int, int]
    b_rows: list
    c_rows: list
    tape: list  # list of Op
    inputs: np.ndarray  # (S, n_inputs) object ints; columns map to wires 1..
    _w_mont: object = None  # cached device witness (S, n_wires, 16) Montgomery
    _witness_host: object = None

    @property
    def n_constraints(self) -> int:
        return len(self.a_rows)

    @property
    def S(self) -> int:
        return self.inputs.shape[0]

    def w_mont(self):
        """(S, n_wires + 1, 16) uint32 Montgomery witness matrix on device.

        The final column is the tape executor's scratch slot (never read);
        kept to avoid copying the multi-GB buffer — index wires < n_wires.
        """
        if self._w_mont is None:
            from vimz_tpu.r1cs.witness import execute_tape

            self._w_mont = execute_tape(self)
        return self._w_mont

    @property
    def witness(self) -> np.ndarray:
        """(S, n_wires) object-int full Z rows (u=1) — host materialization."""
        if self._witness_host is None:
            from vimz_tpu.fields.limbs import FR_LIMBS

            self._witness_host = FR_LIMBS.from_limbs_mont(
                np.asarray(self.w_mont())
            )[:, : self.n_wires]
        return self._witness_host

    @witness.setter
    def witness(self, value):
        self._witness_host = value

    def public_inputs(self) -> np.ndarray:
        return self.inputs[:, : self.n_pub]

    def check_satisfied(self, rows=None) -> bool:
        """Plain R1CS check (u=1, E=0): (A z) * (B z) == C z, per step.

        Host-side object-int evaluation — use on small instances only.
        """
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
    """Records constraint structure and the witness tape (no values)."""

    def __init__(self):
        self.n_wires = 1  # wire 0 = constant 1
        self.n_pub = 0
        self.n_inputs = 0
        self._inputs_done = False
        self.a_rows: list[dict] = []
        self.b_rows: list[dict] = []
        self.c_rows: list[dict] = []
        self.tape: list[Op] = []
        self._depth: list[int] = [0]  # per wire

    # -- inputs -----------------------------------------------------------

    def alloc_input(self, public: bool = False) -> LC:
        """Allocate an input wire whose value is supplied at witness time.

        All public inputs must be allocated before any private input; all
        inputs before any tape op.
        """
        assert not self._inputs_done, "inputs must be allocated before tape ops"
        if public:
            assert self.n_inputs == self.n_pub, "publics must come first"
            self.n_pub += 1
        idx = self.n_wires
        self.n_wires += 1
        self.n_inputs += 1
        self._depth.append(0)
        return LC({idx: 1})

    # -- tape ops -----------------------------------------------------------

    def _lc_depth(self, lc: LC) -> int:
        return max((self._depth[k] for k in lc.terms), default=0)

    def _alloc_wires(self, n: int, depth: int) -> int:
        self._inputs_done = True
        base = self.n_wires
        self.n_wires += n
        self._depth.extend([depth] * n)
        return base

    def op_mul(self, a: LC, b: LC) -> LC:
        """Witness wire w = a * b with constraint a * b = w."""
        depth = 1 + max(self._lc_depth(a), self._lc_depth(b))
        w = self._alloc_wires(1, depth)
        self.tape.append(Op("mul", w, 1, (a, b), depth=depth))
        wl = LC({w: 1})
        self.enforce(a, b, wl)
        return wl

    def op_bits(self, x: LC, n: int) -> list[LC]:
        """n boolean wires with sum(2^i b_i) = x. x's value must fit n bits."""
        depth = 1 + self._lc_depth(x)
        base = self._alloc_wires(n, depth)
        self.tape.append(Op("bits", base, n, (x,), meta=n, depth=depth))
        bits = [LC({base + i: 1}) for i in range(n)]
        for b in bits:
            self.enforce(b, b - LC.const(1), LC())
        recomposed = LC({base + i: (1 << i) % P for i in range(n)})
        self.enforce_equal(recomposed, x)
        return bits

    def op_perm(self, state: list[LC], n_inputs: int, n_out: int) -> int:
        """One whole Poseidon permutation as a single tape op.

        Allocates `n_out` wires (the x2/x4/x5 sbox intermediates of every
        round, in round-major order) and records one op; the caller (the
        Poseidon gadget) emits the matching constraints. Collapsing the
        ~200-deep sbox mul chain of a permutation into one op is what keeps
        the batched executor's stage count (== kernel launches) at
        O(hash-chain length) instead of O(rounds x chain length).
        """
        depth = 1 + max(self._lc_depth(s) for s in state)
        base = self._alloc_wires(n_out, depth)
        self.tape.append(
            Op("perm", base, n_out, tuple(state), meta=n_inputs, depth=depth)
        )
        return base

    def op_iszero(self, x: LC) -> LC:
        """Boolean wire z = (x == 0); allocates helper wire inv = x^{-1} or 0."""
        depth = 1 + self._lc_depth(x)
        base = self._alloc_wires(2, depth)  # [inv, z]
        self.tape.append(Op("iszero", base, 2, (x,), depth=depth))
        inv, z = LC({base: 1}), LC({base + 1: 1})
        self.enforce(x, inv, LC.const(1) - z)  # x*inv = 1 - z
        self.enforce(x, z, LC())  # x*z = 0
        return z

    # -- constraints ------------------------------------------------------

    def enforce(self, a: LC, b: LC, c: LC):
        self.a_rows.append(dict(a.terms))
        self.b_rows.append(dict(b.terms))
        self.c_rows.append(dict(c.terms))

    def enforce_zero(self, lc: LC):
        self.enforce(lc, LC.const(1), LC())

    def enforce_equal(self, a: LC, b: LC):
        self.enforce_zero(a - b)

    # -- finalize -----------------------------------------------------------

    def finalize(self, inputs: np.ndarray) -> R1CS:
        """Freeze structure; `inputs` is (S, n_inputs) object ints (publics
        first), giving the values of wires 1..n_inputs for every fold step."""
        inputs = np.asarray(inputs, dtype=object) % P
        assert inputs.ndim == 2 and inputs.shape[1] == self.n_inputs, (
            inputs.shape,
            self.n_inputs,
        )
        return R1CS(
            n_pub=self.n_pub,
            n_inputs=self.n_inputs,
            n_wires=self.n_wires,
            a_rows=self.a_rows,
            b_rows=self.b_rows,
            c_rows=self.c_rows,
            tape=self.tape,
            inputs=inputs,
        )
