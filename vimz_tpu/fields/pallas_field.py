"""Pallas TPU kernels for the limb field + curve hot ops.

The XLA-built limb arithmetic (fields/limbs.py) materializes every
intermediate (..., 16/33)-column tensor to HBM: one EC add over a wide lane
batch moves ~100x its roofline traffic, which made the MSM's segmented
dedup scan ~2500x slower than memory-bound (79 s for 18 scan levels whose
fused cost is ~30 ms each). These kernels keep the whole RCB
addition/doubling dataflow in VMEM: one read of the 6 input coordinate
blocks, one write of 3 outputs.

Layout: LIMB-MAJOR (16, N) uint32 — the lane axis must be the minor
(128-wide) dimension for TPU tiling; the 16-limb axis rides the sublanes.
The MSM pipeline keeps points in this layout end to end and converts at its
boundary (see curves/pallas_msm.py).

Field constants (modulus limbs, Montgomery N', staged-subtraction
multiples, curve 3b) are packed into one (R, 1) uint32 tensor passed as a
kernel input — Pallas kernels may not close over array constants.

All math mirrors fields/limbs.py exactly (same radix-2^16 Montgomery
design), differentially tested against it in tests/test_pallas_field.py
(which runs these kernels in Pallas interpret mode on CPU via
VIMZ_PALLAS_INTERPRET=1, and natively when a TPU is present).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimz_tpu.fields.limbs import LimbField, int_to_limbs

NLIMB = 16
MASK = 0xFFFF  # Python int: jnp scalars become captured consts in kernels
LANES = 1024  # lane block per grid step: 16x1024 u32 = 64 KB per operand

def _interpret() -> bool:
    """Pallas interpret mode: run kernel bodies as traced JAX ops.

    Auto-on for the CPU backend (native Pallas TPU lowering is impossible
    there) — this is what lets the CPU test suite differentially test these
    kernels. VIMZ_PALLAS_INTERPRET=1/0 forces it either way."""
    env = os.environ.get("VIMZ_PALLAS_INTERPRET")
    if env is not None and env != "":
        return env != "0"
    return jax.default_backend() == "cpu"

# const tensor row offsets
_ROW_P = 0  # p limbs (16)
_ROW_P17 = 16  # p limbs, 17 wide
_ROW_NP = 33  # -p^-1 mod 2^256 (16)
_ROW_B3 = 49  # curve 3b in Montgomery form (16)
_ROW_SUB = 65  # staged-subtract multiples p*2^k, k=0..3, 18 limbs each
_CONST_ROWS = 65 + 4 * 18  # = 137


def _shift_up(x, d: int, rows: int):
    """Limb-axis shift toward higher indices by static d (zero-fill)."""
    if d == 0:
        return x
    pad = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[: rows - d]], axis=0)


def _carry_propagate(cols, out_len: int):
    """(n, L) u32 column sums -> (out_len, L) 16-bit limbs (Kogge-Stone)."""
    n = cols.shape[0]
    if out_len > n:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_len - n,) + cols.shape[1:], jnp.uint32)], axis=0
        )
    x = cols[:out_len]
    s = (x & MASK) + _shift_up(x >> 16, 1, out_len)
    s = (s & MASK) + _shift_up(s >> 16, 1, out_len)
    g = s >> 16
    r = s & MASK
    p = (r == MASK).astype(jnp.uint32)
    G, Pp = g, p
    d = 1
    while d < out_len:
        G = G | (Pp & _shift_up(G, d, out_len))
        Pp = Pp & _shift_up(Pp, d, out_len)
        d <<= 1
    return (r + _shift_up(G, 1, out_len)) & MASK


def _sub_with_borrow(a, b):
    n = a.shape[0]
    b = jnp.broadcast_to(b, a.shape)
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    G, Pp = g, p
    d = 1
    while d < n:
        G = G | (Pp & _shift_up(G, d, n))
        Pp = Pp & _shift_up(Pp, d, n)
        d <<= 1
    diff = (a - b - _shift_up(G, 1, n)) & MASK
    return diff, G[n - 1]


def _cond_sub(a, m):
    d, borrow = _sub_with_borrow(a, m)
    return jnp.where((borrow == 0)[None, :], d, a)


def _place(x, off: int, ncols: int):
    """Zero-pad (r, L) rows into a (ncols, L) band at row offset `off`
    (pure concatenation: scatter lowering inside kernels drags in consts)."""
    take = min(x.shape[0], ncols - off)
    if take <= 0:
        return None
    parts = []
    if off:
        parts.append(jnp.zeros((off,) + x.shape[1:], jnp.uint32))
    parts.append(x[:take])
    tail = ncols - off - take
    if tail:
        parts.append(jnp.zeros((tail,) + x.shape[1:], jnp.uint32))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _mul_columns(a, b, ncols: int):
    """Schoolbook column sums of (16, L) limb operands -> (ncols, L)."""
    cols = None
    for j in range(NLIMB):
        p = a * b[j][None, :]  # (16, L), exact in u32
        for part, off in ((p & MASK, j), (p >> 16, j + 1)):
            placed = _place(part, off, ncols)
            if placed is not None:
                cols = placed if cols is None else cols + placed
    return cols


class PallasField:
    """Field ops on (16, L) limb-major blocks, for use INSIDE kernels.

    `consts` is the in-kernel view of the packed constant tensor."""

    def __init__(self, consts):
        self.p_limbs = consts[_ROW_P : _ROW_P + 16]
        self.p_limbs17 = consts[_ROW_P17 : _ROW_P17 + 17]
        self.np_limbs = consts[_ROW_NP : _ROW_NP + 16]
        self.b3 = consts[_ROW_B3 : _ROW_B3 + 16]
        self._sub = [
            consts[_ROW_SUB + 18 * k : _ROW_SUB + 18 * (k + 1)] for k in range(4)
        ]

    def add(self, a, b):
        s = _carry_propagate(a + b, NLIMB + 1)
        return _cond_sub(s, self.p_limbs17)[:NLIMB]

    def sub(self, a, b):
        d, borrow = _sub_with_borrow(a, b)
        fixed = _carry_propagate(d + self.p_limbs, NLIMB)
        return jnp.where((borrow == 0)[None, :], d, fixed)

    def _redc(self, cols, nsub: int):
        T = _carry_propagate(cols, cols.shape[0] + 1)
        m = _carry_propagate(_mul_columns(T[:NLIMB], self.np_limbs, NLIMB), NLIMB)
        width = max(T.shape[0], 2 * NLIMB + 1)
        mN = _mul_columns(m, self.p_limbs, width)
        scols = mN + _place(T, 0, width)
        S = _carry_propagate(scols, 2 * NLIMB + 2)
        t = S[NLIMB:]  # (18, L)
        for k in reversed(range(nsub)):
            t = _cond_sub(t, self._sub[k])
        return t[:NLIMB]

    def mul(self, a, b):
        cols = _mul_columns(a, b, 2 * NLIMB)
        return self._redc(cols, nsub=1)

    def from_mont(self, a):
        """Montgomery -> standard form: REDC of a alone (a * 1)."""
        return self._redc(a, nsub=1)


# ----------------------------------------------------------------------
# EC kernels (RCB complete formulas, a = 0) on limb-major coordinates
# ----------------------------------------------------------------------


def _ec_add_body(F: PallasField, P, Q):
    b3 = F.b3
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = F.add(X1, Y1)
    t4 = F.add(X2, Y2)
    t3 = F.mul(t3, t4)
    t4 = F.add(t0, t1)
    t3 = F.sub(t3, t4)
    t4 = F.add(Y1, Z1)
    X3 = F.add(Y2, Z2)
    t4 = F.mul(t4, X3)
    X3 = F.add(t1, t2)
    t4 = F.sub(t4, X3)
    X3 = F.add(X1, Z1)
    Y3 = F.add(X2, Z2)
    X3 = F.mul(X3, Y3)
    Y3 = F.add(t0, t2)
    Y3 = F.sub(X3, Y3)
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = F.mul(b3, t2)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul(b3, Y3)
    X3 = F.mul(t4, Y3)
    t2 = F.mul(t3, t1)
    X3 = F.sub(t2, X3)
    Y3 = F.mul(Y3, t0)
    t1 = F.mul(t1, Z3)
    Y3 = F.add(t1, Y3)
    t0 = F.mul(t0, t3)
    Z3 = F.mul(Z3, t4)
    Z3 = F.add(Z3, t0)
    return X3, Y3, Z3


def _ec_double_body(F: PallasField, P):
    b3 = F.b3
    X, Y, Z = P
    t0 = F.mul(Y, Y)
    Z3 = F.add(t0, t0)
    Z3 = F.add(Z3, Z3)
    Z3 = F.add(Z3, Z3)
    t1 = F.mul(Y, Z)
    t2 = F.mul(Z, Z)
    t2 = F.mul(b3, t2)
    X3 = F.mul(t2, Z3)
    Y3 = F.add(t0, t2)
    Z3 = F.mul(t1, Z3)
    t1 = F.add(t2, t2)
    t2 = F.add(t1, t2)
    t0 = F.sub(t0, t2)
    Y3 = F.mul(t0, Y3)
    Y3 = F.add(X3, Y3)
    t1 = F.mul(X, Y)
    X3 = F.mul(t0, t1)
    X3 = F.add(X3, X3)
    return X3, Y3, Z3


class PallasCurve:
    """Batched EC ops over limb-major (16, N) Montgomery coordinates."""

    def __init__(self, field: LimbField, b: int):
        self.f = field
        consts = np.zeros((_CONST_ROWS, 1), dtype=np.uint32)
        # consts are materialized at FULL lane width: Mosaic cannot broadcast
        # a (r, 1) block along lanes inside a kernel (and scalar-row
        # extraction from VMEM is worse); ~550 KB of VMEM is cheap.
        consts[_ROW_P : _ROW_P + 16, 0] = field.p_limbs
        consts[_ROW_P17 : _ROW_P17 + 17, 0] = field.p_limbs17
        consts[_ROW_NP : _ROW_NP + 16, 0] = field.np_limbs
        consts[_ROW_B3 : _ROW_B3 + 16, 0] = np.asarray(
            field.to_limbs_mont(3 * b % field.p)
        )
        for k in range(4):
            consts[_ROW_SUB + 18 * k : _ROW_SUB + 18 * (k + 1), 0] = int_to_limbs(
                field.p * (1 << k), 18
            )
        self.consts = jnp.asarray(np.repeat(consts, LANES, axis=1))

    def _grid_call(self, body, ins, n_out: int, N: int):
        """Run `body(consts, *blocks)` over lane blocks of LANES columns."""
        L = min(LANES, max(128, 1 << max(0, (N - 1).bit_length())))
        pad = (-N) % L
        if pad:
            ins = [
                jnp.concatenate([x, jnp.zeros((16, pad), jnp.uint32)], axis=1)
                for x in ins
            ]
        Np = N + pad
        grid = (Np // L,)
        spec = pl.BlockSpec((16, L), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec(
            (_CONST_ROWS, L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[cspec] + [spec] * len(ins),
            out_specs=[spec] * n_out,
            out_shape=[jax.ShapeDtypeStruct((16, Np), jnp.uint32)] * n_out,
            interpret=_interpret(),
        )(self.consts, *ins)
        if pad:
            out = [o[:, :N] for o in out]
        return out

    @partial(jax.jit, static_argnums=0)
    def add(self, P, Q):
        def kernel(consts, x1, y1, z1, x2, y2, z2, ox, oy, oz):
            F = PallasField(consts[:])
            X3, Y3, Z3 = _ec_add_body(
                F, (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:])
            )
            ox[:] = X3
            oy[:] = Y3
            oz[:] = Z3

        N = P["x"].shape[1]
        x, y, z = self._grid_call(
            kernel, [P["x"], P["y"], P["z"], Q["x"], Q["y"], Q["z"]], 3, N
        )
        return {"x": x, "y": y, "z": z}

    @partial(jax.jit, static_argnums=0)
    def double(self, P):
        def kernel(consts, x1, y1, z1, ox, oy, oz):
            F = PallasField(consts[:])
            X3, Y3, Z3 = _ec_double_body(F, (x1[:], y1[:], z1[:]))
            ox[:] = X3
            oy[:] = Y3
            oz[:] = Z3

        N = P["x"].shape[1]
        x, y, z = self._grid_call(kernel, [P["x"], P["y"], P["z"]], 3, N)
        return {"x": x, "y": y, "z": z}

    def infinity(self, n: int) -> dict:
        one = np.asarray(self.f.to_limbs_mont(1)).reshape(16, 1)
        return {
            "x": jnp.zeros((16, n), jnp.uint32),
            "y": jnp.broadcast_to(jnp.asarray(one), (16, n)),
            "z": jnp.zeros((16, n), jnp.uint32),
        }

    # layout converters (boundary only)
    @staticmethod
    def to_limb_major(pts: dict) -> dict:
        return {k: jnp.swapaxes(v, -1, -2).reshape(16, -1) for k, v in pts.items()}

    @staticmethod
    def from_limb_major(pts: dict) -> dict:
        return {k: jnp.swapaxes(v.reshape(16, -1), 0, 1) for k, v in pts.items()}
