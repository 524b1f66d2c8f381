"""Fused elementwise field kernels over arbitrary (..., 16) limb arrays.

The XLA limb path (fields/limbs.py) runs every field op as dozens of
unfused (..., 16/33)-column HBM round trips, at 16/128 lane utilization
(the minor dim is the 16-limb axis). Measured on-chip: from_mont over a
(64, 148k, 16) witness block costs 15 s — ~100x its roofline. These
kernels transpose operands to limb-major (16, L) once (an efficient XLA
transpose pass), run the whole dataflow in VMEM via the PallasField bodies
(fields/pallas_field.py), and transpose back: 2 passes per operand instead
of dozens.

Exposed ops are the fold-path hot spots:
  from_mont(x)                Montgomery -> standard form
  mul(a, b), add(a, b)        basic binary ops
  fold_z(a, b, r)             a + b*r       (Nova Z fold)
  fold_e(a, t, b, r, r2)      a + t*r + b*r2 (Nova E fold)
  cross_combine(...)          a1*b2 + a2*b1 - u1*c2 - u2*c1 (cross term)

Broadcast scalars (fold challenges r, relaxation u) are expanded to full
lane width by the caller with jnp.broadcast_to — 2 extra memory passes,
still ~10x less traffic than one XLA limb mul.

Runs in interpret mode on CPU (same hook as pallas_field) so the CPU test
suite differentially tests every body against fields/limbs.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimz_tpu.fields.limbs import LimbField, int_to_limbs
from vimz_tpu.fields.pallas_field import (
    _CONST_ROWS,
    _ROW_NP,
    _ROW_P,
    _ROW_P17,
    _ROW_SUB,
    LANES,
    PallasField,
    _interpret,
)


def _to_lm(x):
    """(..., 16) -> (16, L) limb-major."""
    return jnp.swapaxes(x.reshape(-1, 16), 0, 1)


def _from_lm(y, shape):
    return jnp.swapaxes(y, 0, 1).reshape(shape)


class PallasEw:
    """Elementwise field ops on (..., 16) arrays via limb-major kernels."""

    def __init__(self, field: LimbField):
        self.f = field
        consts = np.zeros((_CONST_ROWS, 1), dtype=np.uint32)
        consts[_ROW_P : _ROW_P + 16, 0] = field.p_limbs
        consts[_ROW_P17 : _ROW_P17 + 17, 0] = field.p_limbs17
        consts[_ROW_NP : _ROW_NP + 16, 0] = field.np_limbs
        for k in range(4):
            consts[_ROW_SUB + 18 * k : _ROW_SUB + 18 * (k + 1), 0] = int_to_limbs(
                field.p * (1 << k), 18
            )
        self.consts = jnp.asarray(np.repeat(consts, LANES, axis=1))

    def _grid_call(self, body, ins, N: int):
        L = min(LANES, max(128, 1 << max(0, (N - 1).bit_length())))
        pad = (-N) % L
        if pad:
            ins = [
                jnp.concatenate([x, jnp.zeros((16, pad), jnp.uint32)], axis=1)
                for x in ins
            ]
        Np = N + pad
        spec = pl.BlockSpec((16, L), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec(
            (_CONST_ROWS, L), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            body,
            grid=(Np // L,),
            in_specs=[cspec] + [spec] * len(ins),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((16, Np), jnp.uint32),
            interpret=_interpret(),
        )(self.consts, *ins)
        return out[:, :N] if pad else out

    def _ew(self, fn, *arrays):
        """Run fn(F, *limb_major_blocks) elementwise over (..., 16) arrays."""
        shape = arrays[0].shape
        ins = [_to_lm(jnp.broadcast_to(a, shape)) for a in arrays]
        N = ins[0].shape[1]

        def body(consts, *refs):
            blocks = refs[: len(ins)]
            out = refs[len(ins)]
            F = PallasField(consts[:])
            out[:] = fn(F, *[b[:] for b in blocks])

        return _from_lm(self._grid_call(body, list(ins), N), shape)

    @partial(jax.jit, static_argnums=0)
    def from_mont(self, x):
        return self._ew(lambda F, a: F.from_mont(a), x)

    @partial(jax.jit, static_argnums=0)
    def mul(self, a, b):
        return self._ew(lambda F, x, y: F.mul(x, y), a, b)

    @partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        return self._ew(lambda F, x, y: F.add(x, y), a, b)

    @partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        return self._ew(lambda F, x, y: F.sub(x, y), a, b)

    @partial(jax.jit, static_argnums=0)
    def fold_z(self, a, b, r):
        """a + b*r; r broadcastable to a's shape (e.g. (B, 1, 16))."""
        return self._ew(lambda F, x, y, rr: F.add(x, F.mul(y, rr)), a, b, r)

    @partial(jax.jit, static_argnums=0)
    def fold_e(self, a, t, b, r, r2):
        """a + t*r + b*r2."""
        return self._ew(
            lambda F, x, tt, y, rr, rr2: F.add(
                x, F.add(F.mul(tt, rr), F.mul(y, rr2))
            ),
            a, t, b, r, r2,
        )

    @partial(jax.jit, static_argnums=0)
    def mul_r(self, t, r):
        """t * r (level-0 E fold)."""
        return self._ew(lambda F, tt, rr: F.mul(tt, rr), t, r)

    @partial(jax.jit, static_argnums=0)
    def cross_combine(self, a1, b2, a2, b1, c1, c2, u1, u2):
        """a1*b2 + a2*b1 - u1*c2 - u2*c1 (the Nova cross-term combine);
        u1/u2 broadcastable (per-instance relaxation scalars)."""
        return self._ew(
            lambda F, x1, y2, x2, y1, cc1, cc2, uu1, uu2: F.sub(
                F.sub(
                    F.add(F.mul(x1, y2), F.mul(x2, y1)), F.mul(uu1, cc2)
                ),
                F.mul(uu2, cc1),
            ),
            a1, b2, a2, b1, c1, c2, u1, u2,
        )


_EW: dict[int, PallasEw] = {}


def pallas_ew(field: LimbField) -> PallasEw:
    if field.p not in _EW:
        _EW[field.p] = PallasEw(field)
    return _EW[field.p]


def maybe_ew(field: LimbField) -> PallasEw | None:
    """The production gate: Pallas elementwise engine on TPU, None on CPU
    (the XLA limb path is compile-cheaper there and the CPU suite pins tiny
    shapes). VIMZ_PALLAS_EW=1 forces it on CPU (interpret-mode tests);
    VIMZ_PALLAS_EW=0 forces it off everywhere."""
    import os

    env = os.environ.get("VIMZ_PALLAS_EW")
    if env == "0":
        return None
    if jax.default_backend() == "cpu" and env not in ("1",):
        return None
    return pallas_ew(field)
