"""Device-resident relaxed R1CS: ELL matrices, matvecs, cross terms.

The reference's folding backends evaluate constraint matrices through
nova-snark / sonobe sparse structures one step at a time
(vimz/src/sonobe_backend/folding.rs:52-65). Here the matrices live on device
in padded ELL form (gather indices + Montgomery coefficients) so that
A/B/C matvecs — the core of Nova cross-term computation — run as batched
gather + lazy-reduced mul_acc over many fold pairs at once.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vimz_tpu.fields.limbs import FR_LIMBS
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.r1cs.builder import R1CS


class DeviceR1CS:
    """ELL-packed A, B, C matrices of a step circuit, on device."""

    def __init__(self, r1cs: R1CS):
        self.n_pub = r1cs.n_pub
        self.n_wires = r1cs.n_wires
        self.n_constraints = r1cs.n_constraints
        self.f = FR_LIMBS
        self.mats = {
            name: self._pack(rows)
            for name, rows in (("A", r1cs.a_rows), ("B", r1cs.b_rows), ("C", r1cs.c_rows))
        }

    def _pack(self, rows: list[dict]):
        K = max((len(r) for r in rows), default=1) or 1
        n = len(rows)
        idx = np.zeros((n, K), dtype=np.int32)
        coeff = np.zeros((n, K), dtype=object)
        for i, row in enumerate(rows):
            for j, (col, c) in enumerate(row.items()):
                idx[i, j] = col
                coeff[i, j] = c
        # padding entries: index 0 with coefficient 0 (contributes nothing)
        coeff_limbs = self.f.to_limbs_mont(coeff)
        return jnp.asarray(idx), jnp.asarray(coeff_limbs), K

    @partial(jax.jit, static_argnums=(0, 2))
    def matvec(self, z_mont, name: str):
        """z: (..., n_wires, 16) Montgomery -> (..., n_constraints, 16)."""
        idx, coeff, _ = self.mats[name]
        gathered = z_mont[..., idx, :]  # (..., n, K, 16)
        return self.f.mul_acc(coeff, gathered)

    @partial(jax.jit, static_argnums=0)
    def residual(self, z_mont, u_mont, e_mont):
        """Az*Bz - u*Cz - E (zero iff the relaxed instance is satisfied)."""
        f = self.f
        az = self.matvec(z_mont, "A")
        bz = self.matvec(z_mont, "B")
        cz = self.matvec(z_mont, "C")
        lhs = f.mul(az, bz)
        rhs = f.add(f.mul(u_mont[..., None, :], cz), e_mont)
        return f.sub(lhs, rhs)

    @partial(jax.jit, static_argnums=0)
    def cross_term(self, z1, u1, z2, u2):
        """Nova cross term:
        T = Az1*Bz2 + Az2*Bz1 - u1*Cz2 - u2*Cz1, shapes (..., n_constraints, 16).
        """
        f = self.f
        az1, bz1, cz1 = (self.matvec(z1, m) for m in "ABC")
        az2, bz2, cz2 = (self.matvec(z2, m) for m in "ABC")
        t = f.add(f.mul(az1, bz2), f.mul(az2, bz1))
        t = f.sub(t, f.mul(u1[..., None, :], cz2))
        t = f.sub(t, f.mul(u2[..., None, :], cz1))
        return t
