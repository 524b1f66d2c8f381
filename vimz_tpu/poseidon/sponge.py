"""Batched Poseidon permutation and the hashing modes built on it.

All entry points operate on *batches* of field elements in Montgomery limb
form (shape ``(..., 16)`` per element, see `vimz_tpu.fields.limbs`): the TPU
executes one permutation round across the whole batch at once — this replaces
the reference's one-row-at-a-time hashing (vimz/src/image_hash.rs:40-48 and
the subprocess-per-row Python hasher pyvimz/pyvimz/image_hasher.py:89-111).

Hashing modes:

- `sponge_hash`: the arkworks PoseidonSponge CRH — absorb L elements in
  rate-sized chunks (adding into state[capacity..]), permute per chunk,
  final permute on squeeze, output state[capacity]. Matches
  ark-crypto-primitives' CRH::evaluate / TwoToOneCRH::evaluate semantics used
  by the reference's `hash_image_arkworks` (vimz/src/image_hash.rs:14-56).
- `circom_hash`: circomlib's fixed-arity Poseidon(n): initial state
  [0, in_0..in_{n-1}], one permutation, output state[0].
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vimz_tpu.fields.limbs import FR_LIMBS, LimbField
from vimz_tpu.poseidon.params import PoseidonParams


class BatchedPoseidon:
    """A Poseidon permutation, vectorized over arbitrary leading batch dims."""

    def __init__(self, params: PoseidonParams, field: LimbField = FR_LIMBS):
        assert params.p == field.p
        self.params = params
        self.f = field
        self.t = params.t
        # Montgomery-form constants.
        self.ark = np.asarray(
            [[field.to_limbs_mont(c) for c in row] for row in params.ark], dtype=np.uint32
        )  # (R, t, 16)
        self.mds = np.asarray(
            [[field.to_limbs_mont(c) for c in row] for row in params.mds], dtype=np.uint32
        )  # (t, t, 16)

    # -- permutation ----------------------------------------------------

    def _mix(self, state):
        # new[i] = sum_j mds[i][j] * state[j]; one lazy-reduced mul_acc.
        a = jnp.asarray(self.mds)  # (t, t, 16)
        b = state[..., None, :, :]  # (..., 1, t, 16)
        return self.f.mul_acc(a, b)

    def _sbox_full(self, state):
        x2 = self.f.mul(state, state)
        x4 = self.f.mul(x2, x2)
        return self.f.mul(x4, state)

    def _rounds(self, state, lo: int, hi: int, full: bool):
        ark = jnp.asarray(self.ark)

        def body(r, st):
            st = self.f.add(st, ark[r])
            if full:
                st = self._sbox_full(st)
            else:
                head = self._sbox_full(st[..., 0:1, :])
                st = jnp.concatenate([head, st[..., 1:, :]], axis=-2)
            return self._mix(st)

        return lax.fori_loop(lo, hi, body, state)

    @partial(jax.jit, static_argnums=0)
    def permute(self, state):
        """state: (..., t, 16) Montgomery limbs -> same shape."""
        p = self.params
        half = p.full_rounds // 2
        state = self._rounds(state, 0, half, full=True)
        state = self._rounds(state, half, half + p.partial_rounds, full=False)
        state = self._rounds(state, half + p.partial_rounds, p.rounds, full=True)
        return state

    # -- arkworks sponge CRH --------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def sponge_hash(self, inputs):
        """arkworks CRH::evaluate over (..., L, 16) Montgomery inputs -> (..., 16).

        Absorbs L elements (L static), squeezes one. Full-rate chunks run
        through a lax.scan (one traced permutation), matching the arkworks
        sponge schedule: permute after every full chunk except possibly the
        last, plus the squeeze permutation — i.e. `(add chunk, permute)` per
        full chunk, then `(add tail, permute)` if a partial chunk remains.
        """
        L = inputs.shape[-2]
        rate, cap = self.params.rate, self.params.capacity
        batch_shape = inputs.shape[:-2]
        state = jnp.zeros(batch_shape + (self.t, 16), dtype=jnp.uint32)

        k, tail = divmod(L, rate)
        if k:
            chunks = inputs[..., : k * rate, :].reshape(
                batch_shape + (k, rate, 16)
            )
            chunks = jnp.moveaxis(chunks, -3, 0)  # (k, ..., rate, 16)

            def body(st, chunk):
                st = st.at[..., cap : cap + rate, :].set(
                    self.f.add(st[..., cap : cap + rate, :], chunk)
                )
                return self.permute(st), None

            state, _ = lax.scan(body, state, chunks)
        if tail or k == 0:
            chunk = inputs[..., k * rate :, :]
            state = state.at[..., cap : cap + tail, :].set(
                self.f.add(state[..., cap : cap + tail, :], chunk)
            )
            state = self.permute(state)
        return state[..., cap, :]

    @partial(jax.jit, static_argnums=0)
    def two_to_one(self, left, right):
        """arkworks TwoToOneCRH::evaluate — absorb [left, right], squeeze one."""
        return self.sponge_hash(jnp.stack([left, right], axis=-2))

    # -- circomlib fixed-arity hash -------------------------------------

    @partial(jax.jit, static_argnums=0)
    def circom_hash(self, inputs):
        """circomlib Poseidon(n): (..., n, 16) Montgomery inputs -> (..., 16)."""
        n = inputs.shape[-2]
        assert n == self.t - 1
        batch_shape = inputs.shape[:-2]
        zero = jnp.zeros(batch_shape + (1, 16), dtype=jnp.uint32)
        state = jnp.concatenate([zero, inputs], axis=-2)
        return self.permute(state)[..., 0, :]
