"""Tree-parallel Nova-style folding prover and verifier.

The reference folds its per-row instances strictly sequentially
(sonobe `prove_step` in a loop, vimz/src/sonobe_backend/folding.rs:52-65),
which serializes one large MSM per row. This framework restructures the IVC
TPU-first:

- every step is an independent committed relaxed-R1CS instance whose public
  IO is the state transition x_i = (z_i, z_{i+1}) — chaining is checked on
  the public IO, so folding order is free;
- all leaf witness commitments are computed up front (batched MSMs);
- instances are folded pairwise in a binary tree: each level computes all
  cross terms with one batched matvec call and all cross-term commitments
  with batched MSMs, so the serial depth is log2(steps) instead of steps.

Soundness rests on the standard Nova folding lemma applied at every tree
node, with Fiat–Shamir challenges binding the node's children and cross-term
commitment (see folding/transcript.py). The final proof contains the folded
witness in the clear (no zero-knowledge / no compression SNARK yet — the
succinctness stage is tracked as future work; the reference's acceptance
gate at this stage is IVC-verify + final-state check, which this matches).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from vimz_tpu.curves import BatchedCurve, bn254_batched
from vimz_tpu.fields.limbs import FR_LIMBS
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.folding.transcript import fold_challenge, instance_digest
from vimz_tpu.r1cs.builder import R1CS


def _stack_points(points: list[dict]) -> dict:
    return {k: jnp.stack([p[k] for p in points]) for k in points[0]}


def _index_points(pts: dict, sl) -> dict:
    return {k: v[sl] for k, v in pts.items()}


@dataclass
class FoldProof:
    state_len: int
    steps: int
    x_rows: np.ndarray  # (S, 2*state_len) object ints
    leaf_comm_w: list  # S affine points / None
    node_comm_t: list  # per level: list of affine comm_T
    u_final: int
    w_final: np.ndarray  # (n_wit,) object ints
    e_final: np.ndarray  # (n_constraints,) object ints

    def size_bytes(self) -> int:
        pts = len(self.leaf_comm_w) + sum(len(l) for l in self.node_comm_t)
        return pts * 64 + (len(self.w_final) + len(self.e_final) + len(self.x_rows.ravel())) * 32


class _FoldCore:
    """Shared prover/verifier machinery over one step circuit."""

    def __init__(self, dr1cs: DeviceR1CS, curve: BatchedCurve | None = None):
        self.d = dr1cs
        self.curve = curve or bn254_batched()
        self.f = FR_LIMBS
        self.n_wit = dr1cs.n_wires - 1 - dr1cs.n_pub
        n_bases = max(self.n_wit, dr1cs.n_constraints)
        self.bases = self.curve.pedersen_bases(n_bases)

    def commit(self, scalars_std) -> dict:
        """(N, 16) standard-form scalars -> Pedersen commitment point."""
        n = scalars_std.shape[0]
        return self.curve.msm(scalars_std, _index_points(self.bases, slice(0, n)))

    def commit_many(self, scalars_std) -> dict:
        """(m, N, 16) -> stacked points (m,) — one vmapped MSM kernel."""
        n = scalars_std.shape[1]
        return self.curve.msm_many(scalars_std, _index_points(self.bases, slice(0, n)))

    def to_affine(self, pts: dict) -> list:
        return self.curve.to_affine_ints(pts)

    def fold_points(self, p1: dict, p2: dict, r_std) -> dict:
        """p1 + r * p2, batched."""
        return self.curve.add(p1, self.curve.scalar_mul(r_std, p2))

    def _r_limbs(self, rs: list[int]):
        std = jnp.asarray(self.f.to_limbs(np.array(rs, dtype=object)))
        mont = jnp.asarray(self.f.to_limbs_mont(np.array(rs, dtype=object)))
        return std, mont


class FoldingProver(_FoldCore):
    def prove(self, r1cs: R1CS, progress: bool = False) -> FoldProof:
        f, d = self.f, self.d
        S = r1cs.witness.shape[0]
        state_len = r1cs.n_pub // 2

        # Full Z rows (u=1) in both forms.
        z_std_host = f.to_limbs(r1cs.witness)
        z_mont = f.to_mont(jnp.asarray(z_std_host))
        w_std = jnp.asarray(z_std_host[:, 1 + d.n_pub :, :])

        # Leaf commitments (batched MSMs).
        comm_w = self.commit_many(w_std)
        comm_w_aff = self.to_affine(comm_w)
        comm_e = self.curve.infinity((S,))

        x_rows = r1cs.witness[:, 1 : 1 + d.n_pub].copy()
        u_host = [1] * S
        digests = [
            instance_digest(1, list(x_rows[i]), comm_w_aff[i], None) for i in range(S)
        ]

        e_mont = jnp.zeros((S, d.n_constraints, 16), dtype=jnp.uint32)
        node_comm_t: list[list] = []

        m = S
        while m > 1:
            k = m // 2
            carry = m % 2
            sl1, sl2 = slice(0, 2 * k, 2), slice(1, 2 * k, 2)

            z1, z2 = z_mont[sl1], z_mont[sl2]
            u1_m = jnp.asarray(f.to_limbs_mont(np.array(u_host[0 : 2 * k : 2], dtype=object)))
            u2_m = jnp.asarray(f.to_limbs_mont(np.array(u_host[1 : 2 * k : 2], dtype=object)))

            T = d.cross_term(z1, u1_m, z2, u2_m)  # (k, nc, 16) mont
            T_std = f.from_mont(T)
            comm_t = self.commit_many(T_std)
            comm_t_aff = self.to_affine(comm_t)

            rs = [
                fold_challenge(digests[2 * j], digests[2 * j + 1], comm_t_aff[j])
                for j in range(k)
            ]
            r_std, r_mont = self._r_limbs(rs)
            r2s = [r * r % P for r in rs]
            r2_std, r2_mont = self._r_limbs(r2s)

            # fold vectors: z' = z1 + r z2 ; E' = E1 + r T + r^2 E2
            z_next = f.add(z1, f.mul(z2, r_mont[:, None, :]))
            e_next = f.add(
                e_mont[sl1],
                f.add(
                    f.mul(T, r_mont[:, None, :]),
                    f.mul(e_mont[sl2], r2_mont[:, None, :]),
                ),
            )
            cw_next = self.fold_points(
                _index_points(comm_w, sl1), _index_points(comm_w, sl2), r_std
            )
            ce_next = self.curve.add(
                _index_points(comm_e, sl1),
                self.curve.add(
                    self.curve.scalar_mul(r_std, comm_t),
                    self.curve.scalar_mul(r2_std, _index_points(comm_e, sl2)),
                ),
            )

            u_next = [(u_host[2 * j] + rs[j] * u_host[2 * j + 1]) % P for j in range(k)]
            x_next = (x_rows[sl1] + x_rows[sl2] * np.array(rs, dtype=object)[:, None]) % P

            if carry:
                z_next = jnp.concatenate([z_next, z_mont[-1:]])
                e_next = jnp.concatenate([e_next, e_mont[-1:]])
                cw_next = {k2: jnp.concatenate([cw_next[k2], comm_w[k2][-1:]]) for k2 in cw_next}
                ce_next = {k2: jnp.concatenate([ce_next[k2], comm_e[k2][-1:]]) for k2 in ce_next}
                u_next = u_next + [u_host[-1]]
                x_next = np.concatenate([x_next, x_rows[-1:]])

            cw_aff = self.to_affine(cw_next)
            ce_aff = self.to_affine(ce_next)
            digests = [
                instance_digest(u_next[j], list(x_next[j]), cw_aff[j], ce_aff[j])
                for j in range(len(u_next))
            ]

            z_mont, e_mont, comm_w, comm_e = z_next, e_next, cw_next, ce_next
            u_host, x_rows = u_next, x_next
            node_comm_t.append(comm_t_aff)
            m = k + carry
            if progress:
                print(f"  fold level done: {m} instances remain")

        w_final = f.from_limbs_mont(np.asarray(z_mont[0, 1 + d.n_pub :]))
        e_final = f.from_limbs_mont(np.asarray(e_mont[0]))

        return FoldProof(
            state_len=state_len,
            steps=S,
            x_rows=r1cs.witness[:, 1 : 1 + d.n_pub].copy(),
            leaf_comm_w=comm_w_aff,
            node_comm_t=node_comm_t,
            u_final=u_host[0],
            w_final=w_final,
            e_final=e_final,
        )


class FoldingVerifier(_FoldCore):
    def verify(self, proof: FoldProof, z0: list[int], zn: list[int]) -> bool:
        f, d = self.f, self.d
        S = proof.steps
        sl_len = proof.state_len
        x_rows = proof.x_rows % P

        # 1) state chaining on public IO
        if list(x_rows[0, :sl_len]) != [v % P for v in z0]:
            return False
        if list(x_rows[-1, sl_len:]) != [v % P for v in zn]:
            return False
        for i in range(S - 1):
            if list(x_rows[i, sl_len:]) != list(x_rows[i + 1, :sl_len]):
                return False

        # 2) recompute the fold tree over instances only
        comm_w = self.curve.from_affine_ints(proof.leaf_comm_w)
        comm_e = self.curve.infinity((S,))
        u_host = [1] * S
        digests = [
            instance_digest(1, list(x_rows[i]), proof.leaf_comm_w[i], None)
            for i in range(S)
        ]

        m = S
        for level, comm_t_aff in enumerate(proof.node_comm_t):
            k = m // 2
            carry = m % 2
            if len(comm_t_aff) != k:
                return False
            sl1, sl2 = slice(0, 2 * k, 2), slice(1, 2 * k, 2)
            comm_t = self.curve.from_affine_ints(comm_t_aff)
            rs = [
                fold_challenge(digests[2 * j], digests[2 * j + 1], comm_t_aff[j])
                for j in range(k)
            ]
            r_std, _ = self._r_limbs(rs)
            r2_std, _ = self._r_limbs([r * r % P for r in rs])

            cw_next = self.fold_points(
                _index_points(comm_w, sl1), _index_points(comm_w, sl2), r_std
            )
            ce_next = self.curve.add(
                _index_points(comm_e, sl1),
                self.curve.add(
                    self.curve.scalar_mul(r_std, comm_t),
                    self.curve.scalar_mul(r2_std, _index_points(comm_e, sl2)),
                ),
            )
            u_next = [(u_host[2 * j] + rs[j] * u_host[2 * j + 1]) % P for j in range(k)]
            x_next = (x_rows[sl1] + x_rows[sl2] * np.array(rs, dtype=object)[:, None]) % P

            if carry:
                cw_next = {k2: jnp.concatenate([cw_next[k2], comm_w[k2][-1:]]) for k2 in cw_next}
                ce_next = {k2: jnp.concatenate([ce_next[k2], comm_e[k2][-1:]]) for k2 in ce_next}
                u_next = u_next + [u_host[-1]]
                x_next = np.concatenate([x_next, x_rows[-1:]])

            cw_aff = self.to_affine(cw_next)
            ce_aff = self.to_affine(ce_next)
            digests = [
                instance_digest(u_next[j], list(x_next[j]), cw_aff[j], ce_aff[j])
                for j in range(len(u_next))
            ]
            comm_w, comm_e = cw_next, ce_next
            u_host, x_rows = u_next, x_next
            m = k + carry
        if m != 1:
            return False

        # 3) final opening checks
        w_std = jnp.asarray(f.to_limbs(proof.w_final))
        e_std = jnp.asarray(f.to_limbs(proof.e_final))
        if self.to_affine(self.commit(w_std))[0] != self.to_affine(comm_w)[0]:
            return False
        if self.to_affine(self.commit(e_std))[0] != self.to_affine(comm_e)[0]:
            return False

        # 4) relaxed R1CS satisfaction of the final instance
        z_full = np.concatenate(
            [np.array([proof.u_final], dtype=object), x_rows[0], proof.w_final]
        )
        z_mont = f.to_mont(jnp.asarray(f.to_limbs(z_full)))
        u_mont = jnp.asarray(f.to_limbs_mont(np.array(proof.u_final, dtype=object)))
        e_mont = f.to_mont(jnp.asarray(e_std))
        res = d.residual(z_mont, u_mont, e_mont)
        return bool(np.all(np.asarray(f.is_zero(res))))
