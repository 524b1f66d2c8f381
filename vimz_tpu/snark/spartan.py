"""Spartan-style compression SNARK for a relaxed R1CS instance.

The analog of the reference's CompressedSNARK stage (nova-snark Spartan over
the final folded instance, vimz/src/nova_snark_backend/mod.rs:52-67): after
folding, the prover holds ONE relaxed instance (u, x, comm_W, comm_E) with
witness vectors W and E; instead of shipping W/E in the clear (megabytes),
it proves satisfaction with

  1. sumcheck #1:  sum_x eq(tau, x) * (Az(x)*Bz(x) - u*Cz(x) - E(x)) = 0
     -> point rx, claimed evals vA, vB, vC, vE
  2. sumcheck #2:  rA*vA + rB*vB + rC*vC = sum_y M~(rx, y) * Z~(y)
     with M = rA*A + rB*B + rC*C -> point ry, claimed eval vZ
  3. two inner-product openings (snark/ipa.py) binding vE to comm_E at
     eq(rx) and the witness part of vZ to comm_W at the shifted eq(ry).

All O(N) prover work (matvecs, eq tables, sumcheck tables, IPA folds/MSMs)
runs as batched device kernels; the host sees only transcript scalars.
Verifier matrix evaluations M~(rx, ry) reuse the same device matvec kernels
(eq_rx^T * M * eq_ry), so verification needs no sparse-matrix preprocessing.

Z layout matches the folding layer: Z = (u, x, W) with wire 0 = u.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from vimz_tpu.curves import bn254_batched
from vimz_tpu.fields.limbs import FR_LIMBS as F
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.snark.ipa import IPAProof, ipa_prove, ipa_verify
from vimz_tpu.snark.sumcheck import (
    eq_eval,
    eq_table,
    lagrange_eval,
    pow2_pad,
    sumcheck_prove,
    sumcheck_verify,
)
from vimz_tpu.snark.transcript import Transcript

DOMAIN = b"vimz-tpu/spartan/v1"


def _pow2exp(n: int) -> int:
    return max(0, (n - 1).bit_length())


def _mont_scalar(v: int):
    return jnp.asarray(F.to_limbs_mont(np.array(v % P, dtype=object)))


@dataclass
class SpartanProof:
    sc1_rounds: list  # per round [g(0), g(2), g(3)]
    vA: int
    vB: int
    vC: int
    vE: int
    sc2_rounds: list  # per round [g(0), g(2)]
    vZ: int
    ipa_w: IPAProof
    ipa_e: IPAProof

    def size_bytes(self) -> int:
        n_scalars = (
            sum(len(r) for r in self.sc1_rounds)
            + sum(len(r) for r in self.sc2_rounds)
            + 6
            + 2  # a_final of each IPA
            + 2  # r_final of each IPA (hiding mode; 0 when unblinded)
        )
        n_points = 2 * (len(self.ipa_w.L) + len(self.ipa_e.L))
        return n_scalars * 32 + n_points * 64


class _SpartanCore:
    def __init__(self, dr1cs: DeviceR1CS, curve=None):
        self.d = dr1cs
        self.curve = curve or bn254_batched()
        self.m = _pow2exp(dr1cs.n_constraints)
        self.mw = _pow2exp(dr1cs.n_wires)
        self.n_wit = dr1cs.n_wires - 1 - dr1cs.n_pub
        self.mwit = _pow2exp(self.n_wit)
        n_bases = 1 << max(self.m, self.mwit)
        self.bases = self.curve.pedersen_bases(n_bases)

    def _start_transcript(self, u: int, x: list[int], comm_w, comm_e) -> Transcript:
        tr = Transcript(DOMAIN)
        tr.absorb(u, *x)
        tr.absorb_point(comm_w)
        tr.absorb_point(comm_e)
        return tr

    def _witness_eq_slice(self, eq_ry):
        """eq(ry, .) restricted to the witness wires, padded to 2^mwit."""
        off = 1 + self.d.n_pub
        return pow2_pad(eq_ry[off : off + self.n_wit], 1 << self.mwit)


class SpartanProver(_SpartanCore):
    def prove(
        self, u: int, x: list[int], comm_w_aff, comm_e_aff, z_mont, e_mont,
        r_w: int = 0, r_e: int = 0, rng=None,
    ) -> SpartanProof:
        """z_mont: (n_wires, 16) Montgomery Z = (u, x, W); e_mont: (nc, 16).

        r_w/r_e: Pedersen blinds of comm_w/comm_e (hiding mode) — passed
        into the two IPA openings, which then blind their own rounds."""
        from vimz_tpu.utils.tracing import span

        d = self.d
        tr = self._start_transcript(u, x, comm_w_aff, comm_e_aff)
        tau = tr.challenges(self.m, b"tau")

        with span("spartan.matvecs"):
            az = pow2_pad(d.matvec(z_mont, "A"), 1 << self.m)
            bz = pow2_pad(d.matvec(z_mont, "B"), 1 << self.m)
            cz = pow2_pad(d.matvec(z_mont, "C"), 1 << self.m)
            e = pow2_pad(e_mont, 1 << self.m)
            eqt = eq_table(tau)

        u_m = _mont_scalar(u)

        def g1(eq_v, az_v, bz_v, cz_v, e_v):
            inner = F.sub(F.mul(az_v, bz_v), F.add(F.mul(cz_v, u_m), e_v))
            return F.mul(eq_v, inner)

        with span("spartan.sumcheck1", m=self.m):
            sc1_rounds, rx, fin1 = sumcheck_prove([eqt, az, bz, cz, e], g1, 3, 0, tr)
        _, vA, vB, vC, vE = fin1

        tr.absorb(vA, vB, vC, vE)
        rA = tr.challenge(b"rA")
        rB = tr.challenge(b"rB")
        rC = tr.challenge(b"rC")

        with span("spartan.matvec_t"):
            eq_rx = eq_table(rx)[: d.n_constraints]
            mz = F.mul(d.matvec_t(eq_rx, "A"), _mont_scalar(rA))
            mz = F.add(mz, F.mul(d.matvec_t(eq_rx, "B"), _mont_scalar(rB)))
            mz = F.add(mz, F.mul(d.matvec_t(eq_rx, "C"), _mont_scalar(rC)))
            mz = pow2_pad(mz, 1 << self.mw)
            z_pad = pow2_pad(z_mont, 1 << self.mw)

        claim2 = (rA * vA + rB * vB + rC * vC) % P

        def g2(mz_v, z_v):
            return F.mul(mz_v, z_v)

        with span("spartan.sumcheck2", m=self.mw):
            sc2_rounds, ry, fin2 = sumcheck_prove([mz, z_pad], g2, 2, claim2, tr)
        _, vZ = fin2
        tr.absorb(vZ)

        with span("spartan.ipa_w"):
            eq_ry = eq_table(ry)
            b_w = self._witness_eq_slice(eq_ry)
            w_pad = pow2_pad(z_mont[1 + d.n_pub :], 1 << self.mwit)
            ipa_w = ipa_prove(
                self.curve, w_pad, b_w,
                {k: v[: 1 << self.mwit] for k, v in self.bases.items()}, tr,
                blind=r_w, rng=rng,
            )
        with span("spartan.ipa_e"):
            eq_rx_full = eq_table(rx)
            e_pad = pow2_pad(e_mont, 1 << self.m)
            ipa_e = ipa_prove(
                self.curve, e_pad, eq_rx_full,
                {k: v[: 1 << self.m] for k, v in self.bases.items()}, tr,
                blind=r_e, rng=rng,
            )

        return SpartanProof(
            sc1_rounds=sc1_rounds, vA=vA, vB=vB, vC=vC, vE=vE,
            sc2_rounds=sc2_rounds, vZ=vZ, ipa_w=ipa_w, ipa_e=ipa_e,
        )


class SpartanVerifier(_SpartanCore):
    def verify(self, proof: SpartanProof, u: int, x: list[int], comm_w_aff, comm_e_aff) -> bool:
        d = self.d
        if not (0 <= u < P):
            return False
        for v in (proof.vA, proof.vB, proof.vC, proof.vE, proof.vZ):
            if not (0 <= v < P):
                return False
        tr = self._start_transcript(u, x, comm_w_aff, comm_e_aff)
        tau = tr.challenges(self.m, b"tau")

        ok, rx, claim1 = sumcheck_verify(self.m, 3, 0, proof.sc1_rounds, tr)
        if not ok:
            return False
        eq_t_rx = eq_eval(tau, rx)
        want1 = eq_t_rx * ((proof.vA * proof.vB - u * proof.vC - proof.vE) % P) % P
        if claim1 != want1:
            return False

        tr.absorb(proof.vA, proof.vB, proof.vC, proof.vE)
        rA = tr.challenge(b"rA")
        rB = tr.challenge(b"rB")
        rC = tr.challenge(b"rC")
        claim2 = (rA * proof.vA + rB * proof.vB + rC * proof.vC) % P

        ok, ry, fin2 = sumcheck_verify(self.mw, 2, claim2, proof.sc2_rounds, tr)
        if not ok:
            return False
        tr.absorb(proof.vZ)

        # vM = eq(rx)^T (rA A + rB B + rC C) eq(ry): device matvec + inner.
        eq_rx = eq_table(rx)
        eq_ry = eq_table(ry)
        zvec = eq_ry[: d.n_wires]
        acc = 0
        for r_coef, name in ((rA, "A"), (rB, "B"), (rC, "C")):
            mv = d.matvec(zvec, name)  # (nc, 16)
            # mul of two Montgomery values keeps one factor; strip with
            # from_limbs_mont.
            dot = F.sum_reduce(F.mul(eq_rx[: d.n_constraints], mv), axis=-2)
            val = int(F.from_limbs_mont(np.asarray(dot))[()])
            acc = (acc + r_coef * val) % P
        if fin2 != acc * proof.vZ % P:
            return False

        # vZ = public part + <W, eq(ry) shifted>: derive the witness claim.
        ry_ints = ry
        pub_vals = [u] + [int(v) % P for v in x]
        pub = 0
        for i, v in enumerate(pub_vals):
            # eq(ry, i) over the mw-bit domain
            bits = [(i >> (self.mw - 1 - j)) & 1 for j in range(self.mw)]
            term = 1
            for b, r in zip(bits, ry_ints):
                term = term * ((r if b else (1 - r)) % P) % P
            pub = (pub + v * term) % P
        vW = (proof.vZ - pub) % P

        b_w = self._witness_eq_slice(eq_ry)
        if not ipa_verify(
            self.curve, comm_w_aff, vW, b_w,
            {k: v[: 1 << self.mwit] for k, v in self.bases.items()},
            proof.ipa_w, tr,
        ):
            return False
        if not ipa_verify(
            self.curve, comm_e_aff, proof.vE, eq_rx,
            {k: v[: 1 << self.m] for k, v in self.bases.items()},
            proof.ipa_e, tr,
        ):
            return False
        return True
