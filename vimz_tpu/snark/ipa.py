"""Inner-product argument (Bulletproofs-style) over BN254 G1.

Proves, for a Pedersen vector commitment C = <a, G> and a public vector b,
that <a, b> = v — the multilinear-PCS opening used by the compression SNARK
(b is an eq() tensor vector, so <a, b> = A~(point)). log2(N) rounds, two
curve points per round, one scalar at the end.

The reference gets this from nova-snark's ipa_pc evaluation engine inside
Spartan (vimz/src/nova_snark_backend/mod.rs:19-20 S<G1>/S<G2>); here it is
re-built on the framework's batched projective curve kernels: all per-round
MSMs, point folds and vector folds are device-batched.

Splitting convention matches the sumcheck: lo = first half (top index bit 0),
hi = second half. Fold: a' = x*a_lo + xinv*a_hi, G' = xinv*G_lo + x*G_hi,
b' = xinv*b_lo + x*b_hi, so <a', G'> and <a', b'> pick up x^{±2} cross terms
collected in L/R.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from vimz_tpu.curves import BatchedCurve
from vimz_tpu.fields.limbs import FR_LIMBS as F
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.snark.transcript import Transcript

IPA_SEED = b"vimz-tpu-ipa-q"


def _msm(curve: BatchedCurve, scalars_std, points):
    """MSM honoring the VIMZ_MSM_IMPL switch (ladder = compile-light path
    for CPU tests/dry runs; identical group results either way)."""
    import os

    if os.environ.get("VIMZ_MSM_IMPL") == "ladder":
        return curve.msm_ladder(scalars_std, points)
    return curve.msm(scalars_std, points)


def _mont(v: int):
    return jnp.asarray(F.to_limbs_mont(np.array(v % P, dtype=object)))


def _std(v: int):
    return jnp.asarray(F.to_limbs(np.array(v % P, dtype=object)))


def _inner(a_mont, b_mont):
    """<a, b> over (N, 16) Montgomery arrays -> int (standard form)."""
    # the product a_mont*b_mont carries exactly one Montgomery factor, which
    # from_limbs_mont strips: mul(aR, bR) = abR.
    s = F.sum_reduce(F.mul(a_mont, b_mont), axis=-2)
    return int(F.from_limbs_mont(np.asarray(s))[()])


@dataclass
class IPAProof:
    L: list  # affine points, one per round
    R: list
    a_final: int
    # Hiding mode: the accumulated Pedersen blind of the folded commitment
    # (commitment C = <a, G> + r*H; each round's L/R carries its own fresh
    # blind, folded as r' = l_j*x^2 + r + r_j*x^-2). 0 = unblinded proof.
    r_final: int = 0


def q_point(curve: BatchedCurve):
    """The auxiliary base binding the claimed inner-product value."""
    return curve.pedersen_bases(1, seed=IPA_SEED)


def _fold_points(curve, pts, x_std, xinv_std):
    half = pts["z"].shape[0] // 2
    lo = {k: v[:half] for k, v in pts.items()}
    hi = {k: v[half:] for k, v in pts.items()}
    return curve.add(curve.scalar_mul(xinv_std, lo), curve.scalar_mul(x_std, hi))


def _round_blinds(n: int, rng) -> list[int]:
    if rng is None:
        import secrets

        return [secrets.randbelow(P) for _ in range(n)]
    out = []
    for row in rng.integers(0, 1 << 62, size=(n, 5)):
        acc = 0
        for v in row:
            acc = (acc << 62) | int(v)
        out.append(acc % P)
    return out


def ipa_prove(
    curve: BatchedCurve,
    a_mont,
    b_mont,
    bases: dict,
    transcript: Transcript,
    blind: int = 0,
    rng=None,
) -> IPAProof:
    """a_mont/b_mont: (N, 16) Montgomery, N a power of two; bases: N points.

    `blind` != 0: the commitment being opened is <a, G> + blind*H; every
    round's L/R then carries a fresh blind (l_j, r_j), and the final
    accumulated blind is revealed in the proof (hiding mode,
    SECURITY.md §1)."""
    N = a_mont.shape[0]
    assert N & (N - 1) == 0
    qp = q_point(curve)

    w = transcript.challenge(b"ipa-w")
    # Q' = w*Q; folded into every L/R so the value v is bound to the claim.
    qw = curve.scalar_mul(_std(w)[None], qp)
    hiding = blind != 0
    if hiding:
        hp = curve.blinding_base()

    a, b = a_mont, b_mont
    G = bases
    Ls, Rs = [], []
    r_acc = blind % P
    while a.shape[0] > 1:
        half = a.shape[0] // 2
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        G_lo = {k: v[:half] for k, v in G.items()}
        G_hi = {k: v[half:] for k, v in G.items()}

        cl = _inner(a_lo, b_hi)
        cr = _inner(a_hi, b_lo)
        L = curve.add(
            _msm(curve, F.from_mont(a_lo), G_hi),
            curve.scalar_mul(_std(cl)[None], qw),
        )
        R = curve.add(
            _msm(curve, F.from_mont(a_hi), G_lo),
            curve.scalar_mul(_std(cr)[None], qw),
        )
        if hiding:
            lj, rj = _round_blinds(2, rng)
            L = curve.add(L, curve.scalar_mul(_std(lj)[None], hp))
            R = curve.add(R, curve.scalar_mul(_std(rj)[None], hp))
        L_aff = curve.to_affine_ints({k: v.reshape(1, 16) for k, v in L.items()})[0]
        R_aff = curve.to_affine_ints({k: v.reshape(1, 16) for k, v in R.items()})[0]
        Ls.append(L_aff)
        Rs.append(R_aff)
        transcript.absorb_point(L_aff)
        transcript.absorb_point(R_aff)
        x = transcript.challenge(b"ipa-x")
        xinv = pow(x, P - 2, P)
        xm, xim = _mont(x), _mont(xinv)
        a = F.add(F.mul(a_lo, xm), F.mul(a_hi, xim))
        b = F.add(F.mul(b_lo, xim), F.mul(b_hi, xm))
        G = _fold_points(curve, G, _std(x), _std(xinv))
        if hiding:
            r_acc = (lj * x % P * x + r_acc + rj * xinv % P * xinv) % P

    a_final = int(F.from_limbs_mont(np.asarray(a[0]))[()])
    return IPAProof(L=Ls, R=Rs, a_final=a_final, r_final=r_acc if hiding else 0)


def ipa_verify(
    curve: BatchedCurve,
    commitment,
    v: int,
    b_mont,
    bases: dict,
    proof: IPAProof,
    transcript: Transcript,
) -> bool:
    """commitment: affine point (int pair) or None; b_mont: (N, 16)."""
    N = b_mont.shape[0]
    m = (N - 1).bit_length()
    if N != 1 << m or len(proof.L) != m or len(proof.R) != m:
        return False
    if not (0 <= proof.a_final < P):
        return False
    for pt in list(proof.L) + list(proof.R):
        if pt is not None:
            x, y = pt
            pp = curve.ref.p
            if not (0 <= x < pp and 0 <= y < pp and curve.ref.is_on_curve(pt)):
                return False
    qp = q_point(curve)
    w = transcript.challenge(b"ipa-w")
    qw = curve.scalar_mul(_std(w)[None], qp)

    xs = []
    for L_aff, R_aff in zip(proof.L, proof.R):
        transcript.absorb_point(L_aff)
        transcript.absorb_point(R_aff)
        xs.append(transcript.challenge(b"ipa-x"))
    xinvs = [pow(x, P - 2, P) for x in xs]

    # s_i = prod_j (x_j if bit j of i set else xinv_j), round j binding the
    # top remaining bit: tensor build on device, like eq_table the newest
    # factor lands on the top bit, so iterate rounds reversed.
    s = jnp.asarray(F.one_mont)[None, :]
    for x, xi in reversed(list(zip(xs, xinvs))):
        lo = F.mul(s, _mont(xi))
        hi = F.mul(s, _mont(x))
        s = jnp.concatenate([lo, hi])
    G_final = _msm(curve, F.from_mont(s), bases)

    # b folds with the same (xinv lo, x hi) pattern as G.
    b_final = _inner(s, b_mont)

    # P' = C + w*v*Q + sum x_j^2 L_j + x_j^{-2} R_j
    acc = curve.from_affine_ints([commitment])
    acc = {k: v_[0] for k, v_ in acc.items()}
    acc = curve.add(acc, curve.scalar_mul(_std(v)[None], qw))
    for x, xi, L_aff, R_aff in zip(xs, xinvs, proof.L, proof.R):
        Lp = curve.from_affine_ints([L_aff])
        Rp = curve.from_affine_ints([R_aff])
        acc = curve.add(acc, curve.scalar_mul(_std(x * x % P)[None], {k: v_[0] for k, v_ in Lp.items()}))
        acc = curve.add(acc, curve.scalar_mul(_std(xi * xi % P)[None], {k: v_[0] for k, v_ in Rp.items()}))

    # right side: a_final * G_final + a_final*b_final * Q' (+ r_final * H)
    rhs = curve.scalar_mul(_std(proof.a_final)[None], {k: v_.reshape(1, 16) for k, v_ in G_final.items()})
    rhs = {k: v_[0] for k, v_ in rhs.items()}
    rhs = curve.add(
        rhs, curve.scalar_mul(_std(proof.a_final * b_final % P)[None], qw)
    )
    r_final = getattr(proof, "r_final", 0) or 0
    if not (0 <= r_final < P):
        return False
    if r_final:
        rhs = curve.add(
            rhs, curve.scalar_mul(_std(r_final)[None], curve.blinding_base())
        )
    lhs_aff = curve.to_affine_ints({k: v_.reshape(1, 16) for k, v_ in acc.items()})[0]
    rhs_aff = curve.to_affine_ints({k: v_.reshape(1, 16) for k, v_ in rhs.items()})[0]
    return lhs_aff == rhs_aff
