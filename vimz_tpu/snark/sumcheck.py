"""Batched-device sumcheck protocol over multilinear tables.

The prover keeps every multilinear polynomial as a full evaluation table on
device ((N, 16) Montgomery limbs) and, per round, evaluates the round
polynomial at degree+1 points with vectorized field kernels, then binds the
top variable to the Fiat–Shamir challenge. Host work per round is O(degree)
scalars (transcript absorption); all O(N) work is device-batched.

This is the core of the compression SNARK (Spartan-style, see snark/spartan.py)
— the stage the reference delegates to nova-snark's Spartan CompressedSNARK
(vimz/src/nova_snark_backend/mod.rs:52-67). Variable order convention: round j
binds the MOST significant remaining index bit, so table halves stay
contiguous slices.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vimz_tpu.fields.limbs import FR_LIMBS as F
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.snark.transcript import Transcript


def pow2_pad(arr, n: int | None = None):
    """Zero-pad a (N, 16) device array up to a power of two (or to n)."""
    N = arr.shape[0]
    target = n if n is not None else 1 << max(0, (N - 1).bit_length())
    if target == N:
        return arr
    pad = jnp.zeros((target - N, 16), dtype=jnp.uint32)
    return jnp.concatenate([arr, pad])


def eq_table(point: list[int]) -> jnp.ndarray:
    """(2^m, 16) Montgomery table of eq(point, i), with point[0] paired to
    the MOST significant bit of i (matching the sumcheck fold order).

    Built by m doubling steps on device: [ (1-p_j) * prev ; p_j * prev ].
    Each concat makes the newest variable the top index bit, so iterate the
    point reversed (least significant variable first).
    """
    table = jnp.asarray(F.one_mont)[None, :]
    for pj in reversed(point):
        pj_m = jnp.asarray(F.to_limbs_mont(np.array(pj, dtype=object)))
        hi = F.mul(table, pj_m)
        lo = F.sub(table, hi)  # (1 - pj) * prev
        table = jnp.concatenate([lo, hi])
    return table


def eq_eval(a: list[int], b: list[int]) -> int:
    """eq(a, b) over host ints."""
    acc = 1
    for x, y in zip(a, b):
        acc = acc * ((x * y + (1 - x) * (1 - y)) % P) % P
    return acc


def _to_int(limbs_mont) -> int:
    return int(F.from_limbs_mont(np.asarray(limbs_mont))[()])


def _to_mont(v: int):
    return jnp.asarray(F.to_limbs_mont(np.array(v % P, dtype=object)))


def lagrange_eval(evals: list[int], x: int) -> int:
    """Evaluate the degree-(len(evals)-1) poly through (i, evals[i]) at x."""
    d = len(evals) - 1
    acc = 0
    for i, yi in enumerate(evals):
        num, den = 1, 1
        for j in range(d + 1):
            if j != i:
                num = num * ((x - j) % P) % P
                den = den * ((i - j) % P) % P
        acc = (acc + yi * num % P * pow(den, P - 2, P)) % P
    return acc


def sumcheck_prove(
    tables: list,
    product_fn,
    degree: int,
    claim: int,
    transcript: Transcript,
):
    """Run sumcheck over m = log2(N) rounds.

    tables: list of (N, 16) Montgomery device arrays, N a power of two.
    product_fn(*vals) -> (n, 16) combined array whose sum is the claim.
    Returns (round_msgs, rs, final_vals):
      round_msgs: per round, [g(0), g(2), ..., g(degree)] ints — g(1) is
        implied by the running claim and never sent
      rs: the challenge point (list of ints, most significant variable first)
      final_vals: the fully-bound scalar value of each table (ints).
    """
    N = tables[0].shape[0]
    m = (N - 1).bit_length()
    assert N == 1 << m
    tables = list(tables)
    rounds = []
    rs = []
    for _ in range(m):
        half = tables[0].shape[0] // 2
        los = [t[:half] for t in tables]
        diffs = [F.sub(t[half:], lo) for t, lo in zip(tables, los)]
        msg = []
        vals = los
        for t in range(degree + 1):
            if t > 0:
                vals = [F.add(v, d) for v, d in zip(vals, diffs)]
            if t == 1:
                continue  # implied by the claim
            g_t = F.sum_reduce(product_fn(*vals), axis=-2)
            msg.append(_to_int(g_t))
        rounds.append(msg)
        transcript.absorb(*msg)
        r = transcript.challenge(b"sumcheck-r")
        rs.append(r)
        r_m = _to_mont(r)
        tables = [F.add(lo, F.mul(d, r_m)) for lo, d in zip(los, diffs)]
    final_vals = [_to_int(t[0]) for t in tables]
    return rounds, rs, final_vals


def sumcheck_verify(
    m: int,
    degree: int,
    claim: int,
    round_msgs: list[list[int]],
    transcript: Transcript,
):
    """Replay the sumcheck reduction. Returns (ok, rs, final_claim).

    Each round message is [g(0), g(2), .., g(degree)]; g(1) is recovered
    from the running claim (g(0) + g(1) == claim).
    """
    if len(round_msgs) != m:
        return False, [], 0
    rs = []
    cur = claim % P
    for msg in round_msgs:
        if len(msg) != degree:
            return False, [], 0
        g0 = msg[0] % P
        g1 = (cur - g0) % P
        pts = [g0, g1] + [v % P for v in msg[1:]]
        transcript.absorb(*msg)
        r = transcript.challenge(b"sumcheck-r")
        rs.append(r)
        cur = lagrange_eval(pts, r)
    return True, rs, cur
