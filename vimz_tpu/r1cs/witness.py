"""Batched device witness generation: execute a circuit's witness tape.

This is the TPU-native replacement for the reference's per-step witness
generators (circom-emitted WASM run by nova-scotia/sonobe per fold step,
vimz/src/nova_snark_backend/folding.rs:28-43): one pass evaluates every wire
of every fold step at once, as Montgomery-limb kernels over a
(S, n_wires, 16) uint32 witness matrix resident on device.

Execution model:

- ops are grouped into *stages* by (dependency depth, kind, meta): every op
  in a stage is independent, so a stage is one batched kernel — gather input
  wires, evaluate linear combinations with one lazy-reduced `mul_acc`,
  apply the op, scatter results back.
- stage lane counts and LC widths are padded to power-of-two buckets so the
  jitted stage kernels are reused across stages (and across circuits).
- the witness matrix has one extra scratch column (index n_wires) that
  padded lanes write into.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vimz_tpu.fields.limbs import FR_LIMBS as F
from vimz_tpu.fields.prime import P_FR as P


def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _lane_bucket(n: int) -> int:
    """Coarse lane-count buckets so stage kernels compile once and are
    shared across stages (and circuits): 8, 64, 512, 4096, ..."""
    b = 8
    while b < n:
        b *= 8
    return b


def _k_bucket(n: int) -> int:
    return max(4, _pow2(n))


# ----------------------------------------------------------------------
# Stage packing (host, once per circuit structure)
# ----------------------------------------------------------------------


def _pack_lcs(lcs: list[dict], scratch: int):
    """List of LC term-dicts -> (idx (L, K) int32, coeff (L, K, 16) mont)."""
    L = len(lcs)
    K = _k_bucket(max((len(t) for t in lcs), default=1) or 1)
    idx = np.zeros((L, K), dtype=np.int32)
    coeff = np.zeros((L, K), dtype=object)
    for i, terms in enumerate(lcs):
        for j, (w, c) in enumerate(terms.items()):
            idx[i, j] = w
            coeff[i, j] = c
    return idx, F.to_limbs_mont(coeff)


def pack_stages(tape, n_wires: int) -> list[dict]:
    """Group tape ops into batched stages (depth, kind, meta)."""
    groups: dict[tuple, list] = {}
    for op in tape:
        groups.setdefault((op.depth, op.kind, op.meta), []).append(op)

    stages = []
    scratch = n_wires
    for (depth, kind, meta) in sorted(groups):
        ops = groups[(depth, kind, meta)]
        L = len(ops)
        Lp = _lane_bucket(L)
        pad = Lp - L
        if kind == "mul":
            idxa, ca = _pack_lcs([op.lcs[0].terms for op in ops] + [{}] * pad, scratch)
            idxb, cb = _pack_lcs([op.lcs[1].terms for op in ops] + [{}] * pad, scratch)
            out = np.full(Lp, scratch, dtype=np.int32)
            out[:L] = [op.out for op in ops]
            stages.append(
                dict(kind="mul", idxa=idxa, ca=ca, idxb=idxb, cb=cb, out=out)
            )
        elif kind == "bits":
            idx, c = _pack_lcs([op.lcs[0].terms for op in ops] + [{}] * pad, scratch)
            out = np.full((Lp, meta), scratch, dtype=np.int32)
            for i, op in enumerate(ops):
                out[i] = op.out + np.arange(meta)
            stages.append(dict(kind="bits", idx=idx, c=c, out=out, n=meta))
        elif kind == "iszero":
            idx, c = _pack_lcs([op.lcs[0].terms for op in ops] + [{}] * pad, scratch)
            out = np.full((Lp, 2), scratch, dtype=np.int32)
            for i, op in enumerate(ops):
                out[i] = (op.out, op.out + 1)
            stages.append(dict(kind="iszero", idx=idx, c=c, out=out))
        else:  # pragma: no cover
            raise ValueError(f"unknown op kind {kind}")
    return stages


# ----------------------------------------------------------------------
# Stage kernels (jitted; cached by shape across stages and circuits)
# ----------------------------------------------------------------------


def _eval_lc(W, idx, coeff):
    """(S, n_wires, 16) x (L, K)/(L, K, 16) -> (S, L, 16) Montgomery."""
    gathered = W[:, idx, :]  # (S, L, K, 16)
    return F.mul_acc(coeff, gathered)


@partial(jax.jit, donate_argnums=0)
def _mul_stage(W, idxa, ca, idxb, cb, out):
    a = _eval_lc(W, idxa, ca)
    b = _eval_lc(W, idxb, cb)
    return W.at[:, out, :].set(F.mul(a, b))


@partial(jax.jit, donate_argnums=0, static_argnums=6)
def _bits_stage(W, idx, c, out, one_mont, zero16, n):
    x = F.from_mont(_eval_lc(W, idx, c))  # (S, L, 16) standard form
    limb = x[..., jnp.arange(n) // 16]  # (S, L, n)
    bit = (limb >> (jnp.arange(n) % 16)) & 1
    vals = jnp.where(bit[..., None] == 1, one_mont, zero16)  # (S, L, n, 16)
    S = W.shape[0]
    return W.at[:, out.reshape(-1), :].set(vals.reshape(S, -1, 16))


@partial(jax.jit, donate_argnums=0)
def _iszero_stage(W, idx, c, out, one_mont, zero16):
    x = _eval_lc(W, idx, c)  # (S, L, 16) mont
    inv = F.inv(x)  # x^{p-2}, 0 -> 0
    z = jnp.where(F.is_zero(x)[..., None], one_mont, zero16)
    vals = jnp.stack([inv, z], axis=2)  # (S, L, 2, 16)
    S = W.shape[0]
    return W.at[:, out.reshape(-1), :].set(vals.reshape(S, -1, 16))


# ----------------------------------------------------------------------
# Executor
# ----------------------------------------------------------------------


def execute_tape(r1cs) -> jnp.ndarray:
    """Compute the full witness matrix for every fold step on device.

    Returns (S, n_wires, 16) uint32 Montgomery limbs: wire 0 = 1, wires
    1..n_inputs = the provided inputs, remaining wires per the tape.
    """
    stages = getattr(r1cs, "_stages", None)
    if stages is None:
        stages = pack_stages(r1cs.tape, r1cs.n_wires)
        r1cs._stages = stages

    S = r1cs.inputs.shape[0]
    n = r1cs.n_wires
    one_mont = jnp.asarray(F.one_mont)
    zero16 = jnp.zeros(16, dtype=jnp.uint32)

    W = jnp.zeros((S, n + 1, 16), dtype=jnp.uint32)
    W = W.at[:, 0, :].set(one_mont)
    in_mont = F.to_mont(jnp.asarray(F.to_limbs(r1cs.inputs)))
    W = W.at[:, 1 : 1 + r1cs.n_inputs, :].set(in_mont)

    for st in stages:
        if st["kind"] == "mul":
            W = _mul_stage(
                W,
                jnp.asarray(st["idxa"]),
                jnp.asarray(st["ca"]),
                jnp.asarray(st["idxb"]),
                jnp.asarray(st["cb"]),
                jnp.asarray(st["out"]),
            )
        elif st["kind"] == "bits":
            W = _bits_stage(
                W,
                jnp.asarray(st["idx"]),
                jnp.asarray(st["c"]),
                jnp.asarray(st["out"]),
                one_mont,
                zero16,
                st["n"],
            )
        else:
            W = _iszero_stage(
                W,
                jnp.asarray(st["idx"]),
                jnp.asarray(st["c"]),
                jnp.asarray(st["out"]),
                one_mont,
                zero16,
            )
    return W[:, :n, :]
