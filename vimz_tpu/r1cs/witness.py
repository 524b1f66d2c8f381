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
from jax import lax

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
        elif kind == "perm":
            n_inputs = meta
            from vimz_tpu.poseidon.params import circomlib_params

            p = circomlib_params(n_inputs)
            t, half, partial = p.t, p.full_rounds // 2, p.partial_rounds
            flat = [lc.terms for op in ops for lc in op.lcs]
            flat += [{}] * (pad * t)
            idx, c = _pack_lcs(flat, scratch)
            idx = idx.reshape(Lp, t, -1)
            c = c.reshape(Lp, t, -1, 16)
            # sbox wire offsets, round-major (matches PoseidonGadget.permute):
            # first-half full rounds, partial rounds, last-half full rounds.
            r_ = np.arange(half)[:, None, None]
            i_ = np.arange(t)[None, :, None]
            k_ = np.arange(3)[None, None, :]
            off_full = 3 * (r_ * t + i_) + k_  # (half, t, 3)
            off_part = (
                3 * (half * t + np.arange(partial)[:, None, None])
                + np.arange(3)[None, None, :]
            )  # (partial, 1, 3)
            base = np.full(Lp, scratch, dtype=np.int64)
            base[:L] = [op.out for op in ops]
            scr = np.zeros(Lp, dtype=np.int64)
            scr[L:] = 1  # padded lanes: every write goes to the scratch column

            def lane_out(off, tail_off: int):
                o = base[:, None, None, None] + off[None] + tail_off
                o = np.where(scr[:, None, None, None] == 1, scratch, o)
                return o.astype(np.int32)

            stages.append(
                dict(
                    kind="perm",
                    n_inputs=n_inputs,
                    idx=idx,
                    c=c,
                    out_a=lane_out(off_full, 0),
                    out_b=lane_out(off_part, 0),
                    out_c=lane_out(off_full, 3 * (half * t + partial)),
                )
            )
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
    # One scatter per bit position: materializing all n bit-wires at once
    # ((S, L, n, 16)) is an HBM blow-up at HD scale (720 x 4096-lane bucket
    # x 24 bits x 16 limbs = 18 GB) — the round-1 OOM.
    for b in range(n):
        bit = (x[..., b // 16] >> (b % 16)) & 1  # (S, L)
        vals = jnp.where(bit[..., None] == 1, one_mont, zero16)  # (S, L, 16)
        W = W.at[:, out[:, b], :].set(vals)
    return W


@partial(jax.jit, donate_argnums=0)
def _perm_stage(W, idx, c, out_a, out_b, out_c, ark, mds):
    """One batch of whole Poseidon permutations: evaluate the t input LCs,
    run all rounds as three lax.scans (full/partial/full), and scatter every
    sbox intermediate (x2, x4, x5 per sbox, round-major) into W."""
    half = out_a.shape[1]
    partial_r = out_b.shape[1]
    st = F.mul_acc(c, W[:, idx, :])  # (S, L, t, 16)

    def full_body(st, ark_r):
        st = F.add(st, ark_r)
        x2 = F.mul(st, st)
        x4 = F.mul(x2, x2)
        x5 = F.mul(x4, st)
        return F.mul_acc(mds, x5[..., None, :, :]), jnp.stack([x2, x4, x5], axis=-2)

    def part_body(st, ark_r):
        st = F.add(st, ark_r)
        s0 = st[..., 0:1, :]
        x2 = F.mul(s0, s0)
        x4 = F.mul(x2, x2)
        x5 = F.mul(x4, s0)
        full = jnp.concatenate([x5, st[..., 1:, :]], axis=-2)
        return F.mul_acc(mds, full[..., None, :, :]), jnp.stack([x2, x4, x5], axis=-2)

    st, ys_a = lax.scan(full_body, st, ark[:half])
    st, ys_b = lax.scan(part_body, st, ark[half : half + partial_r])
    _, ys_c = lax.scan(full_body, st, ark[half + partial_r :])

    S = W.shape[0]
    for ys, out in ((ys_a, out_a), (ys_b, out_b), (ys_c, out_c)):
        # ys: (R, S, L, e, 3, 16) -> (S, L, R, e, 3, 16) to match out (L, R, e, 3)
        vals = jnp.transpose(ys, (1, 2, 0, 3, 4, 5)).reshape(S, -1, 16)
        W = W.at[:, out.reshape(-1), :].set(vals)
    return W


@partial(jax.jit, donate_argnums=0)
def _iszero_stage(W, idx, c, out, one_mont, zero16):
    x = _eval_lc(W, idx, c)  # (S, L, 16) mont
    inv = F.inv(x)  # x^{p-2}, 0 -> 0
    z = jnp.where(F.is_zero(x)[..., None], one_mont, zero16)
    vals = jnp.stack([inv, z], axis=2)  # (S, L, 2, 16)
    S = W.shape[0]
    return W.at[:, out.reshape(-1), :].set(vals.reshape(S, -1, 16))


# ----------------------------------------------------------------------
# Host executor (exact Python-int interpretation of the tape)
# ----------------------------------------------------------------------


def execute_tape_host(r1cs, lo: int = 0, hi: int | None = None) -> np.ndarray:
    """Interpret the witness tape with Python ints: (hi-lo, n_wires) object.

    Used where compiling the batched device kernels is not worth it — tiny
    instances (the multi-chip dry run, unit tests) on hosts where the first
    XLA CPU compile of the stage kernels dominates wall clock.
    """
    from vimz_tpu.poseidon.params import circomlib_params

    if hi is None:
        hi = r1cs.inputs.shape[0]
    S = hi - lo
    W = np.zeros((S, r1cs.n_wires), dtype=object)
    W[:, 0] = 1
    W[:, 1 : 1 + r1cs.n_inputs] = r1cs.inputs[lo:hi]

    def ev(lc, s):
        return sum(W[s, w] * c for w, c in lc.terms.items()) % P

    for op in r1cs.tape:
        if op.kind == "mul":
            a, b = op.lcs
            for s in range(S):
                W[s, op.out] = ev(a, s) * ev(b, s) % P
        elif op.kind == "bits":
            (x,) = op.lcs
            for s in range(S):
                v = ev(x, s)
                for i in range(op.meta):
                    W[s, op.out + i] = (v >> i) & 1
        elif op.kind == "iszero":
            (x,) = op.lcs
            for s in range(S):
                v = ev(x, s)
                W[s, op.out] = pow(v, P - 2, P) if v else 0
                W[s, op.out + 1] = 0 if v else 1
        elif op.kind == "perm":
            p = circomlib_params(op.meta)
            t, half = p.t, p.full_rounds // 2
            for s in range(S):
                state = [ev(lc, s) for lc in op.lcs]
                w = op.out
                for r in range(p.rounds):
                    state = [(v + p.ark[r][i]) % P for i, v in enumerate(state)]
                    if r < half or r >= half + p.partial_rounds:
                        for i in range(t):
                            x = state[i]
                            x2 = x * x % P
                            x4 = x2 * x2 % P
                            x5 = x4 * x % P
                            W[s, w : w + 3] = [x2, x4, x5]
                            state[i] = x5
                            w += 3
                    else:
                        x = state[0]
                        x2 = x * x % P
                        x4 = x2 * x2 % P
                        x5 = x4 * x % P
                        W[s, w : w + 3] = [x2, x4, x5]
                        state[0] = x5
                        w += 3
                    state = [
                        sum(state[j] * p.mds[i][j] for j in range(t)) % P
                        for i in range(t)
                    ]
        else:  # pragma: no cover
            raise ValueError(f"unknown op kind {op.kind}")
    return W


# ----------------------------------------------------------------------
# Executor
# ----------------------------------------------------------------------


_PERM_CONSTS: dict[int, dict] = {}


def _perm_consts(n_inputs: int) -> dict:
    """Montgomery-form ark/mds device arrays for one circomlib profile."""
    if n_inputs not in _PERM_CONSTS:
        from vimz_tpu.poseidon.params import circomlib_params

        p = circomlib_params(n_inputs)
        ark = np.asarray(
            [[F.to_limbs_mont(v) for v in row] for row in p.ark], dtype=np.uint32
        )
        mds = np.asarray(
            [[F.to_limbs_mont(v) for v in row] for row in p.mds], dtype=np.uint32
        )
        _PERM_CONSTS[n_inputs] = dict(ark=jnp.asarray(ark), mds=jnp.asarray(mds))
    return _PERM_CONSTS[n_inputs]


def _device_stages(r1cs) -> list[dict]:
    stages = getattr(r1cs, "_stages", None)
    if stages is None:
        packed = pack_stages(r1cs.tape, r1cs.n_wires)
        stages = [
            {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v) for k, v in st.items()}
            for st in packed
        ]
        r1cs._stages = stages
    return stages


def execute_tape(r1cs, lo: int = 0, hi: int | None = None, sharding=None) -> jnp.ndarray:
    """Compute the witness matrix for fold steps [lo, hi) on device.

    Returns (hi-lo, n_wires + 1, 16) uint32 Montgomery limbs: wire 0 = 1,
    wires 1..n_inputs = the provided inputs, remaining wires per the tape.
    The final scratch column (index n_wires) is kept — slicing it off would
    copy the multi-GB buffer; consumers index wires < n_wires and ignore it.

    Callers chunk over steps (the fold prover uses ~128-step chunks) so the
    peak per-stage gather intermediates stay bounded at HD/4K scale.
    """
    stages = _device_stages(r1cs)

    if hi is None:
        hi = r1cs.inputs.shape[0]
    n = r1cs.n_wires
    one_mont = jnp.asarray(F.one_mont)
    zero16 = jnp.zeros(16, dtype=jnp.uint32)

    W = jnp.zeros((hi - lo, n + 1, 16), dtype=jnp.uint32)
    if sharding is not None:
        # Step-axis sharding over a device mesh: every stage kernel below is
        # batched over steps, so XLA partitions them SPMD with no collectives.
        W = jax.device_put(W, sharding)
    W = W.at[:, 0, :].set(one_mont)
    in_mont = F.to_mont_j(jnp.asarray(F.to_limbs(r1cs.inputs[lo:hi])))
    W = W.at[:, 1 : 1 + r1cs.n_inputs, :].set(in_mont)

    for st in stages:
        if st["kind"] == "mul":
            W = _mul_stage(W, st["idxa"], st["ca"], st["idxb"], st["cb"], st["out"])
        elif st["kind"] == "bits":
            W = _bits_stage(W, st["idx"], st["c"], st["out"], one_mont, zero16, st["n"])
        elif st["kind"] == "perm":
            consts = _perm_consts(st["n_inputs"])
            W = _perm_stage(
                W, st["idx"], st["c"], st["out_a"], st["out_b"], st["out_c"],
                consts["ark"], consts["mds"],
            )
        else:
            W = _iszero_stage(W, st["idx"], st["c"], st["out"], one_mont, zero16)
    return W
