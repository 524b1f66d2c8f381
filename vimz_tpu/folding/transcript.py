"""Fiat–Shamir transcript for the fold tree (Poseidon-based).

Challenges bind the full fold structure: each instance has a digest
(absorbing u, public IO, and both commitments), and each tree node's
challenge absorbs the two child digests plus the cross-term commitment.
Commitment coordinates live in Fq; they are absorbed as two 128-bit halves
each, which injectively embeds them into Fr.

This is this framework's own transcript design (the reference delegates to
sonobe's Poseidon transcript); proofs are verified by this framework's own
verifier, so the only requirements are determinism and domain separation.
"""

from __future__ import annotations

import numpy as np

from vimz_tpu.fields.prime import P_FR
from vimz_tpu.poseidon.pyref import circom_poseidon

MASK128 = (1 << 128) - 1

DS_INSTANCE = int.from_bytes(b"vimz-tpu/instance/v1", "little")
DS_FOLD = int.from_bytes(b"vimz-tpu/fold/v1", "little")


def _chain(init: int, values) -> int:
    acc = init % P_FR
    for v in values:
        acc = circom_poseidon([acc, int(v) % P_FR])
    return acc


def point_parts(pt) -> list[int]:
    """Affine point (x, y) or None -> 4 Fr-embeddable values."""
    if pt is None:
        return [0, 0, 0, 0]
    x, y = pt
    return [x & MASK128, x >> 128, y & MASK128, y >> 128]


def instance_digest(u: int, x: list[int], comm_w, comm_e) -> int:
    return _chain(DS_INSTANCE, [u, *x, *point_parts(comm_w), *point_parts(comm_e)])


def fold_challenge(d_left: int, d_right: int, comm_t) -> int:
    return _chain(DS_FOLD, [d_left, d_right, *point_parts(comm_t)])


# ----------------------------------------------------------------------
# Batched device evaluation (bit-identical to the scalar functions above)
# ----------------------------------------------------------------------

_P2 = None


def _batched_p2():
    global _P2
    if _P2 is None:
        from vimz_tpu.poseidon.params import circomlib_params
        from vimz_tpu.poseidon.sponge import BatchedPoseidon

        _P2 = BatchedPoseidon(circomlib_params(2))
    return _P2


def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


BATCH = 512  # fixed device batch: ONE compiled chain kernel per row length


def batch_chain(init: int, values: np.ndarray) -> np.ndarray:
    """Batched `_chain`: (B, L) object ints -> (B,) object ints, on device.

    Rows are processed in fixed BATCH-row chunks (tail zero-padded), so the
    whole fold tree — every prover chunk level and every verifier level —
    reuses ONE compiled kernel shape per row length L (instance digests
    L=1+n_pub+8, fold challenges L=6). Shape-per-level padding used to
    compile a fresh multi-minute scan kernel for each tree level.
    """
    B, L = values.shape
    # Small batches: the pure-Python chain beats compiling a fresh device
    # kernel shape (tests / dry runs / late tree levels).
    if B * L <= 512:
        return np.array([_chain(init, row) for row in values], dtype=object)

    import jax.numpy as jnp

    from vimz_tpu.fields.limbs import FR_LIMBS as f

    run = _chain_jit()
    init_limbs = jnp.asarray(f.to_limbs(np.array(init % P_FR, dtype=object)))
    outs = []
    for lo in range(0, B, BATCH):
        chunk = values[lo : lo + BATCH]
        vals = np.zeros((BATCH, L), dtype=object)
        vals[: len(chunk)] = chunk
        out = run(jnp.asarray(f.to_limbs(vals)), init_limbs)
        outs.append(f.from_limbs_mont(np.asarray(out))[: len(chunk)])
    return np.concatenate(outs)


_CHAIN_JIT = None


def _chain_jit():
    """One jitted function for the whole chain computation (to_mont + scan):
    the eager formulation dispatched hundreds of tiny ops per call — over
    the tunneled TPU that cost ~minutes per fresh process."""
    global _CHAIN_JIT
    if _CHAIN_JIT is None:
        import jax
        import jax.numpy as jnp
        from jax import lax

        from vimz_tpu.fields.limbs import FR_LIMBS as f

        p2 = _batched_p2()

        @jax.jit
        def run(vals_std, init_limbs):
            vm = f.to_mont(vals_std)  # (BATCH, L, 16)
            acc = f.to_mont(jnp.broadcast_to(init_limbs, (vals_std.shape[0], 16)))

            def body(acc, v):
                return p2.circom_hash(jnp.stack([acc, v], axis=-2)), None

            acc, _ = lax.scan(body, acc, jnp.moveaxis(vm, 1, 0))
            return acc

        _CHAIN_JIT = run
    return _CHAIN_JIT


def instance_digests_batch(us: list[int], xs: np.ndarray, comm_ws: list, comm_es: list):
    """Batched instance_digest over B instances (xs: (B, n_pub) object)."""
    B = len(us)
    rows = [
        [us[i], *xs[i], *point_parts(comm_ws[i]), *point_parts(comm_es[i])]
        for i in range(B)
    ]
    return list(batch_chain(DS_INSTANCE, np.array(rows, dtype=object)))


def fold_challenges_batch(d_lefts: list[int], d_rights: list[int], comm_ts: list):
    """Batched fold_challenge over B pairs."""
    B = len(d_lefts)
    rows = [
        [d_lefts[i], d_rights[i], *point_parts(comm_ts[i])] for i in range(B)
    ]
    return list(batch_chain(DS_FOLD, np.array(rows, dtype=object)))
