"""Fixed-base subset-table MSM (the round-5 commitment engine).

Pedersen commitments always use the same base prefix, so precompute, for
every group of t=8 consecutive bases, the 256 subset sums
T_g[m] = sum_{j: m_j = 1} G_{8g+j}. An MSM then decomposes by scalar BIT
ROWS: sum_i s_i G_i = sum_b 2^b (sum_g T_g[mask_g(b)]) where mask_g(b)
packs bit b of the group's 8 scalars — a direct table gather plus a
log-depth EC tree sum per bit row, then a 254-step Horner combine.

Why this beats the sort-based Pippenger walk (curves/pallas_msm.py) for
this workload:
- NO per-window argsort (measured: several seconds per batch at bench
  shapes), no searchsorted, no dedup scan (12 full-width EC levels);
- NO data-dependent trip counts: duplicate-heavy adversarial scalars cost
  exactly the same as random ones (the walk's worst case was a ~100x
  deadline blow-up, the round-1..3 bench crash);
- fewer EC adds: ~254 * N/8 per instance vs the walk's 32 * N plus dedup
  overhead (~1.6x), and zero idle lanes;
- the tree sum runs INSIDE one Pallas kernel (VMEM-local levels), so the
  per-level intermediates never touch HBM.

Memory: the table is 32x the base set (256 entries per 8 bases) — ~470 MB
for the 153k constraint bases, ~410 MB for the bit-wire bases; build cost
is one 255-step gray-code add chain over (16, G) lanes (<1 s on chip).

Bit-valued scalar sets (witness bit wires) use the same table with a
single bit row (masked_sum) — an 8x add reduction over the halving tree.

Differentially tested against the exact host curve and the XLA/Pallas
engines in tests/test_pallas_field.py (CPU via interpret mode + TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimz_tpu.fields.pallas_field import (
    PallasCurve,
    PallasField,
    _CONST_ROWS,
    _ec_add_body,
    _interpret,
)

T_BITS = 8  # bases per group / bits per table index
N_BITS = 256  # scalar bit rows (top two are zero for BN254 scalars)
# lanes per reduction block — MUST equal pallas_field.LANES: the packed
# constant tensor is materialized at that lane width and Mosaic cannot
# broadcast a narrower block along lanes inside a kernel.
from vimz_tpu.fields.pallas_field import LANES as BLK


def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class PallasTableMsm:
    """MSM engine over one fixed base set via subset tables."""

    def __init__(self, curve_ref, field, bases_nm):
        """bases_nm: (N, 16) Montgomery-limb projective point dict."""
        self.pc = PallasCurve(field, curve_ref.b)
        self.f = field
        self.N = bases_nm["x"].shape[0]
        self.G = (self.N + T_BITS - 1) // T_BITS  # groups (last may be short)
        # reduction-padded group count: multiple of BLK
        self.G2 = ((self.G + BLK - 1) // BLK) * BLK
        self.table = self._build_table(bases_nm)  # (16, G*256 + 1), +1 = inf

    # -- table build -----------------------------------------------------

    def _build_table(self, bases_nm):
        """Subset sums by popcount level: every mask m of popcount k is
        T[m ^ topbit(m)] + G_topbit — all masks of one level are
        independent, so the build is 8 batched adds. The WHOLE build is one
        jit: issued eagerly, each level's gather/scatter paid ~15 s of
        chipless-AOT compile on the tunneled platform (259 s total)."""
        pcf = self.pc
        G, N = self.G, self.N
        pad = G * T_BITS - N

        @jax.jit
        def build(bx, by, bz):
            inf = pcf.infinity(max(pad, 1))
            bl = {}
            for k, v in (("x", bx), ("y", by), ("z", bz)):
                v = jnp.swapaxes(v, 0, 1)  # (16, N)
                if pad:
                    v = jnp.concatenate([v, inf[k][:, :pad]], axis=1)
                bl[k] = v.reshape(16, G, T_BITS)

            tab = {k: jnp.zeros((16, 256, G), jnp.uint32) for k in ("x", "y", "z")}
            inf_row = pcf.infinity(G)
            for k in ("x", "y", "z"):
                tab[k] = tab[k].at[:, 0, :].set(inf_row[k])
            LVL = 70  # max C(8,k): all levels padded to ONE kernel shape
            for lvl in range(1, T_BITS + 1):
                masks = [m for m in range(256) if bin(m).count("1") == lvl]
                top = [m.bit_length() - 1 for m in masks]
                prev = [m ^ (1 << t) for m, t in zip(masks, top)]
                nk = len(masks)
                # pad the level to LVL masks by repeating mask 0 (discarded)
                prev_p = prev + [0] * (LVL - nk)
                top_p = top + [0] * (LVL - nk)
                P = {k: tab[k][:, prev_p, :].reshape(16, LVL * G) for k in tab}
                Q = {
                    k: jnp.swapaxes(bl[k][:, :, top_p], 1, 2).reshape(16, LVL * G)
                    for k in bl
                }
                S = pcf.add(P, Q)
                for k in tab:
                    tab[k] = tab[k].at[:, masks, :].set(
                        S[k][:, : nk * G].reshape(16, nk, G)
                    )
            # (16, 256, G) -> flat (16, G*256) indexed by g*256 + mask,
            # plus one trailing infinity slot for padded groups
            out = []
            for k in ("x", "y", "z"):
                flat = jnp.swapaxes(tab[k], 1, 2).reshape(16, G * 256)
                out.append(jnp.concatenate([flat, inf_row[k][:, :1]], axis=1))
            return tuple(out)

        x, y, z = build(bases_nm["x"], bases_nm["y"], bases_nm["z"])
        return {"x": x, "y": y, "z": z}

    # -- in-kernel block tree reduction ----------------------------------

    OUTW = 128  # kernel output width (Mosaic: last block dim must be 128)

    def _reduce_blocks(self, gathered, n_lanes: int):
        """(16, L) limb-major points, L = n_blocks*BLK ->
        (16, n_blocks*OUTW): BLK/OUTW-fold EC tree inside ONE kernel
        (VMEM-local levels; Mosaic caps the output block at (16, 128))."""
        n_blocks = n_lanes // BLK

        def kernel(consts, x, y, z, ox, oy, oz):
            call = consts[:]
            P = (x[:], y[:], z[:])
            w = BLK
            while w > self.OUTW:
                half = w // 2
                # consts re-sliced per level: field-op broadcasts require the
                # constant rows at exactly the operand lane width
                F = PallasField(call[:, :half])
                lo = tuple(c[:, :half] for c in P)
                hi = tuple(c[:, half:w] for c in P)
                P = _ec_add_body(F, lo, hi)
                w = half
            ox[:], oy[:], oz[:] = P

        spec = pl.BlockSpec((16, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec(
            (16, self.OUTW), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec(
            (_CONST_ROWS, BLK), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        outs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[cspec] + [spec] * 3,
            out_specs=[ospec] * 3,
            out_shape=[jax.ShapeDtypeStruct((16, n_blocks * self.OUTW), jnp.uint32)] * 3,
            interpret=_interpret(),
        )(self.pc.consts, *[gathered[k] for k in ("x", "y", "z")])
        return dict(zip(("x", "y", "z"), outs))

    # -- bit-row sums ----------------------------------------------------

    def _chunk_indices(self, sg, limb_idx):
        """sg: (B, G, 8, 16) grouped std limbs; limb_idx: traced int.
        -> int32 (B, 16, G2) flat table indices for that limb's 16 bits."""
        B, G = sg.shape[0], self.G
        G2 = self.G2
        limb = lax.dynamic_index_in_dim(sg, limb_idx, 3, keepdims=False)
        rows = []
        for jj in range(16):  # bit within the limb
            bit = (limb >> jj) & 1  # (B, G, 8)
            idx = jnp.zeros((B, G), jnp.uint32)
            for j in range(T_BITS):  # group-member position
                idx = idx | (bit[:, :, j] << j)
            rows.append(idx)
        idx = jnp.stack(rows, axis=1).astype(jnp.int32)  # (B, 16, G)
        base = jnp.arange(G, dtype=jnp.int32) * 256
        idx = idx + base[None, None, :]
        if G2 != G:
            fill = jnp.full((B, 16, G2 - G), G * 256, jnp.int32)
            idx = jnp.concatenate([idx, fill], axis=2)
        return idx

    def _rows_sum(self, idx, table):
        """(B, nb, G2) indices -> (B, nb) points {x,y,z: (16, B, nb)}.

        `table` is threaded through as a traced ARGUMENT: closing over the
        ~1 GB table arrays embeds them as constants in the compiled module
        (the axon compile service rejects the upload with HTTP 413)."""
        B, nb, G2 = idx.shape
        flat = idx.reshape(B * nb * G2)
        gathered = {k: table[k][:, flat] for k in table}
        part = self._reduce_blocks(gathered, B * nb * G2)
        nb2 = (G2 // BLK) * self.OUTW
        if nb2 > 1:
            # second stage: small tree per (B, nb) over nb2 partials
            p = {k: v.reshape(16, B * nb, nb2) for k, v in part.items()}
            np2 = _pow2(nb2)
            if np2 != nb2:
                inf = self.pc.infinity(B * nb * (np2 - nb2))
                p = {
                    k: jnp.concatenate(
                        [v, inf[k].reshape(16, B * nb, np2 - nb2)], axis=2
                    )
                    for k, v in p.items()
                }
            w = np2
            while w > 1:
                half = w // 2
                lo = {k: v[:, :, :half].reshape(16, -1) for k, v in p.items()}
                hi = {k: v[:, :, half:].reshape(16, -1) for k, v in p.items()}
                s = self.pc.add(lo, hi)
                p = {k: v.reshape(16, B * nb, half) for k, v in s.items()}
                w = half
            part = {k: v.reshape(16, B * nb) for k, v in p.items()}
        return {k: v.reshape(16, B, nb) for k, v in part.items()}

    # -- public API ------------------------------------------------------

    def masked_sum(self, mask) -> dict:
        return self._masked_sum_jit(
            mask, self.table["x"], self.table["y"], self.table["z"]
        )

    @partial(jax.jit, static_argnums=0)
    def _masked_sum_jit(self, mask, tx, ty, tz) -> dict:
        """sum_i mask[b, i] * G_i for 0/1 masks: (B, N) -> (B,) points in
        normal layout {x,y,z: (B, 16)} — one table row per instance."""
        table = {"x": tx, "y": ty, "z": tz}
        B, N = mask.shape
        G, G2 = self.G, self.G2
        pad = G * T_BITS - N
        m = mask.astype(jnp.uint32)
        if pad:
            m = jnp.concatenate([m, jnp.zeros((B, pad), jnp.uint32)], axis=1)
        mg = m.reshape(B, G, T_BITS)
        idx = jnp.zeros((B, G), jnp.uint32)
        for j in range(T_BITS):
            idx = idx | (mg[:, :, j] << j)
        idx = idx.astype(jnp.int32) + (
            jnp.arange(G, dtype=jnp.int32) * 256
        )[None, :]
        if G2 != G:
            fill = jnp.full((B, G2 - G), G * 256, jnp.int32)
            idx = jnp.concatenate([idx, fill], axis=1)
        s = self._rows_sum(idx[:, None, :], table)  # (16, B, 1)
        return {k: jnp.swapaxes(v[:, :, 0], 0, 1) for k, v in s.items()}

    def msm_many(self, scalars) -> dict:
        return self._msm_many_jit(
            scalars, self.table["x"], self.table["y"], self.table["z"]
        )

    @partial(jax.jit, static_argnums=0)
    def _msm_many_jit(self, scalars, tx, ty, tz) -> dict:
        """(B, N, 16) standard-form scalars -> (B,) points, normal layout
        (Montgomery projective) — the same contract as PallasMsm.msm_many.

        One fori_loop over the 16 scalar limbs, top-down (unrolling the
        chunks inlined ~650 EC-add bodies into the graph — minutes of TPU
        compile and hours of interpret-mode XLA CPU compile)."""
        table = {"x": tx, "y": ty, "z": tz}
        B = scalars.shape[0]
        G, G2 = self.G, self.G2
        pad = G * T_BITS - self.N
        if pad:
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((B, pad, 16), scalars.dtype)], axis=1
            )
        sg = scalars.reshape(B, G, T_BITS, 16)

        def body(i, acc):
            c = 15 - i  # limb index, top-down
            s = self._rows_sum(self._chunk_indices(sg, c), table)  # (16, B, 16)

            # chunk value w = sum_j 2^j s_j via Horner from bit 15 down
            def horner(j, w):
                w = self.pc.double(w)
                return self.pc.add(
                    w,
                    {k: lax.dynamic_index_in_dim(v, 14 - j, 2, keepdims=False)
                     for k, v in s.items()},
                )

            w = {k: v[:, :, 15] for k, v in s.items()}
            w = lax.fori_loop(0, 15, horner, w)

            def dbl(_, a):
                return self.pc.double(a)

            acc = lax.fori_loop(0, 16, dbl, acc)
            return self.pc.add(acc, w)

        acc = {k: v for k, v in self.pc.infinity(B).items()}
        acc = lax.fori_loop(0, 16, body, acc)
        return {k: jnp.swapaxes(v, 0, 1) for k, v in acc.items()}
