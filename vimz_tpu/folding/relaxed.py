"""Device-resident relaxed R1CS: ELL matrices, matvecs, cross terms.

The reference's folding backends evaluate constraint matrices through
nova-snark / sonobe sparse structures one step at a time
(vimz/src/sonobe_backend/folding.rs:52-65). Here the matrices live on device
in packed ELL form (gather indices + Montgomery coefficients) so that
A/B/C matvecs — the core of Nova cross-term computation — run as batched
gather + lazy-reduced mul_acc over many fold pairs at once.

Rows are bucketed by LC width (most constraint rows have <= 8 terms; bit
recomposition rows have hundreds), and each bucket is processed in
fixed-size row blocks under `lax.map`, so peak gather memory stays bounded
at HD/4K scale instead of materializing (batch, n_constraints, K, 16).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vimz_tpu.fields.limbs import FR_LIMBS
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.r1cs.builder import R1CS

# (max LC terms, row block size) per bucket — block sizes keep the gathered
# (batch, block, K, 16) intermediate around a few hundred MB at batch ~64.
_BUCKETS = ((4, 4096), (16, 2048), (64, 512), (256, 128), (2048, 16))

# Constraint-axis block for elementwise field ops over (batch, n, 16) arrays.
# One fused limb-mul holds ~double-width column temporaries; blocking keeps
# them at (batch, blk, 33) instead of (batch, 1.5e5, 33) — the round-2 OOM
# was exactly this: jit(cross_term) held twenty ~600 MB shift/mask temps.
_EW_BLOCK = 8192


def _map_blocks(fn, arrays, blk: int = _EW_BLOCK):
    """Apply an elementwise limb fn over axis -2 in lax.map blocks.

    arrays: tuple of (..., n, 16) with identical leading shapes. Captured
    closure constants (e.g. broadcast scalars) are fine.
    """
    n = arrays[0].shape[-2]
    pad = (-n) % blk
    if n + pad == blk:
        return fn(*arrays)
    stacked = []
    for a in arrays:
        if pad:
            cfg = [(0, 0)] * (a.ndim - 2) + [(0, pad), (0, 0)]
            a = jnp.pad(a, cfg)
        s = a.reshape(a.shape[:-2] + (-1, blk, 16))
        stacked.append(jnp.moveaxis(s, -3, 0))
    out = lax.map(lambda xs: fn(*xs), tuple(stacked))
    out = jnp.moveaxis(out, 0, -3)
    out = out.reshape(out.shape[:-3] + (n + pad, 16))
    return out[..., :n, :] if pad else out


def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class DeviceR1CS:
    """ELL-packed A, B, C matrices of a step circuit, on device."""

    def __init__(self, r1cs: R1CS):
        self.n_pub = r1cs.n_pub
        self.n_wires = r1cs.n_wires
        self.n_constraints = r1cs.n_constraints
        self.f = FR_LIMBS
        # The host-side ELL pack (Python per-term loops + object-int limb
        # conversion over ~1e6 coefficients) costs minutes per process at HD
        # scale but is deterministic per structure — cache it on disk keyed
        # by the structure cache key (set by circuits.synthesize).
        skey = getattr(r1cs, "structure_key", None)
        cached = None
        if skey is not None:
            from vimz_tpu.utils.cache import disk_load

            cached = disk_load(("ellpack-v1", skey))
        if cached is None:
            # which wires are 0/1-valued (bit decompositions, booleans): the
            # commitment layer uses this for its masked tree-sum fast path
            self.bit_mask = np.zeros(r1cs.n_wires, dtype=bool)
            for op in r1cs.tape:
                if op.kind == "bits":
                    self.bit_mask[op.out : op.out + op.n_out] = True
                elif op.kind == "iszero":
                    self.bit_mask[op.out + 1] = True
            host = {
                name: self._pack_host(rows)
                for name, rows in (
                    ("A", r1cs.a_rows), ("B", r1cs.b_rows), ("C", r1cs.c_rows)
                )
            }
            if skey is not None:
                from vimz_tpu.utils.cache import disk_save

                disk_save(
                    ("ellpack-v1", skey),
                    {"mats": host, "bit_mask": self.bit_mask},
                )
        else:
            host = cached["mats"]
            self.bit_mask = cached["bit_mask"]
        # Packed matrices are split into (device arrays, static shape meta):
        # the arrays are passed to the jitted kernels as ARGUMENTS, never as
        # closed-over constants — XLA constant-folds / lays out embedded
        # constants during compilation, and the ~40 MB coefficient tables
        # made jit(cross_term) take >10 minutes to compile per batch shape.
        self.mats = {name: self._to_device(pack) for name, pack in host.items()}
        # kept for the lazily-built transpose packs (compression SNARK)
        self._rows_src = {"A": r1cs.a_rows, "B": r1cs.b_rows, "C": r1cs.c_rows}
        self._t_pack_A = self._t_pack_B = self._t_pack_C = None

    @staticmethod
    def _to_device(pack):
        buckets, ms = pack
        return (
            tuple({k: jnp.asarray(v) for k, v in b.items()} for b in buckets),
            ms,
        )

    def _pack(self, rows: list[dict]):
        return self._to_device(self._pack_host(rows))

    def _pack_host(self, rows: list[dict]):
        """Bucket rows by LC width, pad each bucket to whole blocks.

        Returns (arrays, ms): `arrays` is a tuple of per-bucket dicts of
        HOST numpy arrays (picklable; `_to_device` uploads them and the
        jitted kernels take them as arguments) and `ms` the matching tuple
        of real row counts (static metadata)."""
        buckets = []
        ms = []
        order = sorted(range(len(rows)), key=lambda i: len(rows[i]))
        pos = 0
        for kmax, block in _BUCKETS:
            sel = []
            while pos < len(order) and len(rows[order[pos]]) <= kmax:
                sel.append(order[pos])
                pos += 1
            if not sel:
                continue
            K = _pow2(max(len(rows[i]) for i in sel) or 1)
            blk = min(block, _pow2(len(sel)))
            m = len(sel)
            mp = ((m + blk - 1) // blk) * blk
            idx = np.zeros((mp, K), dtype=np.int32)
            coeff = np.zeros((mp, K), dtype=object)
            for r, i in enumerate(sel):
                for j, (col, c) in enumerate(rows[i].items()):
                    idx[r, j] = col
                    coeff[r, j] = c
            coeff_limbs = self.f.to_limbs_mont(coeff)
            nb = mp // blk
            buckets.append(
                dict(
                    rows=np.asarray(sel, dtype=np.int32),
                    idx=idx.reshape(nb, blk, K),
                    coeff=np.asarray(coeff_limbs, dtype=np.uint32).reshape(
                        nb, blk, K, 16
                    ),
                )
            )
            ms.append(m)
        assert pos == len(rows), "row wider than the largest bucket"
        return tuple(buckets), tuple(ms)

    def _pack_transpose(self, name: str):
        """Column-major ELL pack of one matrix (built lazily, cached).

        Used by the compression SNARK's sumcheck #2, which needs
        M^T q = (sum_r M[r, c] * q[r])_c. Columns are split into segments of
        at most 2048 terms (the lazy-reduction bound); the kernel produces one
        partial per segment and `matvec_t` combines multi-segment columns.
        """
        attr = f"_t_pack_{name}"
        if getattr(self, attr, None) is not None:
            return getattr(self, attr)
        src = self._rows_src[name]
        cols: dict[int, list] = {}
        for r, row in enumerate(src):
            for c, v in row.items():
                cols.setdefault(c, []).append((r, v))
        seg_rows: list[dict] = []
        seg_col: list[int] = []
        MAXW = 2048
        for c in sorted(cols):
            terms = cols[c]
            for i in range(0, len(terms), MAXW):
                seg_rows.append(dict(terms[i : i + MAXW]))
                seg_col.append(c)
        packed = self._pack(seg_rows)
        # per-column segment gather table (n_wires, max_segs) into segment ids
        seg_col = np.asarray(seg_col, dtype=np.int64)
        n_segs = len(seg_rows)
        counts = np.zeros(self.n_wires, dtype=np.int64)
        for c in seg_col:
            counts[c] += 1
        max_segs = max(1, int(counts.max()) if len(counts) else 1)
        # index n_segs = a zero dummy slot
        table = np.full((self.n_wires, max_segs), n_segs, dtype=np.int32)
        fill = np.zeros(self.n_wires, dtype=np.int64)
        for s, c in enumerate(seg_col):
            table[c, fill[c]] = s
            fill[c] += 1
        out = dict(
            packed=packed,
            n_segs=n_segs,
            table=jnp.asarray(table),
        )
        setattr(self, attr, out)
        return out

    def matvec_t(self, q_mont, name: str):
        """q: (n_constraints, 16) Montgomery -> M^T q: (n_wires, 16)."""
        tp = self._pack_transpose(name)
        return self._matvec_t_jit(
            q_mont, tp["packed"][0], tp["table"],
            tp["packed"][1], tp["n_segs"],
        )

    @partial(jax.jit, static_argnums=(0, 4, 5))
    def _matvec_t_jit(self, q_mont, bks, table, ms: tuple, n_segs: int):
        f = self.f
        # Reuse the row kernel over segments: segment value = sum coeff * q[row].
        partials = jnp.zeros((n_segs + 1, 16), dtype=jnp.uint32)
        for bk, m in zip(bks, ms):
            def one_block(args):
                idx, coeff = args
                gathered = q_mont[idx, :]
                return f.mul_acc(coeff, gathered)

            res = lax.map(one_block, (bk["idx"], bk["coeff"]))
            res = res.reshape(-1, 16)[:m, :]
            partials = partials.at[bk["rows"], :].set(res)
        gathered = partials[table, :]  # (n_wires, max_segs, 16)
        out = gathered[:, 0, :]
        for s in range(1, gathered.shape[1]):
            out = f.add(out, gathered[:, s, :])
        return out

    def _matvec_impl(self, z_mont, bks, ms: tuple):
        """z: (..., n_wires, 16) Montgomery -> (..., n_constraints, 16)."""
        f = self.f
        batch = z_mont.shape[:-2]
        out = jnp.zeros(batch + (self.n_constraints, 16), dtype=jnp.uint32)
        for bk, m in zip(bks, ms):
            def one_block(args):
                idx, coeff = args  # (blk, K), (blk, K, 16)
                gathered = z_mont[..., idx, :]  # (..., blk, K, 16)
                return f.mul_acc(coeff, gathered)

            res = lax.map(one_block, (bk["idx"], bk["coeff"]))  # (nb, ..., blk, 16)
            res = jnp.moveaxis(res, 0, -3)  # (..., nb, blk, 16)
            res = res.reshape(batch + (-1, 16))[..., :m, :]
            out = out.at[..., bk["rows"], :].set(res)
        return out

    @partial(jax.jit, static_argnums=(0, 3))
    def _matvec_jit(self, z_mont, bks, ms: tuple):
        return self._matvec_impl(z_mont, bks, ms)

    def matvec(self, z_mont, name: str):
        bks, ms = self.mats[name]
        return self._matvec_jit(z_mont, bks, ms)

    def residual(self, z_mont, u_mont, e_mont):
        """Az*Bz - u*Cz - E (zero iff the relaxed instance is satisfied)."""
        mats = tuple(self.mats[n][0] for n in "ABC")
        ms = tuple(self.mats[n][1] for n in "ABC")
        return self._residual_jit(z_mont, u_mont, e_mont, mats, ms)

    @partial(jax.jit, static_argnums=(0, 5))
    def _residual_jit(self, z_mont, u_mont, e_mont, mats, ms):
        f = self.f
        az = self._matvec_impl(z_mont, mats[0], ms[0])
        bz = self._matvec_impl(z_mont, mats[1], ms[1])

        lhs = _map_blocks(f.mul, (az, bz))
        cz = self._matvec_impl(z_mont, mats[2], ms[2])
        return _map_blocks(
            lambda l, c, e: f.sub(l, f.add(f.mul(u_mont[..., None, :], c), e)),
            (lhs, cz, e_mont),
        )

    def cross_term(self, z1, u1, z2, u2):
        """Nova cross term:
        T = Az1*Bz2 + Az2*Bz1 - u1*Cz2 - u2*Cz1, shapes (..., n_constraints, 16).
        """
        mats = tuple(self.mats[n][0] for n in "ABC")
        ms = tuple(self.mats[n][1] for n in "ABC")
        return self._cross_term_jit(z1, u1, z2, u2, mats, ms)

    @partial(jax.jit, static_argnums=(0, 6))
    def _cross_term_jit(self, z1, u1, z2, u2, mats, ms):
        """The four A/B products are combined first so XLA can retire those
        matvec outputs before the C matvecs are live. The 8-way elementwise
        combine runs as ONE fused Pallas kernel on TPU (pallas_ew) — the
        XLA limb version costs ~2 s per 16-pair batch at HD widths."""
        from vimz_tpu.fields.pallas_ew import maybe_ew

        f = self.f
        az1 = self._matvec_impl(z1, mats[0], ms[0])
        bz1 = self._matvec_impl(z1, mats[1], ms[1])
        az2 = self._matvec_impl(z2, mats[0], ms[0])
        bz2 = self._matvec_impl(z2, mats[1], ms[1])
        cz1 = self._matvec_impl(z1, mats[2], ms[2])
        cz2 = self._matvec_impl(z2, mats[2], ms[2])
        ew = maybe_ew(f)
        if ew is not None:
            return ew.cross_combine(
                az1, bz2, az2, bz1, cz1, cz2,
                u1[..., None, :], u2[..., None, :],
            )
        t = _map_blocks(
            lambda a1, b2, a2, b1: f.add(f.mul(a1, b2), f.mul(a2, b1)),
            (az1, bz2, az2, bz1),
        )
        return _map_blocks(
            lambda tt, c1, c2: f.sub(
                f.sub(tt, f.mul(u1[..., None, :], c2)), f.mul(u2[..., None, :], c1)
            ),
            (t, cz1, cz2),
        )
