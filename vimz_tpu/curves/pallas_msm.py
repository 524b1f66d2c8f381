"""Pallas-accelerated Pippenger MSM (TPU hot path).

Same algorithm as BatchedCurve.msm (value dedup -> per-window digit sort ->
lockstep bucket-run walk -> weighted bucket sum), rebuilt around the fused
Pallas EC kernels (fields/pallas_field.py) and restructured so the serial
hot loops issue ONE fused kernel per EC add instead of ~3000 tiny XLA ops:

- points ride in limb-major (B, 16, N) layout end to end (bases are
  transposed once and cached);
- the dedup segmented scan's adds run at full (B*N) lane width in Pallas
  (10x the XLA limb path's throughput);
- the bucket-run walk processes ALL windows concurrently: lanes =
  B * n_windows * n_buckets, iterations = max run length (bounded by the
  dedup), with one Pallas add per iteration.

Results are bit-identical to BatchedCurve.msm (same group sums; verified
by tests/test_pallas_field.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vimz_tpu.fields.pallas_field import PallasCurve


def _ks_levels(n: int) -> int:
    return max(0, (n - 1).bit_length())


class PallasMsm:
    """MSM engine over one shared base set, limb-major on device."""

    def __init__(self, curve_ref, field, bases_nm):
        """bases_nm: (N, 16) Montgomery limb (normal layout) base points dict."""
        from vimz_tpu.curves.curve import BatchedCurve

        self.pc = PallasCurve(field, curve_ref.b)
        # narrow-lane XLA curve for the bucket tails, over the SAME curve
        # this engine was instantiated for (grumpkin engines must not
        # silently compute with bn254 constants).
        self.bc = BatchedCurve(curve_ref, field)
        self.N = bases_nm["x"].shape[0]
        # (16, N) limb-major bases, resident on device
        self.bases_lm = {
            k: jnp.asarray(jnp.swapaxes(v, 0, 1)) for k, v in bases_nm.items()
        }

    # -- batched pallas EC add over (B, 16, L) ---------------------------

    def _add3(self, P, Q):
        """Elementwise point add on (B, 16, L) stacks."""
        B, _, L = P["x"].shape
        # NOTE: (B,16,L) -> (16, B*L) requires axis swap, not reshape:
        swap = lambda d: {
            k: jnp.swapaxes(v, 0, 1).reshape(16, B * L) for k, v in d.items()
        }
        unswap = lambda d: {
            k: jnp.swapaxes(v.reshape(16, B, L), 0, 1) for k, v in d.items()
        }
        return unswap(self.pc.add(swap(P), swap(Q)))

    def _infinity3(self, B, L):
        inf = self.pc.infinity(B * L)
        return {k: jnp.swapaxes(v.reshape(16, B, L), 0, 1) for k, v in inf.items()}

    # -- dedup -----------------------------------------------------------

    def _dedup(self, scalars):
        """(B, N, 16) std scalars -> (scalars', points' (B,16,N)) with one
        representative lane per distinct value (others zeroed)."""
        B, N, _ = scalars.shape
        mix = scalars[:, :, 0]
        for j in range(1, 16):
            mix = mix * jnp.uint32(0x9E3779B1) + scalars[:, :, j]
        order = jnp.argsort(mix, axis=1)  # (B, N)
        sc = jnp.take_along_axis(scalars, order[:, :, None], axis=1)
        # gather shared bases per instance: (16, B, N) -> (B, 16, N)
        pts = {
            k: jnp.swapaxes(self.bases_lm[k][:, order], 0, 1)
            for k in self.bases_lm
        }
        neq = jnp.any(sc[:, 1:] != sc[:, :-1], axis=-1)
        starts = jnp.concatenate(
            [jnp.ones((B, 1), dtype=bool), neq], axis=1
        )  # (B, N)
        # Cap the scan depth: force segment starts on 4096-lane boundaries,
        # so 12 levels complete every segment. A value with multiplicity m
        # then keeps ceil(m/4096) representative lanes instead of one —
        # bucket runs grow by at most N/4096 (~38), which the walk absorbs,
        # and the scan sheds a third of its full-width EC levels.
        block_start = (jnp.arange(N, dtype=jnp.uint32) & jnp.uint32(4095)) == 0
        starts = starts | block_start[None, :]

        inf = self._infinity3(B, N)
        ident_blk = jnp.ones((B, N), dtype=bool)

        carry = dict(pts)
        carry["blk"] = starts

        def level(k, cur):
            shift = jnp.int32(1) << k

            def shifted(arr, fill):
                full = jnp.concatenate([fill, arr], axis=-1)
                return lax.dynamic_slice_in_dim(
                    full, jnp.int32(N) - shift, N, arr.ndim - 1
                )

            part = {key: shifted(cur[key], inf[key]) for key in ("x", "y", "z")}
            part_blk = shifted(cur["blk"], ident_blk)
            s = self._add3({k: cur[k] for k in ("x", "y", "z")}, part)
            take = cur["blk"][:, None, :]
            out = {k: jnp.where(take, cur[k], s[k]) for k in ("x", "y", "z")}
            out["blk"] = cur["blk"] | part_blk
            return out

        out = lax.fori_loop(0, min(_ks_levels(N), 12), level, carry)
        is_end = jnp.concatenate(
            [starts[:, 1:], jnp.ones((B, 1), dtype=bool)], axis=1
        )
        pts_out = {
            k: jnp.where(is_end[:, None, :], out[k], inf[k])
            for k in ("x", "y", "z")
        }
        sc_out = jnp.where(is_end[:, :, None], sc, jnp.zeros_like(sc))
        return sc_out, pts_out

    # -- masked subset sum (bit-wire commitments) ------------------------

    @partial(jax.jit, static_argnums=0)
    def masked_sum(self, mask) -> dict:
        """sum_i mask[b, i] * G_i for 0/1 masks: (B, N) -> (B,) points.

        Work-optimal halving tree over (B, 16, width) stacks with the fused
        Pallas add at every level — the leaf-commitment fast path for
        bit-valued witness wires (the XLA masked tree moved every limb
        intermediate through HBM; this one is ~10x faster)."""
        B, N = mask.shape
        np2 = 1 << max(0, (N - 1).bit_length())
        inf = self._infinity3(B, np2)
        keep = (mask == 1)[:, None, :]
        P = {
            k: jnp.concatenate(
                [
                    jnp.where(keep, jnp.broadcast_to(self.bases_lm[k][None], (B, 16, N)), inf[k][:, :, :N]),
                    inf[k][:, :, : np2 - N],
                ],
                axis=2,
            )
            for k in ("x", "y", "z")
        }
        w = np2
        while w > 1:
            half = w // 2
            P = self._add3(
                {k: v[:, :, :half] for k, v in P.items()},
                {k: v[:, :, half : 2 * half] for k, v in P.items()},
            )
            w = half
        return {k: v[:, :, 0] for k, v in P.items()}

    # -- main ------------------------------------------------------------

    @partial(jax.jit, static_argnums=(0, 2))
    def msm_many(self, scalars, c: int = 8) -> dict:
        """(B, N, 16) standard-form scalars -> (B,) points, normal layout
        {x,y,z: (B, 16)} (Montgomery projective)."""
        B, N, _ = scalars.shape
        n_windows = 256 // c
        n_buckets = 1 << c
        W = n_windows

        scalars, pts = self._dedup(scalars)

        # all windows' digits: (B, W, N)
        digits = []
        for w in range(n_windows):
            bit0 = w * c
            digits.append((scalars[:, :, bit0 // 16] >> (bit0 % 16)) & (n_buckets - 1))
        digits = jnp.stack(digits, axis=1)

        order = jnp.argsort(digits, axis=2)  # (B, W, N)
        d_sorted = jnp.take_along_axis(digits, order, axis=2).astype(jnp.int32)
        bucket_ids = jnp.arange(n_buckets, dtype=jnp.int32)
        start = jax.vmap(jax.vmap(lambda d: jnp.searchsorted(d, bucket_ids, side="left")))(d_sorted)
        end = jax.vmap(jax.vmap(lambda d: jnp.searchsorted(d, bucket_ids, side="right")))(d_sorted)
        length = jnp.where(bucket_ids[None, None, :] == 0, 0, end - start)  # (B, W, 2^c)

        def walk(w_lo: int, w_hi: int):
            """Lockstep bucket-run walk over windows [w_lo, w_hi)."""
            nw = w_hi - w_lo
            st = start[:, w_lo:w_hi]
            ln = length[:, w_lo:w_hi]
            od = order[:, w_lo:w_hi]
            acc = self._infinity3(B, nw * n_buckets)
            max_len = jnp.max(ln)

            def body(t, acc):
                idx = jnp.minimum(st + t, N - 1)  # (B, nw, 2^c)
                gidx = jnp.take_along_axis(od, idx, axis=2)  # into UNsorted pts
                flat = gidx.reshape(B, nw * n_buckets)
                p = {
                    k: jnp.take_along_axis(pts[k], flat[:, None, :], axis=2)
                    for k in ("x", "y", "z")
                }
                added = self._add3(acc, p)
                valid = (t < ln).reshape(B, 1, nw * n_buckets)
                return {k: jnp.where(valid, added[k], acc[k]) for k in acc}

            out = lax.fori_loop(0, max_len, body, acc)
            return {k: v.reshape(B, 16, nw, n_buckets) for k, v in out.items()}

        # The TOP window walks separately: reduced (< p) scalars concentrate
        # its digits into ~modulus-top-byte buckets, so its max run is ~4x
        # the other windows' — lockstep with it would burn (W-1) idle
        # windows' lanes for the whole overhang.
        low = walk(0, n_windows - 1)
        top = walk(n_windows - 1, n_windows)
        buckets = {
            k: jnp.concatenate([low[k], top[k]], axis=2) for k in low
        }  # (B, 16, W, 2^c)

        # weighted bucket sum per window (XLA path — narrow lanes):
        bc = self.bc
        bk_nm = {
            k: jnp.transpose(buckets[k], (0, 2, 3, 1)) for k in buckets
        }  # (B, W, 2^c, 16)

        def bucket_body(i, carry):
            running, total = carry
            bidx = n_buckets - 1 - i
            bp = {k: bk_nm[k][:, :, bidx] for k in bk_nm}
            running = bc.add(running, bp)
            total = bc.add(total, running)
            return running, total

        inf2 = {
            k: jnp.broadcast_to(v, (B, W, 16)).copy()
            for k, v in bc.infinity((1, 1)).items()
        }
        _, window_sums = lax.fori_loop(
            0, n_buckets - 1, bucket_body, (inf2, inf2)
        )

        # combine windows: acc = 2^c * acc + window_sum, top window down
        accw = {k: window_sums[k][:, n_windows - 1] for k in window_sums}

        def combine(i, accw):
            w = n_windows - 2 - i
            accw = lax.fori_loop(0, c, lambda _, a: bc.double(a), accw)
            return bc.add(accw, {k: window_sums[k][:, w] for k in window_sums})

        return lax.fori_loop(0, n_windows - 1, combine, accw)
