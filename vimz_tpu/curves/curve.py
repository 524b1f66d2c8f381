"""Elliptic curves for the folding prover: BN254 G1 and Grumpkin.

The reference's curve cycle (vimz/src/sonobe_backend/folding.rs:19-22) is
bn254/grumpkin; witness commitments are Pedersen MSMs over these groups.

Two implementations:

- `CurveRef`: Python-int affine reference (tests, generator derivation).
- `BatchedCurve`: vectorized projective arithmetic over limb arrays (JAX)
  using the RCB complete formulas (branch-free, infinity = (0 : y : 0)),
  plus a Pippenger MSM whose bucket accumulation uses sort + a lockstep
  bucket-run walk — the TPU-native replacement for the scatter-heavy GPU
  bucket pattern.

Curve equations: BN254 G1: y^2 = x^3 + 3 over Fq (order = P_FR);
Grumpkin: y^2 = x^3 - 17 over Fr (order = P_FQ).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vimz_tpu.fields.limbs import FQ_LIMBS, FR_LIMBS, LimbField
from vimz_tpu.fields.prime import FQ, FR, P_FQ, P_FR, PrimeField


# ----------------------------------------------------------------------
# Python-int reference
# ----------------------------------------------------------------------


def _sqrt_mod(a: int, p: int) -> int | None:
    """Modular square root (Tonelli–Shanks; fast path for p % 4 == 3)."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # Tonelli–Shanks
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


@dataclass
class CurveRef:
    """Short Weierstrass y^2 = x^3 + b over GF(p); points (x, y) or None=inf."""

    name: str
    field: PrimeField
    b: int
    order: int
    gen: tuple[int, int]

    @property
    def p(self) -> int:
        return self.field.p

    def is_on_curve(self, P) -> bool:
        if P is None:
            return True
        x, y = P
        return (y * y - x * x * x - self.b) % self.p == 0

    def add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        p = self.p
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def mul(self, k: int, P):
        k %= self.order
        R = None
        while k:
            if k & 1:
                R = self.add(R, P)
            P = self.add(P, P)
            k >>= 1
        return R

    def msm(self, scalars, points):
        R = None
        for s, P in zip(scalars, points):
            R = self.add(R, self.mul(int(s), P))
        return R

    def msm_pippenger(self, scalars, points, c: int = 8):
        """Host Pippenger (exact Python ints) — the dry-run MSM path.

        ~N * ceil(256/c) adds: on a CPU-only host this beats executing the
        XLA limb ladder kernels by ~an order of magnitude (each device MSM
        call there is 256 serial double-adds of ~100x-roofline limb ops)."""
        n_windows = (256 + c - 1) // c
        mask = (1 << c) - 1
        R = None
        for w in range(n_windows - 1, -1, -1):
            if R is not None:
                for _ in range(c):
                    R = self.add(R, R)
            buckets = [None] * (1 << c)
            for s, P in zip(scalars, points):
                d = (int(s) >> (w * c)) & mask
                if d:
                    buckets[d] = self.add(buckets[d], P)
            running = total = None
            for b in range((1 << c) - 1, 0, -1):
                running = self.add(running, buckets[b])
                total = self.add(total, running)
            R = self.add(R, total)
        return R

    def hash_to_point(self, seed: bytes, index: int):
        """Deterministic try-and-increment point derivation (Pedersen bases)."""
        ctr = 0
        while True:
            digest = hashlib.sha256(seed + index.to_bytes(8, "little") + ctr.to_bytes(8, "little")).digest()
            x = int.from_bytes(digest, "little") % self.p
            y2 = (x * x * x + self.b) % self.p
            y = _sqrt_mod(y2, self.p)
            if y is not None:
                if y % 2 == 1:
                    y = self.p - y
                return (x, y)
            ctr += 1


_GRUMPKIN_GEN_Y = _sqrt_mod((1 - 17) % P_FR, P_FR)
# Normalize to the even root for determinism (matches arkworks' choice of
# generator sign is irrelevant for our self-consistent scheme).
if _GRUMPKIN_GEN_Y is not None and _GRUMPKIN_GEN_Y % 2 == 1:
    _GRUMPKIN_GEN_Y = P_FR - _GRUMPKIN_GEN_Y

BN254_G1 = CurveRef("bn254_g1", FQ, 3, P_FR, (1, 2))
GRUMPKIN = CurveRef("grumpkin", FR, -17 % P_FR, P_FQ, (1, _GRUMPKIN_GEN_Y))


# ----------------------------------------------------------------------
# Batched projective arithmetic (RCB complete formulas)
# ----------------------------------------------------------------------


class BatchedCurve:
    """Vectorized homogeneous-projective point ops over (..., 16) Montgomery
    limb coords.

    A point batch is a dict {x, y, z}; infinity is (0 : y : 0) with y != 0.
    All inputs and outputs are Montgomery-form limbs of the curve's base
    field. The group law uses the Renes–Costello–Batina *complete* addition
    formulas for a = 0 (eprint 2015/1060, Algorithms 7 and 9): one
    branch-free path valid for every input pair, including doubling and
    infinity — no case selects, and roughly half the unrolled-HLO footprint
    of a Jacobian add+double+select ladder, which is what makes the EC
    kernels compile in minutes rather than tens of minutes.
    """

    def __init__(self, ref: CurveRef, field: LimbField):
        assert field.p == ref.p
        self.ref = ref
        self.f = field
        self.b_mont = np.asarray(field.to_limbs_mont(ref.b % ref.p))
        self.b3_mont = np.asarray(field.to_limbs_mont(3 * ref.b % ref.p))

    # -- conversions ----------------------------------------------------

    def from_affine_ints(self, pts) -> dict:
        """List of (x, y) or None -> batched projective dict (host-side)."""
        xs, ys, zs = [], [], []
        for P in pts:
            if P is None:
                xs.append(0)
                ys.append(1)
                zs.append(0)
            else:
                xs.append(P[0])
                ys.append(P[1])
                zs.append(1)
        f = self.f
        return {
            "x": jnp.asarray(f.to_limbs_mont(xs)),
            "y": jnp.asarray(f.to_limbs_mont(ys)),
            "z": jnp.asarray(f.to_limbs_mont(zs)),
        }

    def to_affine_ints(self, P) -> list:
        """Batched projective dict -> list of (x, y) or None (host-side)."""
        f = self.f
        x = np.atleast_2d(np.asarray(P["x"]).reshape(-1, 16))
        y = np.atleast_2d(np.asarray(P["y"]).reshape(-1, 16))
        z = np.atleast_2d(np.asarray(P["z"]).reshape(-1, 16))
        out = []
        for i in range(x.shape[0]):
            zi = int(f.from_limbs_mont(z[i])[()])
            if zi == 0:
                out.append(None)
                continue
            xi = int(f.from_limbs_mont(x[i])[()])
            yi = int(f.from_limbs_mont(y[i])[()])
            zinv = pow(zi, -1, f.p)
            out.append((xi * zinv % f.p, yi * zinv % f.p))
        return out

    def infinity(self, shape=()) -> dict:
        f = self.f
        one = jnp.broadcast_to(jnp.asarray(f.one_mont), shape + (16,))
        zero = jnp.zeros(shape + (16,), dtype=jnp.uint32)
        return {"x": zero, "y": one, "z": zero}

    # -- group law ------------------------------------------------------

    def double(self, P) -> dict:
        """RCB complete doubling, a = 0 (eprint 2015/1060 Algorithm 9).

        6M + 2S + 1 mul-by-3b; valid for every point including infinity.
        """
        f = self.f
        X, Y, Z = P["x"], P["y"], P["z"]
        b3 = jnp.asarray(self.b3_mont)
        t0 = f.mul(Y, Y)
        Z3 = f.add(t0, t0)
        Z3 = f.add(Z3, Z3)
        Z3 = f.add(Z3, Z3)  # 8Y^2
        t1 = f.mul(Y, Z)
        t2 = f.mul(Z, Z)
        t2 = f.mul(b3, t2)
        X3 = f.mul(t2, Z3)
        Y3 = f.add(t0, t2)
        Z3 = f.mul(t1, Z3)
        t1 = f.add(t2, t2)
        t2 = f.add(t1, t2)
        t0 = f.sub(t0, t2)
        Y3 = f.mul(t0, Y3)
        Y3 = f.add(X3, Y3)
        t1 = f.mul(X, Y)
        X3 = f.mul(t0, t1)
        X3 = f.add(X3, X3)
        return {"x": X3, "y": Y3, "z": Z3}

    def add(self, P, Q) -> dict:
        """RCB complete addition, a = 0 (eprint 2015/1060 Algorithm 7).

        12M + 2 mul-by-3b, one branch-free path for every input pair —
        doubling, inverses, and infinity included (infinity = (0 : y : 0)).
        """
        f = self.f
        X1, Y1, Z1 = P["x"], P["y"], P["z"]
        X2, Y2, Z2 = Q["x"], Q["y"], Q["z"]
        b3 = jnp.asarray(self.b3_mont)

        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t2 = f.mul(Z1, Z2)
        t3 = f.add(X1, Y1)
        t4 = f.add(X2, Y2)
        t3 = f.mul(t3, t4)
        t4 = f.add(t0, t1)
        t3 = f.sub(t3, t4)  # X1Y2 + X2Y1
        t4 = f.add(Y1, Z1)
        X3 = f.add(Y2, Z2)
        t4 = f.mul(t4, X3)
        X3 = f.add(t1, t2)
        t4 = f.sub(t4, X3)  # Y1Z2 + Y2Z1
        X3 = f.add(X1, Z1)
        Y3 = f.add(X2, Z2)
        X3 = f.mul(X3, Y3)
        Y3 = f.add(t0, t2)
        Y3 = f.sub(X3, Y3)  # X1Z2 + X2Z1
        X3 = f.add(t0, t0)
        t0 = f.add(X3, t0)  # 3 X1X2
        t2 = f.mul(b3, t2)
        Z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        Y3 = f.mul(b3, Y3)
        X3 = f.mul(t4, Y3)
        t2 = f.mul(t3, t1)
        X3 = f.sub(t2, X3)
        Y3 = f.mul(Y3, t0)
        t1 = f.mul(t1, Z3)
        Y3 = f.add(t1, Y3)
        t0 = f.mul(t0, t3)
        Z3 = f.mul(Z3, t4)
        Z3 = f.add(Z3, t0)
        return {"x": X3, "y": Y3, "z": Z3}

    @partial(jax.jit, static_argnums=0)
    def add_points(self, P, Q) -> dict:
        """Jitted `add` for host-driven call sites.

        An eager EC add dispatches ~3k primitives one by one — over the
        tunneled TPU that is seconds of launch latency per call; always use
        this wrapper outside a surrounding jit."""
        return self.add(P, Q)

    # -- scalar multiplication ------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def scalar_mul(self, scalars, P) -> dict:
        """(..., 16) standard-form scalars x batched points -> batched points."""
        f = self.f

        def body(i, acc):
            acc = self.double(acc)
            limb = 15 - (i // 16)
            bit = (scalars[..., limb] >> (15 - (i % 16))) & 1
            added = self.add(acc, P)
            take = bit == 1
            return {k: f.select(take, added[k], acc[k]) for k in acc}

        shape = jnp.broadcast_shapes(scalars.shape[:-1], P["z"].shape[:-1])
        return lax.fori_loop(0, 256, body, self.infinity(shape))

    # -- MSM -------------------------------------------------------------

    def _tree_reduce_loop(self, P: dict, n: int) -> dict:
        """Log-depth sum over the leading point axis with ONE add instance.

        Fixed-width formulation: level k adds lanes shifted by 2^k (tail
        filled with infinity), inside a fori_loop — so the compiled graph
        contains a single EC add regardless of n. Work is n*log2(n) lane
        adds instead of the halving tree's n, but XLA CPU pays ~15-20 s of
        compile per EC-add *instance*, which made unrolled trees the single
        biggest test-suite cost. Used on compile-light paths (ladder MSMs);
        the TPU hot paths keep the work-optimal unrolled `_pair_tree`.
        """
        np2 = 1 << max(0, (n - 1).bit_length())
        if np2 != n:
            pad = self.infinity((np2 - n,) + P["z"].shape[1:-1])
            P = {k: jnp.concatenate([P[k], pad[k]]) for k in P}
        if np2 == 1:
            return {k: v[0] for k, v in P.items()}
        inf = self.infinity(P["z"].shape[:-1])

        def level(k, acc):
            shift = jnp.int32(1) << k
            shifted = {
                key: lax.dynamic_slice_in_dim(
                    jnp.concatenate([acc[key], inf[key]], axis=0), shift, np2, 0
                )
                for key in acc
            }
            return self.add(acc, shifted)

        acc = lax.fori_loop(0, np2.bit_length() - 1, level, P)
        return {k: v[0] for k, v in acc.items()}

    @partial(jax.jit, static_argnums=0)
    def msm_ladder(self, scalars, points) -> dict:
        """Small-N MSM: batched double-and-add ladder + loop-tree reduction.

        Orders of magnitude cheaper to *compile* than the Pippenger kernel
        (one EC double + one EC add inside a fori_loop, vs. sort + segmented
        scans) at O(256) serial depth per point — used where compile time
        dwarfs the work: tiny N, CPU tests, and the multi-chip dry run.
        """
        prods = self.scalar_mul(scalars, points)
        return self._tree_reduce_loop(prods, prods["z"].shape[0])

    def _seg_scan_points(self, pts: dict, starts) -> dict:
        """Segmented inclusive EC prefix scan along the last point axis.

        `starts`: (N,) bool, True where a segment begins. Kogge–Stone
        formulation — log2(N) fori_loop levels with ONE EC-add instance in
        the compiled graph (an unrolled tree costs XLA ~15-20 s of compile
        PER add instance). Work is N*log2(N) lane adds; used once per MSM
        (value dedup), not per window.
        """
        N = starts.shape[-1]
        if N == 1:
            return pts
        inf = self.infinity((N,))
        # carry: (x, y, z, blocked); blocked[i] = scan at i may not look
        # further left (a segment start lies in (i-dist, i]).
        carry = dict(pts)
        carry["blk"] = starts

        def level(k, cur):
            shift = jnp.int32(1) << k
            # partner j = i - shift, identity-padded at the head
            def shifted(arr, fill):
                full = jnp.concatenate([fill, arr], axis=0)
                return lax.dynamic_slice_in_dim(full, jnp.int32(N) - shift, N, 0)

            part = {
                key: shifted(cur[key], inf[key]) for key in ("x", "y", "z")
            }
            part_blk = shifted(cur["blk"], jnp.ones(N, dtype=bool))
            s = self.add({k: cur[k] for k in ("x", "y", "z")}, part)
            take = cur["blk"][..., None]
            out = {
                k: jnp.where(take, cur[k], s[k]) for k in ("x", "y", "z")
            }
            out["blk"] = cur["blk"] | part_blk
            return out

        levels = (N - 1).bit_length()
        out = lax.fori_loop(0, levels, level, carry)
        return {k: out[k] for k in ("x", "y", "z")}

    def _dedup_scalars(self, scalars, points) -> tuple:
        """Collapse duplicate scalar values: returns (scalars', points') of
        the same shapes where each distinct value keeps ONE lane carrying the
        summed point, and all other lanes get scalar 0 (excluded from every
        Pippenger bucket — no compaction needed).

        Real cross-term vectors repeat a few values 10^4-10^5 times
        (structured circuits); without dedup those duplicates share a digit
        in EVERY window and the bucket-serial walk's data-dependent trip
        count explodes ~100x, overrunning the TPU worker's execution
        deadline (the round-1..3 bench crash).
        """
        N = scalars.shape[0]
        # 32-bit mixed sort key; ties are resolved by exact-equality flags,
        # a collision only splits a value across <=2 lanes (still correct).
        mix = scalars[:, 0]
        for j in range(1, 16):
            mix = mix * jnp.uint32(0x9E3779B1) + scalars[:, j]
        order = jnp.argsort(mix)
        sc = scalars[order]
        pts = {k: points[k][order] for k in points}
        neq = jnp.any(sc[1:] != sc[:-1], axis=-1)
        starts = jnp.concatenate([jnp.ones(1, dtype=bool), neq])
        pref = self._seg_scan_points(pts, starts)
        # segment end = last lane of its value run: it holds the summed point
        is_end = jnp.concatenate([starts[1:], jnp.ones(1, dtype=bool)])
        inf = self.infinity((N,))
        pts_out = {k: jnp.where(is_end[:, None], pref[k], inf[k]) for k in pref}
        sc_out = jnp.where(is_end[:, None], sc, jnp.zeros_like(sc))
        return sc_out, pts_out

    @partial(jax.jit, static_argnums=(0, 3))
    def msm(self, scalars, points, c: int = 8) -> dict:
        """Pippenger MSM: sum_i scalars[i] * points[i].

        scalars: (N, 16) standard-form limbs; points: batched dict (N, 16).
        Value-dedup preprocessing (one segmented scan) bounds the bucket
        walk's run lengths; per window: sort by digit, lockstep bucket-run
        walk (one vector lane per bucket), log-depth weighted bucket sum.
        """
        f = self.f
        N = scalars.shape[0]
        n_windows = 256 // c
        n_buckets = 1 << c

        if N > 1:
            scalars, points = self._dedup_scalars(scalars, points)

        def window_digits(w):
            bit0 = w * c
            limb = bit0 // 16
            shift = bit0 % 16
            return (scalars[:, limb] >> shift) & ((1 << c) - 1)

        digits_all = jnp.stack([window_digits(w) for w in range(n_windows)])  # (W, N)

        def one_window(digits):
            order = jnp.argsort(digits)
            d_sorted = digits[order].astype(jnp.int32)
            pts = {k: points[k][order] for k in points}
            bucket_ids = jnp.arange(n_buckets, dtype=jnp.int32)
            start = jnp.searchsorted(d_sorted, bucket_ids, side="left")
            end = jnp.searchsorted(d_sorted, bucket_ids, side="right")
            # bucket 0 contributes nothing (also where dedup parks the
            # masked-out duplicate lanes)
            length = jnp.where(bucket_ids == 0, 0, end - start)
            max_len = jnp.max(length)

            def body(t, acc):
                idx = jnp.minimum(start + t, N - 1)
                p = {k: pts[k][idx] for k in pts}
                added = self.add(acc, p)
                valid = t < length
                return {k: f.select(valid, added[k], acc[k]) for k in acc}

            return lax.fori_loop(0, max_len, body, self.infinity((n_buckets,)))

        buckets_all = lax.map(one_window, digits_all)  # dict of (W, 2^c, 16)

        # weighted bucket sum, batched across all windows at once:
        # total_w = sum_b b * bucket[w, b] via running suffix accumulation
        def bucket_body(i, carry):
            running, total = carry
            bidx = (1 << c) - 1 - i
            bp = {k: buckets_all[k][:, bidx] for k in buckets_all}
            running = self.add(running, bp)
            total = self.add(total, running)
            return running, total

        init = (self.infinity((n_windows,)), self.infinity((n_windows,)))
        _, window_sums = lax.fori_loop(0, (1 << c) - 1, bucket_body, init)

        # combine: acc = 2^c * acc + window_sum, from the top window down
        acc = {k: window_sums[k][n_windows - 1] for k in window_sums}

        def combine_rest(i, acc):
            w = n_windows - 2 - i
            acc = lax.fori_loop(0, c, lambda _, a: self.double(a), acc)
            return self.add(acc, {k: window_sums[k][w] for k in window_sums})

        return lax.fori_loop(0, n_windows - 1, combine_rest, acc)

    @partial(jax.jit, static_argnums=(0, 3))
    def msm_many(self, scalars, points, c: int = 8) -> dict:
        """Batched MSMs sharing one base set: (m, N, 16) scalars -> (m,) points.

        vmap over the instance axis widens every EC add in the bucket walk
        from 2^c to m * 2^c lanes — this is how leaf witness commitments for
        all fold steps run as one kernel.
        """
        return jax.vmap(lambda s: self.msm(s, points, c))(scalars)

    @partial(jax.jit, static_argnums=0)
    def msm_many_ladder(self, scalars, points) -> dict:
        """Batched ladder MSMs (compile-light path; same results as
        msm_many — the two implementations compute the identical group sum,
        so proofs are bit-identical whichever is used)."""
        return jax.vmap(lambda s: self.msm_ladder(s, points))(scalars)

    def _pair_tree(self, P: dict, n: int) -> dict:
        """Pairwise log-depth sum over the second-to-last point axis."""
        while n > 1:
            P = self.add(
                {k: v[..., 0::2, :] for k, v in P.items()},
                {k: v[..., 1::2, :] for k, v in P.items()},
            )
            n //= 2
        return {k: v[..., 0, :] for k, v in P.items()}

    @partial(jax.jit, static_argnums=(0, 3))
    def sum_masked(self, mask, points, seg: int = 2048) -> dict:
        """Subset sum: sum_i mask[i] * points[i] for 0/1 masks.

        mask: (..., N) uint32 in {0, 1}; points: batched dict (N, 16) with N
        a power of two. Log-depth pairwise tree reduction — the fast path
        for committing bit-valued witness wires (the majority of wires in
        every step circuit), where Pippenger's bucket walk degenerates.

        The tree runs segment-by-segment under lax.map: a fully unrolled
        tree over ~10^5 points is one giant XLA program whose live temps
        (each EC add holds several (batch, N/2, 33)-column products) blow
        past HBM at fold-prover batch sizes; bounding the segment keeps peak
        memory at (batch, seg) regardless of N.
        """
        N = points["z"].shape[0]
        assert N & (N - 1) == 0, "pad N to a power of two"
        shape = mask.shape[:-1]

        def masked(pts, m):
            # masked-out lanes become projective infinity (0 : y : 0) —
            # x must be zeroed too: (x : y : 0) with x != 0 is off-curve and
            # the complete formulas only cover curve points.
            n = pts["z"].shape[-2]
            keep = m[..., None] == 1
            return {
                "x": jnp.where(keep, pts["x"], jnp.uint32(0)),
                "y": jnp.broadcast_to(pts["y"], shape + (n, 16)),
                "z": jnp.where(keep, pts["z"], jnp.uint32(0)),
            }

        if N <= seg:
            return self._pair_tree(masked(points, mask), N)

        nseg = N // seg
        pts_seg = {k: points[k].reshape(nseg, seg, 16) for k in points}
        mask_seg = jnp.moveaxis(
            mask.reshape(shape + (nseg, seg)), -2, 0
        )  # (nseg, ..., seg)

        def one_seg(args):
            px, py, pz, m = args
            return self._pair_tree(masked({"x": px, "y": py, "z": pz}, m), seg)

        part = lax.map(
            one_seg, (pts_seg["x"], pts_seg["y"], pts_seg["z"], mask_seg)
        )  # dict of (nseg, ..., 16)
        part = {k: jnp.moveaxis(v, 0, -2) for k, v in part.items()}
        return self._pair_tree(part, nseg)

    # -- Pedersen ---------------------------------------------------------

    def pedersen_bases(self, n: int, seed: bytes = b"vimz-tpu-pedersen") -> dict:
        """n deterministic independent generators as a batched point dict.

        Derivation (hash-to-point) is host-side and one-time; limb arrays are
        cached on disk and extended incrementally as larger circuits ask for
        more bases (the analogue of the reference's public-parameter setup,
        vimz/src/nova_snark_backend/folding.rs:21-25).
        """
        import os

        import numpy as np_

        from vimz_tpu.utils.cache import cache_dir

        path = os.path.join(
            cache_dir(), f"pedersen_{self.ref.name}_{seed.hex()}.npz"
        )
        have = 0
        arrs = None
        if os.path.exists(path):
            try:
                loaded = np_.load(path)
                arrs = {k: loaded[k] for k in ("x", "y", "z")}
                have = arrs["x"].shape[0]
            except Exception:
                arrs, have = None, 0
        if have:
            # Integrity spot-check: a corrupted/hand-edited cache would
            # silently change the commitment key (proofs unverifiable across
            # machines with no diagnostic). Verify a few cached points
            # against fresh derivation; re-derive everything on mismatch.
            f = self.f
            probe = sorted({0, have // 2, have - 1} & set(range(min(have, n))))
            for i in probe:
                want = self.ref.hash_to_point(seed, i)
                z = int(f.from_limbs_mont(arrs["z"][i])[()])
                x = int(f.from_limbs_mont(arrs["x"][i])[()])
                y = int(f.from_limbs_mont(arrs["y"][i])[()])
                zinv = pow(z, -1, f.p) if z else 0
                got = (x * zinv % f.p, y * zinv % f.p)
                if z == 0 or got != want:
                    arrs, have = None, 0
                    break
        if have < n:
            pts = [self.ref.hash_to_point(seed, i) for i in range(have, n)]
            fresh = {k: np_.asarray(v) for k, v in self.from_affine_ints(pts).items()}
            if arrs is None:
                arrs = fresh
            else:
                arrs = {k: np_.concatenate([arrs[k], fresh[k]]) for k in arrs}
            tmp = path + f".tmp.{os.getpid()}.npz"
            np_.savez(tmp, **arrs)
            os.replace(tmp, path)
        # In-memory device cache: prover and verifier instances (and MSM
        # engines) must share ONE device copy — per-instance reloads both
        # duplicated ~0.5 GB of HBM and, worse, gave every instance's jitted
        # engines distinct argument buffers.
        mem = getattr(self, "_bases_mem", None)
        if mem is None or mem[0].get(seed, -1) < n:
            dev = {k: jnp.asarray(v) for k, v in arrs.items()}
            if mem is None:
                self._bases_mem = ({seed: arrs["x"].shape[0]}, {seed: dev})
            else:
                mem[0][seed] = arrs["x"].shape[0]
                mem[1][seed] = dev
        dev = self._bases_mem[1][seed]
        return {k: v[:n] for k, v in dev.items()}


    def blinding_base(self) -> dict:
        """The dedicated hiding generator H (one point, batch shape (1,)).

        Derived by hash-to-point under a seed disjoint from the Pedersen
        base seed, so its discrete log w.r.t. every G_i (and Q) is unknown;
        a commitment C = <w, G> + r*H with uniform r is perfectly hiding.
        """
        if getattr(self, "_h_base", None) is None:
            pt = self.ref.hash_to_point(b"vimz-tpu-pedersen-H", 0)
            self._h_base = self.from_affine_ints([pt])
        return self._h_base


_BN254_BATCHED = None
_GRUMPKIN_BATCHED = None


def bn254_batched() -> BatchedCurve:
    global _BN254_BATCHED
    if _BN254_BATCHED is None:
        _BN254_BATCHED = BatchedCurve(BN254_G1, FQ_LIMBS)
    return _BN254_BATCHED


def grumpkin_batched() -> BatchedCurve:
    global _GRUMPKIN_BATCHED
    if _GRUMPKIN_BATCHED is None:
        _GRUMPKIN_BATCHED = BatchedCurve(GRUMPKIN, FR_LIMBS)
    return _GRUMPKIN_BATCHED
