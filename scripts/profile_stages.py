#!/usr/bin/env python3
"""Per-stage prove profiling on the real device (VERDICT r4 item 1a/5).

Decomposes one 64-step grayscale prove into its device stages — witness
tape, leaf commitments (bit/full split), cross terms, cross-term MSM (with
Pallas sub-stages: dedup / digit sort / bucket walk / bucket tails), fold
kernels, point folds, digests — and times each cold (first call, includes
compile) and warm (second call). Every timing forces host materialization
(np.asarray): block_until_ready is unreliable over the axon tunnel.

Usage: python scripts/profile_stages.py [steps=64] [t=grayscale]
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
T_NAME = sys.argv[2] if len(sys.argv) > 2 else "grayscale"

t_start = time.time()
REPORT: list[tuple[str, float, float]] = []


def mat(out):
    """Synchronize on completion WITHOUT transferring results: device->host
    transfers ride the axon tunnel at ~40-150 MB/s, so materializing multi-
    GB stage outputs would dominate the timing (this bug inflated the first
    version of this profile). A 1-element slice of a concrete array blocks
    until the producing kernel finished, transferring 4 bytes."""
    for l in jax.tree_util.tree_leaves(out):
        if hasattr(l, "ravel") and getattr(l, "size", 1) > 4:
            np.asarray(l.ravel()[:1])
        else:
            np.asarray(l)
    return out


def timed(name, fn, *args, reps=1):
    t0 = time.time()
    out = mat(fn(*args))
    cold = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = mat(fn(*args))
    warm = (time.time() - t0) / reps
    REPORT.append((name, cold, warm))
    print(f"  {name:40s} cold {cold:8.2f}s  warm {warm:8.3f}s", flush=True)
    return out


def main():
    import bench as bench_mod

    from vimz_tpu.circuits import synthesize
    from vimz_tpu.folding import FoldingProver
    from vimz_tpu.folding.relaxed import DeviceR1CS
    from vimz_tpu.folding.transcript import instance_digests_batch
    from vimz_tpu.fields.limbs import FR_LIMBS as f

    print(f"platform={jax.default_backend()} steps={STEPS} t={T_NAME}", flush=True)

    # dispatch latency over the tunnel
    tiny = jnp.ones((8, 128), jnp.float32)
    g = jax.jit(lambda x: x + 1)
    mat(g(tiny))
    ts = []
    for _ in range(20):
        t0 = time.time()
        mat(g(tiny))
        ts.append(time.time() - t0)
    print(f"  dispatch latency: median {np.median(ts)*1e3:.1f}ms "
          f"min {min(ts)*1e3:.1f}ms max {max(ts)*1e3:.1f}ms", flush=True)

    inp, t, steps = bench_mod._build_input(T_NAME, STEPS)
    t0 = time.time()
    r1cs = synthesize(t, inp)
    print(f"  synthesize: {time.time()-t0:.1f}s  "
          f"({r1cs.n_constraints} constraints, {r1cs.n_wires} wires)", flush=True)
    t0 = time.time()
    d = DeviceR1CS(r1cs)
    prover = FoldingProver(d)
    print(f"  setup: {time.time()-t0:.1f}s  PAIR_CHUNK={prover.PAIR_CHUNK} "
          f"MSM_CHUNK={prover.MSM_CHUNK} n_wit={prover.n_wit} "
          f"bit={len(prover._bit_idx)} full={len(prover._full_idx)}", flush=True)

    B = prover.PAIR_CHUNK
    MC = min(prover.MSM_CHUNK, B)
    nc = d.n_constraints

    # ---- leaf stages ----
    from vimz_tpu.r1cs.witness import execute_tape

    z_c = timed("execute_tape(64)", lambda: execute_tape(r1cs, 0, min(64, steps)))
    w_std = timed("from_mont(w)", lambda: prover._from_mont_rows(
        z_c[:, 1 + d.n_pub : d.n_wires]))
    timed("commit_witnesses(64)", lambda: prover.commit_witnesses(w_std))
    bit_e, full_e = prover._pallas_leaf_engines()
    if bit_e is not None:
        bit_sc = w_std[: prover.MSM_CHUNK, prover._bit_idx, 0]
        timed("  bit masked_sum(chunk)", lambda: bit_e.masked_sum(bit_sc))
        if full_e is not None:
            fsc = w_std[: prover.MSM_CHUNK, prover._full_idx]
            timed("  full msm_many(chunk)", lambda: full_e.msm_many(fsc))

    # ---- cross-term stages ----
    z1 = z_c[0:2 * B:2]
    z2 = z_c[1:2 * B:2]
    if z1.shape[0] < B:  # steps < 2B: reuse rows
        reps = (B + z1.shape[0] - 1) // z1.shape[0]
        z1 = jnp.concatenate([z1] * reps)[:B]
        z2 = jnp.concatenate([z2] * reps)[:B]
    ones = jnp.asarray(f.to_limbs_mont(np.array([1] * B, dtype=object)))
    Tm = timed("cross_term(B)", lambda: d.cross_term(z1, ones, z2, ones))
    T_std = timed("from_mont(T)", lambda: prover._from_mont_rows(Tm))

    eng = prover._pallas_msm_for(nc)
    sc = T_std[:MC]
    if eng is not None:
        timed("comm_T pallas msm_many(MC)", lambda: eng.msm_many(sc), reps=2)

    # ---- sort-based PallasMsm sub-stages (skipped for the subset-table
    # engine, which has no dedup/sort/walk decomposition) ----
    if eng is not None and hasattr(eng, "_dedup"):
        ded = timed("  msm dedup", jax.jit(lambda s: eng._dedup(s)), sc)
        sc_d, pts_d = ded
        c = 8
        n_windows, n_buckets = 256 // c, 1 << c
        N = nc

        @jax.jit
        def digits_sort(scalars):
            digits = []
            for w in range(n_windows):
                bit0 = w * c
                digits.append((scalars[:, :, bit0 // 16] >> (bit0 % 16)) & (n_buckets - 1))
            digits = jnp.stack(digits, axis=1)
            order = jnp.argsort(digits, axis=2)
            d_sorted = jnp.take_along_axis(digits, order, axis=2).astype(jnp.int32)
            bucket_ids = jnp.arange(n_buckets, dtype=jnp.int32)
            start = jax.vmap(jax.vmap(lambda dd: jnp.searchsorted(dd, bucket_ids, side="left")))(d_sorted)
            end = jax.vmap(jax.vmap(lambda dd: jnp.searchsorted(dd, bucket_ids, side="right")))(d_sorted)
            length = jnp.where(bucket_ids[None, None, :] == 0, 0, end - start)
            return order, start, length

        order, start, length = timed("  msm digit sort", digits_sort, sc_d)

        @jax.jit
        def walk_all(order, start, length, px, py, pz):
            pts = {"x": px, "y": py, "z": pz}
            Bc = order.shape[0]

            def walk(w_lo, w_hi):
                nw = w_hi - w_lo
                st = start[:, w_lo:w_hi]
                ln = length[:, w_lo:w_hi]
                od = order[:, w_lo:w_hi]
                acc = eng._infinity3(Bc, nw * n_buckets)
                max_len = jnp.max(ln)

                def body(tt, acc):
                    idx = jnp.minimum(st + tt, N - 1)
                    gidx = jnp.take_along_axis(od, idx, axis=2)
                    flat = gidx.reshape(Bc, nw * n_buckets)
                    p = {k: jnp.take_along_axis(pts[k], flat[:, None, :], axis=2)
                         for k in ("x", "y", "z")}
                    added = eng._add3(acc, p)
                    valid = (tt < ln).reshape(Bc, 1, nw * n_buckets)
                    return {k: jnp.where(valid, added[k], acc[k]) for k in acc}

                out = lax.fori_loop(0, max_len, body, acc)
                return {k: v.reshape(Bc, 16, nw, n_buckets) for k, v in out.items()}

            low = walk(0, n_windows - 1)
            top = walk(n_windows - 1, n_windows)
            return {k: jnp.concatenate([low[k], top[k]], axis=2) for k in low}

        buckets = timed("  msm bucket walk", walk_all, order, start, length,
                        pts_d["x"], pts_d["y"], pts_d["z"])

        @jax.jit
        def tails(buckets):
            from vimz_tpu.curves import bn254_batched

            bc = bn254_batched()
            Bc = buckets["x"].shape[0]
            W = n_windows
            bk_nm = {k: jnp.transpose(buckets[k], (0, 2, 3, 1)) for k in buckets}

            def bucket_body(i, carry):
                running, total = carry
                bidx = n_buckets - 1 - i
                bp = {k: bk_nm[k][:, :, bidx] for k in bk_nm}
                running = bc.add(running, bp)
                total = bc.add(total, running)
                return running, total

            inf2 = {k: jnp.broadcast_to(v, (Bc, W, 16)).copy()
                    for k, v in bc.infinity((1, 1)).items()}
            _, window_sums = lax.fori_loop(0, n_buckets - 1, bucket_body, (inf2, inf2))
            accw = {k: window_sums[k][:, n_windows - 1] for k in window_sums}

            def combine(i, accw):
                w = n_windows - 2 - i
                accw = lax.fori_loop(0, c, lambda _, a: bc.double(a), accw)
                return bc.add(accw, {k: window_sums[k][:, w] for k in window_sums})

            return lax.fori_loop(0, n_windows - 1, combine, accw)

        timed("  msm bucket tails (XLA)", tails, buckets)

    # ---- fold kernels ----
    r_mont = jnp.asarray(f.to_limbs_mont(np.array([12345] * B, dtype=object)))
    timed("fold_z kernel", lambda: prover._fold_z_kernel(z1, z2, r_mont))
    timed("fold_e0 kernel", lambda: prover._fold_e0_kernel(Tm, r_mont))

    # ---- digests + affine ----
    x64 = np.zeros((64, d.n_pub), dtype=object)
    timed("instance_digests(64)", lambda: instance_digests_batch(
        [1] * 64, x64, [(1, 2)] * 64, [None] * 64))
    some_pts = prover.curve.from_affine_ints(pts_aff)
    timed("to_affine(B)", lambda: prover.to_affine(some_pts))

    print(f"\nTOTAL {time.time()-t_start:.1f}s", flush=True)
    print(f"{'stage':42s}{'cold_s':>9s}{'warm_s':>9s}", flush=True)
    for name, cold, warm in REPORT:
        print(f"{name:42s}{cold:9.2f}{warm:9.3f}", flush=True)
    print("PROFILE DONE", flush=True)


if __name__ == "__main__":
    main()
