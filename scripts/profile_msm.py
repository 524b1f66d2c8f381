#!/usr/bin/env python3
"""Per-phase MSM profiling on the real device.

Splits the Pippenger MSM into separately-jitted phases (dedup scan, digit
sort+walk, weighted bucket sum) and times each warm, so optimization
targets the real bottleneck. block_until_ready is unreliable on axon —
every phase is timed to full host materialization.
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

import numpy as np
import jax.numpy as jnp
from jax import lax

from vimz_tpu.curves import bn254_batched
from vimz_tpu.fields.limbs import FR_LIMBS as f
from vimz_tpu.fields.prime import P_FR as P

N = int(sys.argv[1]) if len(sys.argv) > 1 else 153224
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
curve = bn254_batched()
bases = curve.pedersen_bases(N)
rng = np.random.default_rng(0)

# realistic duplicate-heavy scalars
pool_small = np.array([1, 2, 255, 1000, 2550], dtype=object)
n_dup = N // 2
vals = np.zeros((B, N), dtype=object)
vals[:, :n_dup] = pool_small[rng.integers(0, 5, size=(B, n_dup))]
chunks = rng.integers(0, 1 << 62, size=(B, N - n_dup, 5))
acc = np.zeros((B, N - n_dup), dtype=object)
for j in range(5):
    acc = (acc << 62) + chunks[:, :, j].astype(object)
vals[:, n_dup:] = acc % P
sc = jnp.asarray(f.to_limbs(vals))


def timed(name, fn, *args):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    for l in leaves:
        np.asarray(l)  # force materialization (compile+run)
    t0 = time.time()
    out = fn(*args)
    for l in jax.tree_util.tree_leaves(out):
        np.asarray(l)
    print(f"  {name}: warm {time.time() - t0:.2f}s", flush=True)
    return out


@jax.jit
def phase_dedup(scalars):
    return jax.vmap(lambda s: curve._dedup_scalars(s, bases))(scalars)


@partial(jax.jit, static_argnums=())
def phase_walk(scalars, px, py, pz):
    c = 8
    n_windows = 256 // c
    n_buckets = 1 << c

    def one_instance(sc_i, pts_i):
        def window_digits(w):
            bit0 = w * c
            return (sc_i[:, bit0 // 16] >> (bit0 % 16)) & ((1 << c) - 1)

        digits_all = jnp.stack([window_digits(w) for w in range(n_windows)])

        def one_window(digits):
            order = jnp.argsort(digits)
            d_sorted = digits[order].astype(jnp.int32)
            pts = {k: pts_i[k][order] for k in pts_i}
            bucket_ids = jnp.arange(n_buckets, dtype=jnp.int32)
            start = jnp.searchsorted(d_sorted, bucket_ids, side="left")
            end = jnp.searchsorted(d_sorted, bucket_ids, side="right")
            length = jnp.where(bucket_ids == 0, 0, end - start)
            max_len = jnp.max(length)

            def body(t, carry):
                idx = jnp.minimum(start + t, N - 1)
                p = {k: pts[k][idx] for k in pts}
                added = curve.add(carry, p)
                valid = t < length
                return {k: f.select(valid, added[k], carry[k]) for k in carry}

            return lax.fori_loop(0, max_len, body, curve.infinity((n_buckets,)))

        return lax.map(one_window, digits_all)

    return jax.vmap(one_instance)(scalars, {"x": px, "y": py, "z": pz})


@jax.jit
def phase_bucket_sum(buckets_all):
    c = 8
    n_windows = 256 // c

    def one_instance(bk):
        def bucket_body(i, carry):
            running, total = carry
            bidx = (1 << c) - 1 - i
            bp = {k: bk[k][:, bidx] for k in bk}
            running = curve.add(running, bp)
            total = curve.add(total, running)
            return running, total

        init = (curve.infinity((n_windows,)), curve.infinity((n_windows,)))
        _, window_sums = lax.fori_loop(0, (1 << c) - 1, bucket_body, init)
        acc = {k: window_sums[k][n_windows - 1] for k in window_sums}

        def combine_rest(i, acc):
            w = n_windows - 2 - i
            acc = lax.fori_loop(0, c, lambda _, a: curve.double(a), acc)
            return curve.add(acc, {k: window_sums[k][w] for k in window_sums})

        return lax.fori_loop(0, n_windows - 1, combine_rest, acc)

    return jax.vmap(one_instance)(buckets_all)


print(f"N={N} B={B}", flush=True)
sc_d, pts_d = timed("dedup", phase_dedup, sc)
bk = timed("digit sort + walk", phase_walk, sc_d, pts_d["x"], pts_d["y"], pts_d["z"])
out = timed("weighted bucket sum", phase_bucket_sum, bk)
full = timed("full msm_many", lambda s: curve.msm_many(s, bases), sc)
# cross-check
aff1 = curve.to_affine_ints({k: v for k, v in out.items()})
aff2 = curve.to_affine_ints({k: v for k, v in full.items()})
print("  phases == full:", aff1 == aff2, flush=True)
print("PROFILE DONE", flush=True)
