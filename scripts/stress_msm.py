#!/usr/bin/env python3
"""Isolate the big-base Pippenger MSM TPU fault.

Runs msm_many over synthetic scalars/points at growing (batch, N) sizes and
reports which configuration faults the device.

Usage: python scripts/stress_msm.py [N] [batches...]
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vimz_tpu.utils.backend import enable_compile_cache

enable_compile_cache(jax.default_backend())

import numpy as np
import jax.numpy as jnp

from vimz_tpu.curves import bn254_batched
from vimz_tpu.fields.prime import P_FR


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 153224
    batches = [int(b) for b in sys.argv[2:]] or [1, 4, 16]
    curve = bn254_batched()

    print(f"deriving {N} bases (cached)...", flush=True)
    t0 = time.time()
    bases = curve.pedersen_bases(N)
    print(f"  bases in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    # full-width random scalars, standard form limbs
    sc = rng.integers(0, 1 << 16, size=(max(batches), N, 16), dtype=np.uint32)
    sc_dev = jnp.asarray(sc)

    for B in batches:
        for tag in ("cold", "warm"):
            t0 = time.time()
            try:
                out = curve.msm_many(sc_dev[:B], bases)
                jax.block_until_ready(out["x"])
                jax.block_until_ready(out["y"])
                jax.block_until_ready(out["z"])
                print(f"  msm_many B={B} N={N} {tag}: OK in {time.time() - t0:.1f}s", flush=True)
            except Exception as e:
                print(f"  msm_many B={B} N={N} {tag}: FAULT after {time.time() - t0:.1f}s: {type(e).__name__}: {str(e)[:200]}", flush=True)
                return


if __name__ == "__main__":
    main()


def zero_lane_test(N=153224, B=16):
    """Reproduce the fold pipeline's padding pattern: some instances have
    all-zero scalars (zero-trip dynamic bucket walks under vmap)."""
    curve = bn254_batched()
    bases = curve.pedersen_bases(N)
    rng = np.random.default_rng(0)
    sc = rng.integers(0, 1 << 16, size=(B, N, 16), dtype=np.uint32)
    sc[B // 4 :] = 0  # most lanes all-zero, like tail padding
    t0 = time.time()
    out = curve.msm_many(jnp.asarray(sc), bases)
    jax.block_until_ready(out["x"])
    print(f"  zero-lane msm_many B={B}: OK in {time.time() - t0:.1f}s", flush=True)
