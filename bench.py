#!/usr/bin/env python3
"""Benchmark driver — prints ONE JSON line with the headline metric.

Round-1 metric: throughput of the Poseidon row-hash commitment pipeline
(batched window-fold row hashes + sequential accumulator chain) for HD rows
— the per-row work every fold proof performs for witness/state generation.
The baseline comparison point is the reference's end-to-end HD contrast
prove rate: 720 rows / 371.7 s = 1.937 rows/s on a Ryzen 9
(BASELINE.md; the metric here covers the hashing subsystem, end-to-end fold
benchmarks land in later rounds as the MSM path is optimized).
"""

import json
import time

import numpy as np

BASELINE_ROWS_PER_SEC = 720 / 371.7


def main():
    import jax
    import jax.numpy as jnp

    from vimz_tpu.commit.image_hash import ImageHasher
    from vimz_tpu.fields.limbs import FR_LIMBS

    hasher = ImageHasher()
    rng = np.random.default_rng(0)
    rows = 720
    words = jnp.asarray(
        rng.integers(0, 1 << 16, size=(rows, 128, 16), dtype=np.uint32)
    )

    def run(w):
        return hasher.chain_circom(FR_LIMBS.to_mont(w))

    jitted = jax.jit(run)
    jitted(words).block_until_ready()  # compile

    n_iter = 3
    t0 = time.time()
    for _ in range(n_iter):
        jitted(words).block_until_ready()
    dt = (time.time() - t0) / n_iter

    rows_per_sec = rows / dt
    print(
        json.dumps(
            {
                "metric": "hd_row_hash_commit_rows_per_sec",
                "value": round(rows_per_sec, 2),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_sec / BASELINE_ROWS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
