#!/usr/bin/env python3
"""Benchmark driver — prints ONE JSON line with the headline metric.

Metric: end-to-end HD grayscale fold-prove throughput (image rows/sec):
witness JSON semantics -> batched device witness generation -> leaf Pedersen
commitments -> log-depth fold tree -> final folded instance. The baseline is
the reference's published HD grayscale prove time on a Ryzen 9 server:
720 rows / 240.6 s = 2.99 rows/s (BASELINE.md, /root/reference/README.md:53).

Environment knobs:
  VIMZ_BENCH_STEPS   fold steps (default 720 = full HD)
  VIMZ_BENCH_T       transformation (default grayscale)
"""

import json
import os
import time

# persistent compile cache (first run pays compilation; later runs don't)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

BASELINES_S = {  # reference Ryzen-9 server prove times, HD (README.md:50-56)
    "grayscale": 240.6,
    "contrast": 371.7,
    "brightness": 372.5,
    "crop": 133.0,
    "resize": 135.7,
    "sharpness": 455.8,
    "blur": 406.0,
}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-vimz")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from vimz_tpu.circuits import synthesize
    from vimz_tpu.editor import convert_to_grayscale
    from vimz_tpu.editor.ops import pack_words_rows
    from vimz_tpu.folding import FoldingProver
    from vimz_tpu.folding.relaxed import DeviceR1CS
    from vimz_tpu.pipeline.input import Transformation, VIMzInput

    steps = int(os.environ.get("VIMZ_BENCH_STEPS", "720"))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (steps, 1280, 3), dtype=np.uint8)
    inp = VIMzInput(
        pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {}
    )

    t0 = time.time()
    r1cs = synthesize(Transformation.GRAYSCALE, inp)
    t_synth = time.time() - t0

    t0 = time.time()
    d = DeviceR1CS(r1cs)
    prover = FoldingProver(d)
    t_setup = time.time() - t0

    t0 = time.time()
    proof = prover.prove(r1cs)
    t_prove = time.time() - t0

    total = t_synth + t_prove  # setup (key gen) excluded, as in the reference
    rows_per_sec = steps / total
    baseline_rows_per_sec = 720 / BASELINES_S["grayscale"]
    print(
        json.dumps(
            {
                "metric": "hd_grayscale_e2e_prove_rows_per_sec",
                "value": round(rows_per_sec, 3),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_sec / baseline_rows_per_sec, 3),
                "detail": {
                    "steps": steps,
                    "synthesize_s": round(t_synth, 2),
                    "setup_s": round(t_setup, 2),
                    "prove_s": round(t_prove, 2),
                    "proof_points": len(proof.leaf_comm_w)
                    + sum(len(l) for l in proof.node_comm_t),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
