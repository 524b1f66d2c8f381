#!/usr/bin/env python3
"""Parallel multi-transform benchmark driver.

The reference's benchmark.sh runs N independent `vimz` processes (one per
transformation) concurrently for up to 3.5x aggregate throughput
(benchmark.sh:25-93, README.md:24). On a single TPU chip, process-level
parallelism over one device is counterproductive; instead this driver runs
the transformations sequentially on-device while OVERLAPPING host witness
preparation of the next transform with device proving of the current one,
and reports per-transform and aggregate steps/sec plus peak RSS
(the reference reports /usr/bin/time -v peak memory, benchmark.sh:67-73).

Usage: python scripts/benchmark.py [-f grayscale contrast ...] [--steps N]
       [--width 1280]
"""

import argparse
import json
import resource
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-f", "--functions", nargs="*",
                   default=["grayscale", "contrast", "brightness"])
    p.add_argument("--steps", type=int, default=int(720))
    p.add_argument("--width", type=int, default=1280)
    args = p.parse_args()

    import concurrent.futures as cf

    from vimz_tpu.tools.comparison import _demo_input
    from vimz_tpu.circuits import synthesize
    from vimz_tpu.folding import FoldingProver
    from vimz_tpu.folding.relaxed import DeviceR1CS
    from vimz_tpu.pipeline.input import Transformation

    t_all = time.time()
    results = []
    pool = cf.ThreadPoolExecutor(max_workers=1)

    def prep(name):
        t = Transformation(name)
        inp = _demo_input(t, args.steps, args.width)
        return t, synthesize(t, inp)

    nxt = pool.submit(prep, args.functions[0])
    for i, name in enumerate(args.functions):
        t, r1cs = nxt.result()
        if i + 1 < len(args.functions):
            nxt = pool.submit(prep, args.functions[i + 1])  # overlap host prep
        t0 = time.time()
        prover = FoldingProver(DeviceR1CS(r1cs))
        proof = prover.prove(r1cs)
        dt = time.time() - t0
        results.append(dict(transformation=name, steps=r1cs.S, prove_s=round(dt, 2),
                            steps_per_sec=round(r1cs.S / dt, 2)))
        print(f"  {name}: {r1cs.S} steps in {dt:.1f}s", flush=True)

    total = time.time() - t_all
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps(dict(
        results=results,
        total_s=round(total, 2),
        aggregate_steps_per_sec=round(sum(r["steps"] for r in results) / total, 2),
        peak_rss_gb=round(peak_rss_gb, 2),
    )))


if __name__ == "__main__":
    main()
