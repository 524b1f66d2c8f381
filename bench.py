#!/usr/bin/env python3
"""Benchmark driver — prints ONE JSON line with the headline metric.

Metric: end-to-end HD fold-prove throughput (fold steps/sec) for the chosen
transformation: witness JSON semantics -> batched device witness generation
-> leaf Pedersen commitments -> log-depth fold tree -> final folded instance.
Baselines are the reference's published HD prove times on a Ryzen 9 server
(BASELINE.md, /root/reference/README.md:50-56).

Environment knobs:
  VIMZ_BENCH_STEPS   fold steps (default: full HD for the transformation)
  VIMZ_BENCH_T       transformation (default grayscale; any of
                     grayscale/contrast/brightness/blur/sharpness/crop/resize)
"""

import json
import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# (reference Ryzen-9 server prove seconds or None, reference HD fold steps)
BASELINES = {  # README.md:50-56; steps: transformation.rs:93-112
    "grayscale": (240.6, 720),
    "contrast": (371.7, 720),
    "brightness": (372.5, 720),
    "crop": (133.0, 720),
    "resize": (135.7, 240),
    "sharpness": (455.8, 720),
    "blur": (406.0, 720),
    # no published reference prove time for these two; vs_baseline uses the
    # cheapest published transform (crop) as a conservative stand-in
    "redact": (None, 576),  # HD block mode: 576 40x40-block steps
    "hash": (None, 720),
}


def _build_input(t_name: str, steps: int):
    """Random HD-width image + matching witness input for the transformation.

    Returns (VIMzInput, Transformation, n_steps)."""
    import numpy as np

    from vimz_tpu.editor import (
        adjust_brightness,
        adjust_contrast,
        blur_image,
        convert_to_grayscale,
        sharpen_image,
    )
    from vimz_tpu.editor.ops import pack_words_rows
    from vimz_tpu.pipeline.input import Transformation, VIMzInput

    rng = np.random.default_rng(0)
    t = Transformation(t_name)

    if t == Transformation.RESIZE:
        rows = steps * 3
        img = rng.integers(0, 256, (rows, 1280, 3), dtype=np.uint8)
        from vimz_tpu.editor import resize_image

        # 3:2 row / 2:1 col reduction (HD->SD uses new dims 640 x rows*2/3)
        tran = resize_image(img, rows * 2 // 3, 640)
        return VIMzInput(pack_words_rows(img), pack_words_rows(tran), {}), t, steps

    img = rng.integers(0, 256, (steps, 1280, 3), dtype=np.uint8)

    if t == Transformation.GRAYSCALE:
        tran = convert_to_grayscale(img)
        extra = {}
    elif t == Transformation.CONTRAST:
        tran = adjust_contrast(img, 1.4)
        extra = {"factor": 14}
    elif t == Transformation.BRIGHTNESS:
        tran = adjust_brightness(img, 1.4)
        extra = {"factor": 14}
    elif t in (Transformation.BLUR, Transformation.SHARPNESS):
        fn = blur_image if t == Transformation.BLUR else sharpen_image
        tran = fn(img)
        zero = np.zeros((1, 1280, 3), dtype=np.uint8)
        padded = np.concatenate([zero, img, zero])
        return (
            VIMzInput(pack_words_rows(padded), pack_words_rows(tran), extra={}),
            t,
            steps,
        )
    elif t == Transformation.CROP:
        info = (200 << 24) | (100 << 12)
        return VIMzInput(pack_words_rows(img), None, {"info": info}), t, steps
    elif t == Transformation.HASH:
        return VIMzInput(pack_words_rows(img), None, {}), t, steps
    elif t == Transformation.REDACT:
        from vimz_tpu.editor import redact_image
        from vimz_tpu.editor.ops import pack_words_blocks

        n_block_rows = max(1, (steps + 31) // 32)  # 32 blocks per 40-px band
        rows = 40 * n_block_rows
        img = rng.integers(0, 256, (rows, 1280, 3), dtype=np.uint8)
        tran, indicators = redact_image(img)
        n_blocks = n_block_rows * 32
        return (
            VIMzInput(
                pack_words_blocks(img),
                pack_words_blocks(tran),
                {"redact": [int(v) for v in indicators]},
            ),
            t,
            n_blocks,
        )
    else:
        raise SystemExit(f"unsupported VIMZ_BENCH_T={t_name}")

    return VIMzInput(pack_words_rows(img), pack_words_rows(tran), extra), t, steps


def _note(msg):
    import sys

    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    from vimz_tpu.utils.backend import enable_compile_cache

    enable_compile_cache(jax.default_backend())

    from vimz_tpu.circuits import synthesize
    from vimz_tpu.folding import FoldingProver
    from vimz_tpu.folding.relaxed import DeviceR1CS

    t_name = os.environ.get("VIMZ_BENCH_T", "grayscale")
    base_s, base_steps = BASELINES[t_name]
    steps = int(os.environ.get("VIMZ_BENCH_STEPS", str(base_steps)))

    inp, t, steps = _build_input(t_name, steps)
    _note(f"input built: {t_name} x {steps} steps on {jax.devices()[0].platform}")

    t0 = time.time()
    r1cs = synthesize(t, inp)
    t_synth = time.time() - t0
    _note(f"synthesize done in {t_synth:.1f}s ({r1cs.n_constraints} constraints, {r1cs.n_wires} wires)")

    t0 = time.time()
    d = DeviceR1CS(r1cs)
    prover = FoldingProver(d)
    t_setup = time.time() - t0
    _note(f"setup done in {t_setup:.1f}s")

    compress = os.environ.get("VIMZ_BENCH_COMPRESS", "") not in ("", "0")
    t0 = time.time()
    proof = prover.prove(r1cs, progress=True, compress=compress)
    t_prove = time.time() - t0
    _note(f"prove done in {t_prove:.1f}s (proof {proof.size_bytes()} bytes)")

    detail = {
        "steps": steps,
        "synthesize_s": round(t_synth, 2),
        "setup_s": round(t_setup, 2),
        "prove_s": round(t_prove, 2),
        "n_constraints": r1cs.n_constraints,
        "proof_bytes": proof.size_bytes(),
        "compressed": compress,
        "proof_points": len(proof.leaf_comm_w)
        + sum(len(l) for l in proof.node_comm_t),
    }

    if os.environ.get("VIMZ_BENCH_VERIFY", "1") not in ("", "0"):
        from vimz_tpu.folding import FoldingVerifier

        d2 = d  # same structure; the verifier recomputes the public tree
        z0 = [int(v) for v in r1cs.inputs[0, : d.n_pub // 2]]
        zn = [int(v) for v in r1cs.inputs[-1, d.n_pub // 2 : d.n_pub]]
        t0 = time.time()
        ok = FoldingVerifier(d2).verify(proof, z0, zn)
        t_verify = time.time() - t0
        _note(f"verify done in {t_verify:.1f}s -> {ok}")
        detail["verify_s"] = round(t_verify, 2)
        detail["verify_ok"] = bool(ok)

    total = t_synth + t_prove  # setup (key gen) excluded, as in the reference
    steps_per_sec = steps / total
    if base_s is None:
        # no published reference number; report vs the cheapest published
        # transform (crop 133.0 s / 720 steps) as a conservative stand-in
        baseline_steps_per_sec = 720 / 133.0
    else:
        baseline_steps_per_sec = base_steps / base_s
    print(
        json.dumps(
            {
                "metric": f"hd_{t_name}_e2e_prove_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
