"""comparison — cross-pipeline benchmark harness.

Mirror of the reference's `comparison` binary (vimz/src/bin/comparison.rs:
66-406), which times {nova-scotia, sonobe-circom, sonobe-arkworks} pipelines
on identical inputs and tables folding time + circuit sizes. This framework
has one circuit frontend and two proof modes, so the compared pipelines are:

- `fold`            tree-fold only (IVC gate, clear final witness)
- `fold+compress`   tree-fold + Spartan compression (decider analog)

Usage: python -m vimz_tpu.tools.comparison [-f grayscale ...] [--steps 10]
       [--rows 20]  (defaults to demo-size inputs, like the reference's
       `--demo` comparison mode, comparison.rs DEMO handling)
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _demo_input(t, steps: int, width: int):
    from vimz_tpu.editor import (
        adjust_brightness,
        adjust_contrast,
        blur_image,
        convert_to_grayscale,
        redact_image,
        resize_image,
        sharpen_image,
    )
    from vimz_tpu.editor.ops import pack_words_blocks, pack_words_rows
    from vimz_tpu.pipeline.input import Transformation, VIMzInput

    rng = np.random.default_rng(7)
    T = Transformation

    if t == T.REDACT:
        img = rng.integers(0, 256, (40, max(40 * steps, 40), 3), dtype=np.uint8)
        tran, ind = redact_image(img)
        return VIMzInput(
            pack_words_blocks(img), pack_words_blocks(tran), {"redact": ind}
        )
    if t == T.RESIZE:
        img = rng.integers(0, 256, (3 * steps, width, 3), dtype=np.uint8)
        tran = resize_image(img, 2 * steps, width // 2)
        return VIMzInput(pack_words_rows(img), pack_words_rows(tran), {})

    img = rng.integers(0, 256, (steps, width, 3), dtype=np.uint8)
    if t in (T.BLUR, T.SHARPNESS):
        fn = blur_image if t == T.BLUR else sharpen_image
        zero = np.zeros((1, width, 3), dtype=np.uint8)
        return VIMzInput(
            pack_words_rows(np.concatenate([zero, img, zero])),
            pack_words_rows(fn(img)),
            {},
        )
    if t == T.GRAYSCALE:
        return VIMzInput(pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {})
    if t == T.BRIGHTNESS:
        return VIMzInput(pack_words_rows(img), pack_words_rows(adjust_brightness(img, 1.4)), {"factor": 14})
    if t == T.CONTRAST:
        return VIMzInput(pack_words_rows(img), pack_words_rows(adjust_contrast(img, 1.4)), {"factor": 14})
    if t == T.CROP:
        return VIMzInput(pack_words_rows(img), None, {"info": 0})
    if t == T.HASH:
        return VIMzInput(pack_words_rows(img), None, {})
    raise ValueError(t)


def run_one(t, steps: int, width: int, compress: bool) -> dict:
    from vimz_tpu.circuits import synthesize
    from vimz_tpu.folding import FoldingProver, FoldingVerifier
    from vimz_tpu.folding.relaxed import DeviceR1CS

    inp = _demo_input(t, steps, width)
    t0 = time.time()
    r1cs = synthesize(t, inp)
    t_synth = time.time() - t0
    d = DeviceR1CS(r1cs)
    prover = FoldingProver(d)
    t0 = time.time()
    proof = prover.prove(r1cs, compress=compress)
    t_fold = time.time() - t0
    state_len = r1cs.n_pub // 2
    z0 = [int(v) for v in r1cs.inputs[0, :state_len]]
    zn = [int(v) for v in r1cs.inputs[-1, state_len : 2 * state_len]]
    t0 = time.time()
    ok = FoldingVerifier(d).verify(proof, z0, zn)
    t_verify = time.time() - t0
    return dict(
        transformation=t.value,
        pipeline="fold+compress" if compress else "fold",
        steps=r1cs.S,
        constraints=r1cs.n_constraints,
        wires=r1cs.n_wires,
        synth_s=t_synth,
        fold_s=t_fold,
        verify_s=t_verify,
        proof_bytes=proof.size_bytes(),
        verified=ok,
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="vimz-comparison")
    p.add_argument("-f", "--functions", nargs="*", default=["grayscale"],
                   help="transformations to compare")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--rows", "--width", dest="width", type=int, default=20,
                   help="row width in pixels (HD=1280)")
    p.add_argument("--pipelines", nargs="*", default=["fold", "fold+compress"])
    args = p.parse_args(argv)

    from vimz_tpu.pipeline.input import Transformation

    rows = []
    for name in args.functions:
        t = Transformation(name.lower())
        for pipe in args.pipelines:
            rows.append(run_one(t, args.steps, args.width, pipe == "fold+compress"))

    hdr = (f"{'circuit':<12}{'pipeline':<15}{'steps':>6}{'constraints':>12}"
           f"{'fold s':>9}{'verify s':>9}{'proof B':>10}{'ok':>4}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(
            f"{r['transformation']:<12}{r['pipeline']:<15}{r['steps']:>6}"
            f"{r['constraints']:>12}{r['fold_s']:>9.2f}{r['verify_s']:>9.2f}"
            f"{r['proof_bytes']:>10}{'Y' if r['verified'] else 'N':>4}"
        )


if __name__ == "__main__":
    main()
