"""vimz-tpu CLI — command-line mirror of the reference prover binary.

Flags follow the reference's clap config (vimz/src/config.rs:23-82):
--input/-i, --output/-o, --function/-f, --resolution/-r, --demo,
--source-image, --target-image. The backend/frontend selectors are accepted
for compatibility but there is a single native backend (the TPU fold tree).
"""

from __future__ import annotations

import argparse
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="vimz-tpu", description="TPU-native VIMz prover")
    p.add_argument("--input", "-i", required=True, help="witness JSON (image-editor output)")
    p.add_argument("--output", "-o", help="where to write the proof artifact")
    p.add_argument("--function", "-f", required=True, help="transformation name")
    p.add_argument("--resolution", "-r", default="HD", help="SD|HD|FHD|4K|8K")
    p.add_argument("--backend", "-b", default="tpu-fold", help="accepted for compat; native only")
    p.add_argument("--frontend", default="native", help="accepted for compat")
    p.add_argument("--demo", action="store_true", help=f"truncate to 10 fold steps")
    p.add_argument("--source-image", help="PNG to check the final source hash against")
    p.add_argument("--target-image", help="PNG to check the final target hash against")
    p.add_argument("--no-verify", action="store_true", help="skip verification (bench mode)")
    p.add_argument(
        "--compress",
        action="store_true",
        help="compress the final instance with the Spartan-style SNARK "
        "(the reference's CompressedSNARK/decider stage)",
    )
    p.add_argument(
        "--device",
        choices=["default", "cpu"],
        default="default",
        help="compute device; 'cpu' forces the host backend (small inputs, CI)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from vimz_tpu.utils.backend import enable_compile_cache, force_cpu

    if args.device == "cpu":
        force_cpu()

    # Persistent XLA compile cache: the limb/EC kernels are compile-heavy
    # (minutes on first use); reuse compiled artifacts across CLI runs.
    import jax

    enable_compile_cache(jax.default_backend())

    from vimz_tpu.folding import FoldingVerifier
    from vimz_tpu.pipeline.input import Resolution, Transformation, VIMzInput
    from vimz_tpu.pipeline import prover as pp

    transformation = Transformation(args.function.lower())
    resolution = Resolution(args.resolution.upper())
    inp = VIMzInput.from_file(args.input)

    print(f"vimz-tpu: proving {transformation.value} @ {resolution.value}"
          f"{' (demo)' if args.demo else ''}")
    result = pp.prove(
        transformation, inp, resolution, demo=args.demo, progress=True,
        compress=args.compress,
    )
    print(f"  synthesize: {result.timings['synthesize_s']:.2f}s"
          f"  setup: {result.timings['setup_s']:.2f}s"
          f"  fold: {result.timings['fold_s']:.2f}s")
    print(f"  constraints/step: {result.n_constraints}  wires/step: {result.n_wires}")
    print(f"  proof size: {result.proof.size_bytes()} bytes")

    if not args.no_verify:
        t0 = time.time()
        from vimz_tpu.circuits import synthesize
        from vimz_tpu.folding.relaxed import DeviceR1CS

        steps = pp.DEMO_STEPS if args.demo else None
        r1cs = synthesize(transformation, inp, resolution, steps)
        verifier = FoldingVerifier(DeviceR1CS(r1cs))
        ok = verifier.verify(result.proof, result.z0, result.zn)
        print(f"  IVC verification: {'OK' if ok else 'FAILED'} ({time.time()-t0:.2f}s)")
        if not ok:
            sys.exit(1)

        def load(path):
            import numpy as np
            from PIL import Image

            with Image.open(path) as im:
                return np.array(im)

        src = load(args.source_image) if args.source_image else None
        tgt = load(args.target_image) if args.target_image else None
        if src is not None or tgt is not None:
            ok = pp.verify(result, transformation, src, tgt, demo=args.demo)
            print(f"  final-state vs image hashes: {'OK' if ok else 'FAILED'}")
            if not ok:
                sys.exit(1)

    if args.output:
        pp.save_proof(result, args.output)
        print(f"  proof written to {args.output}")


if __name__ == "__main__":
    main()
