"""analyze-circuits — per-circuit constraint/wire statistics.

The reference scrapes circom compile logs into circuit_parameters.csv
(pyvimz/pyvimz/circuits/analyze_circuits.py:12-44, output:
circuits/nova_snark/circuit_parameters.csv). Here the circuits are native,
so the numbers come straight from the synthesized structures; the published
reference counts are embedded for comparison.

Usage: analyze-circuits [--width-words 128] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import sys

# Reference per-step non-linear constraint / wire counts at HD
# (/root/reference/circuits/nova_snark/circuit_parameters.csv:1-10).
REFERENCE_COUNTS = {
    "hash": (6_672, 6_787),
    "grayscale": (120_864, 118_307),
    "resize": (241_968, 234_291),
    "blur": (248_934, 241_257),
    "brightness": (305_184, 289_829),
    "contrast": (305_184, 289_829),
    "sharpness": (325_734, 310_377),
    "crop": (672_272, 671_633),
    "redact": (None, None),  # reference CSV omits redact
}


def circuit_stats(width_words: int = 128) -> list[dict]:
    from vimz_tpu.circuits.spec import build_structure
    from vimz_tpu.pipeline.input import Transformation

    rows = []
    for t in Transformation:
        n_ext = t.step_input_width(width_words)
        b = build_structure(t, n_ext, {})
        ref_c, ref_w = REFERENCE_COUNTS.get(t.value, (None, None))
        rows.append(
            dict(
                transformation=t.value,
                constraints=len(b.a_rows),
                wires=b.n_wires,
                inputs=b.n_inputs,
                publics=b.n_pub,
                tape_ops=len(b.tape),
                ref_constraints=ref_c,
                ref_wires=ref_w,
            )
        )
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(prog="analyze-circuits")
    p.add_argument("--width-words", type=int, default=128, help="row width in packed words (HD=128)")
    p.add_argument("--csv", help="also write a CSV like the reference's circuit_parameters.csv")
    args = p.parse_args(argv)

    rows = circuit_stats(args.width_words)
    hdr = f"{'circuit':<12}{'constraints':>12}{'wires':>10}{'inputs':>8}{'ref constraints':>17}{'ratio':>8}"
    print(hdr)
    print("-" * len(hdr))
    for r in sorted(rows, key=lambda r: r["constraints"]):
        ratio = (
            f"{r['constraints'] / r['ref_constraints']:.2f}x"
            if r["ref_constraints"]
            else "-"
        )
        ref = str(r["ref_constraints"]) if r["ref_constraints"] else "-"
        print(
            f"{r['transformation']:<12}{r['constraints']:>12}{r['wires']:>10}"
            f"{r['inputs']:>8}{ref:>17}{ratio:>8}"
        )

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("circuit,constraints,wires,inputs,publics,tape_ops\n")
            for r in rows:
                f.write(
                    f"{r['transformation']},{r['constraints']},{r['wires']},"
                    f"{r['inputs']},{r['publics']},{r['tape_ops']}\n"
                )
        print(f"\nwritten: {args.csv}", file=sys.stderr)


if __name__ == "__main__":
    main()
