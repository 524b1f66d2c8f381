"""vimz_tpu — a TPU-native (JAX/XLA/Pallas) prover for verifiable image manipulation.

A from-scratch reimplementation of the capabilities of zero-savvy/vimz
(see /root/reference, SURVEY.md): a Nova-style folding zkSNARK prover showing
that a public edited image was derived from a committed original by an approved
transformation (blur, brightness, contrast, crop, grayscale, hash, redact,
resize, sharpness), processing the image row-by-row as IVC fold steps over
Poseidon running-hash commitments.

The design is TPU-first rather than a port:

- BN254/Grumpkin field arithmetic as vectorized 16x16-bit limb kernels
  (`vimz_tpu.fields`), batched over thousands of field elements at once.
- Poseidon (both the arkworks rate-16 and the circomlib parameterizations,
  reproduced bit-exactly from the Grain-LFSR generation procedure) as batched
  permutations (`vimz_tpu.poseidon`).
- Per-transformation witness generation as vectorized array programs over all
  fold steps at once (`vimz_tpu.circuits`), replacing circom WASM/C++ witness
  generators.
- Relaxed-R1CS folding with Pedersen/MSM commitments, restructured into a
  log-depth fold tree so the per-step MSMs batch across the whole image
  (`vimz_tpu.folding`), instead of the reference's strictly serial fold loop
  (reference: vimz/src/sonobe_backend/folding.rs:52-65).
"""

__version__ = "0.1.0"
