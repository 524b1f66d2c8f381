"""End-to-end prover pipeline: witness JSON -> folded proof -> verification.

Mirrors the reference's run flow (vimz/src/sonobe_backend/mod.rs:53-95):
prepare input -> prepare folding -> fold all steps -> verify folding ->
verify final state against independently recomputed image commitments ->
emit proof artifact. The folding itself is the tree-parallel scheme of
vimz_tpu.folding (log-depth, batched MSMs) rather than the reference's
sequential prove_step loop.
"""

from __future__ import annotations


import time
from dataclasses import dataclass

import numpy as np

from vimz_tpu.circuits import synthesize
from vimz_tpu.folding import FoldingProver, FoldingVerifier, FoldProof
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.pipeline.input import Resolution, Transformation, VIMzInput, prepare_step_inputs

DEMO_STEPS = 10  # reference: vimz/src/lib.rs:9


@dataclass
class ProveResult:
    proof: FoldProof
    z0: list
    zn: list
    n_constraints: int
    n_wires: int
    timings: dict


def prove(
    transformation: Transformation,
    inp: VIMzInput,
    resolution: Resolution = Resolution.HD,
    demo: bool = False,
    ctx: dict | None = None,
    progress: bool = False,
    compress: bool = False,
) -> ProveResult:
    steps = DEMO_STEPS if demo else None
    timings = {}

    t0 = time.time()
    r1cs = synthesize(transformation, inp, resolution, steps, ctx)
    timings["synthesize_s"] = time.time() - t0

    t0 = time.time()
    d = DeviceR1CS(r1cs)
    prover = FoldingProver(d)
    timings["setup_s"] = time.time() - t0

    t0 = time.time()
    proof = prover.prove(r1cs, progress=progress, compress=compress)
    timings["fold_s"] = time.time() - t0

    state_len = r1cs.n_pub // 2
    z0 = [int(v) for v in r1cs.inputs[0, :state_len]]
    zn = [int(v) for v in r1cs.inputs[-1, state_len : 2 * state_len]]
    return ProveResult(proof, z0, zn, r1cs.n_constraints, r1cs.n_wires, timings)


def verify(
    result: ProveResult,
    transformation: Transformation,
    source_image: np.ndarray | None = None,
    target_image: np.ndarray | None = None,
    demo: bool = False,
) -> bool:
    """IVC verification + final-state check against image commitments
    (reference: verify_folding + verify_final_state,
    vimz/src/sonobe_backend/folding.rs:68-132)."""
    from vimz_tpu.commit import hash_image_circom

    # NOTE: the verifier needs the circuit structure; rebuild from the proof's
    # R1CS is implicit via the caller sharing DeviceR1CS. Here we only check
    # the final state semantics; callers use FoldingVerifier directly for the
    # cryptographic check (see cli.py which does both).
    nsteps = DEMO_STEPS if demo else None
    if source_image is not None:
        want = hash_image_circom(source_image, nsteps=nsteps)
        if result.zn[0] != want:
            return False
    if target_image is not None and transformation != Transformation.HASH:
        want = hash_image_circom(target_image, nsteps=nsteps)
        if result.zn[1] != want:
            return False
    return True


def save_proof(result: ProveResult, path: str):
    """Versioned hex-JSON proof artifact (proof files are attacker-supplied
    inputs at verification time, so no pickle)."""
    from vimz_tpu.pipeline.artifacts import save_proof_json

    save_proof_json(path, result.proof, result.z0, result.zn)


def load_proof(path: str):
    from vimz_tpu.pipeline.artifacts import load_proof_json

    return load_proof_json(path)
