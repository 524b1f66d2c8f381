"""End-to-end folding tests on a tiny grayscale proof."""

import numpy as np
import pytest

from vimz_tpu.circuits import synthesize
from vimz_tpu.editor import convert_to_grayscale
from vimz_tpu.folding import FoldingProver, FoldingVerifier
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.pipeline.input import Transformation

from tests.test_circuits import make_input, tiny_image


@pytest.fixture(scope="module")
def grayscale_setup():
    img = tiny_image(h=4, w=20, seed=11)
    inp = make_input(img, convert_to_grayscale(img))
    r1cs = synthesize(Transformation.GRAYSCALE, inp)
    d = DeviceR1CS(r1cs)
    prover = FoldingProver(d)
    proof = prover.prove(r1cs)
    z0 = [0, 0]
    zn = [int(v) for v in r1cs.witness[-1, 1 + 2 : 1 + 4]]  # x[out] of last step
    return r1cs, d, prover, proof, z0, zn


def test_device_r1cs_residual_zero(grayscale_setup):
    import jax.numpy as jnp
    from vimz_tpu.fields.limbs import FR_LIMBS as f

    r1cs, d, *_ = grayscale_setup
    z = f.to_mont(jnp.asarray(f.to_limbs(r1cs.witness)))
    u = jnp.asarray(f.to_limbs_mont(np.array([1] * z.shape[0], dtype=object)))
    e = jnp.zeros((z.shape[0], d.n_constraints, 16), dtype=jnp.uint32)
    res = d.residual(z, u, e)
    assert bool(np.all(np.asarray(f.is_zero(res))))


def test_fold_and_verify(grayscale_setup):
    r1cs, d, prover, proof, z0, zn = grayscale_setup
    verifier = FoldingVerifier(d)
    assert verifier.verify(proof, z0, zn)


def test_verify_rejects_wrong_final_state(grayscale_setup):
    r1cs, d, prover, proof, z0, zn = grayscale_setup
    verifier = FoldingVerifier(d)
    bad_zn = [zn[0], (zn[1] + 1) % (2**200)]
    assert not verifier.verify(proof, z0, bad_zn)


def test_multichunk_streaming_matches_verifier(monkeypatch):
    """S > LEAF_CHUNK exercises chunk subtrees + the tail-overlap window +
    the span-stop (chunks leave multi-instance fronts; the top tree folds
    the remaining levels). The verifier recomputes one global tree, so
    agreement proves the streaming order is bit-identical to a
    level-by-level fold."""
    monkeypatch.setenv("VIMZ_CHUNK_SPAN", "2")  # chunks stop at span-2 roots
    img = tiny_image(h=10, w=20, seed=13)
    inp = make_input(img, convert_to_grayscale(img))
    r1cs = synthesize(Transformation.GRAYSCALE, inp)
    d = DeviceR1CS(r1cs)
    prover = FoldingProver(d)
    prover.LEAF_CHUNK = 4  # 2 full chunks + a 2-leaf tail (overlap path)
    proof = prover.prove(r1cs)
    zn = [int(v) for v in r1cs.witness[-1, 1 + 2 : 1 + 4]]
    assert FoldingVerifier(d).verify(proof, [0, 0], zn)


@pytest.mark.slow
def test_adaptive_chunking_64_steps(monkeypatch):
    """64 fold steps through the ADAPTIVE pair-chunk path (VIMZ_PAIR_CHUNK
    unset — the configuration every non-test prove runs, which the rest of
    the suite pins to 8). PAIR_MEM_BUDGET is shrunk so the adaptive formula
    lands on a nontrivial chunk (16) even for the tiny test circuit, giving
    the same multi-batch level structure the TPU HD prove uses."""
    monkeypatch.delenv("VIMZ_PAIR_CHUNK", raising=False)
    monkeypatch.setenv("VIMZ_MSM_IMPL", "ladder")
    img = tiny_image(h=64, w=20, seed=17)
    inp = make_input(img, convert_to_grayscale(img))
    r1cs = synthesize(Transformation.GRAYSCALE, inp)
    d = DeviceR1CS(r1cs)
    per_pair = (4 * d.n_wires + 10 * d.n_constraints) * 64
    monkeypatch.setattr(FoldingProver, "PAIR_MEM_BUDGET", per_pair * 16)
    prover = FoldingProver(d)
    assert prover.PAIR_CHUNK == 16, "adaptive sizing must engage"
    proof = prover.prove(r1cs)
    zn = [int(v) for v in r1cs.witness[-1, 1 + 2 : 1 + 4]]
    assert FoldingVerifier(d).verify(proof, [0, 0], zn)


def test_verify_rejects_tampered_chain(grayscale_setup):
    import copy

    r1cs, d, prover, proof, z0, zn = grayscale_setup
    verifier = FoldingVerifier(d)
    bad = copy.deepcopy(proof)
    bad.x_rows[1, 0] = (bad.x_rows[1, 0] + 1)
    assert not verifier.verify(bad, z0, zn)


def test_verify_rejects_tampered_witness(grayscale_setup):
    import copy

    r1cs, d, prover, proof, z0, zn = grayscale_setup
    verifier = FoldingVerifier(d)
    bad = copy.deepcopy(proof)
    bad.w_final[3] = (bad.w_final[3] + 1)
    assert not verifier.verify(bad, z0, zn)
