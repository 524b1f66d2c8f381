"""Compression SNARK tests: sumcheck, IPA, and end-to-end Spartan over a
folded instance (tiny circuits; CPU mesh via conftest)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vimz_tpu.fields.limbs import FR_LIMBS as F
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.snark.sumcheck import (
    eq_eval,
    eq_table,
    lagrange_eval,
    sumcheck_prove,
    sumcheck_verify,
)
from vimz_tpu.snark.transcript import Transcript


def _rand_vec(rng, n):
    return np.array([int(rng.integers(0, 2**62)) ** 4 % P for _ in range(n)], dtype=object)


def _mle_eval(table, point):
    """Host multilinear extension evaluation (point[0] = top bit)."""
    vals = [int(v) % P for v in table]
    for r in point:
        half = len(vals) // 2
        vals = [(lo + r * (hi - lo)) % P for lo, hi in zip(vals[:half], vals[half:])]
    return vals[0]


def test_eq_table_matches_eq_eval():
    rng = np.random.default_rng(0)
    point = [int(x) for x in _rand_vec(rng, 3)]
    table = F.from_limbs_mont(np.asarray(eq_table(point)))
    for i in range(8):
        bits = [(i >> (2 - j)) & 1 for j in range(3)]
        assert int(table[i]) == eq_eval(point, bits)


def test_sumcheck_product_roundtrip():
    rng = np.random.default_rng(1)
    n = 16
    a = _rand_vec(rng, n)
    b = _rand_vec(rng, n)
    claim = int(sum(int(x) * int(y) % P for x, y in zip(a, b)) % P)
    am = jnp.asarray(F.to_limbs_mont(a))
    bm = jnp.asarray(F.to_limbs_mont(b))

    tr = Transcript(b"test")
    rounds, rs, finals = sumcheck_prove([am, bm], lambda x, y: F.mul(x, y), 2, claim, tr)

    tr2 = Transcript(b"test")
    ok, rs2, final_claim = sumcheck_verify(4, 2, claim, rounds, tr2)
    assert ok and rs2 == rs
    assert final_claim == finals[0] * finals[1] % P
    # final table values are the MLE evaluations at rs
    assert finals[0] == _mle_eval(a, rs)
    assert finals[1] == _mle_eval(b, rs)

    # tampered message fails the claim chain
    bad = [list(r) for r in rounds]
    bad[1][0] = (bad[1][0] + 1) % P
    tr3 = Transcript(b"test")
    ok3, _, fc3 = sumcheck_verify(4, 2, claim, bad, tr3)
    assert ok3  # structure fine ...
    assert fc3 != finals[0] * finals[1] % P  # ... but the reduced claim moved


def test_ipa_roundtrip():
    from vimz_tpu.curves import bn254_batched
    from vimz_tpu.snark.ipa import ipa_prove, ipa_verify

    curve = bn254_batched()
    rng = np.random.default_rng(2)
    N = 8
    a = _rand_vec(rng, N)
    b = _rand_vec(rng, N)
    v = int(sum(int(x) * int(y) % P for x, y in zip(a, b)) % P)
    bases = curve.pedersen_bases(N)
    comm = curve.to_affine_ints(curve.msm(jnp.asarray(F.to_limbs(a)), bases))[0]

    am = jnp.asarray(F.to_limbs_mont(a))
    bm = jnp.asarray(F.to_limbs_mont(b))
    tr = Transcript(b"ipa-test")
    proof = ipa_prove(curve, am, bm, bases, tr)

    tr2 = Transcript(b"ipa-test")
    assert ipa_verify(curve, comm, v, bm, bases, proof, tr2)

    tr3 = Transcript(b"ipa-test")
    assert not ipa_verify(curve, comm, (v + 1) % P, bm, bases, proof, tr3)

    from vimz_tpu.snark.ipa import IPAProof

    bad = IPAProof(L=proof.L, R=proof.R, a_final=(proof.a_final + 1) % P)
    tr4 = Transcript(b"ipa-test")
    assert not ipa_verify(curve, comm, v, bm, bases, bad, tr4)


@pytest.mark.slow
def test_compressed_fold_proof_hash_circuit():
    """End-to-end: fold the hash circuit, compress, verify; proof is small."""
    from vimz_tpu.circuits import synthesize
    from vimz_tpu.editor.ops import pack_words_rows
    from vimz_tpu.folding import FoldingProver, FoldingVerifier
    from vimz_tpu.folding.relaxed import DeviceR1CS
    from vimz_tpu.pipeline.input import Transformation, VIMzInput

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (4, 20, 3), dtype=np.uint8)
    inp = VIMzInput(pack_words_rows(img), None, {})
    r1cs = synthesize(Transformation.HASH, inp)
    d = DeviceR1CS(r1cs)

    proof = FoldingProver(d).prove(r1cs, compress=True)
    assert proof.w_final is None and proof.spartan is not None

    z0 = [int(v) for v in r1cs.inputs[0, :1]]
    zn = [int(v) for v in r1cs.inputs[-1, 1:2]]
    verifier = FoldingVerifier(d)
    assert verifier.verify(proof, z0, zn)
    assert not verifier.verify(proof, z0, [(zn[0] + 1) % P])

    # compressed proof must not carry the witness: size is tree + spartan only
    assert proof.size_bytes() < 64 * 1024

    # tampering with the spartan scalar claims must fail
    import dataclasses

    bad_sp = dataclasses.replace(proof.spartan, vA=(proof.spartan.vA + 1) % P)
    bad = dataclasses.replace(proof, spartan=bad_sp)
    assert not verifier.verify(bad, z0, zn)
