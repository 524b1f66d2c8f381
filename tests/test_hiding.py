"""Hiding (blinded) commitments — VERDICT r4 item 7 / SECURITY.md §1.

Commitments are C = <v, G> + r*H with a fresh uniform blind per leaf and
per cross-term; blinds fold linearly through the tree and only the final
blinds are revealed (uncompressed) or absorbed into the blinded IPA
openings (compressed).
"""

import copy

import numpy as np
import pytest

from vimz_tpu.circuits import synthesize
from vimz_tpu.editor import convert_to_grayscale
from vimz_tpu.folding import FoldingProver, FoldingVerifier
from vimz_tpu.folding.relaxed import DeviceR1CS
from vimz_tpu.fields.prime import P_FR as P
from vimz_tpu.pipeline.input import Transformation

from tests.test_circuits import make_input, tiny_image


@pytest.fixture(scope="module")
def setup():
    img = tiny_image(h=4, w=20, seed=31)
    inp = make_input(img, convert_to_grayscale(img))
    r1cs = synthesize(Transformation.GRAYSCALE, inp)
    d = DeviceR1CS(r1cs)
    zn = [int(v) for v in r1cs.witness[-1, 1 + 2 : 1 + 4]]
    return r1cs, d, zn


def test_blinded_prove_verifies_and_hides(setup, monkeypatch):
    r1cs, d, zn = setup
    monkeypatch.setenv("VIMZ_HIDING", "1")
    blinded = FoldingProver(d).prove(r1cs, rng=np.random.default_rng(7))
    monkeypatch.setenv("VIMZ_HIDING", "0")
    plain = FoldingProver(d).prove(r1cs)

    # identical witnesses, different commitments: the blind is doing work
    assert blinded.leaf_comm_w != plain.leaf_comm_w
    assert all(b != p for b, p in zip(blinded.leaf_comm_w, plain.leaf_comm_w))
    assert blinded.r_w_final is not None and 0 < blinded.r_w_final < P
    assert plain.r_w_final is None

    v = FoldingVerifier(d)
    assert v.verify(blinded, [0, 0], zn)
    assert v.verify(plain, [0, 0], zn)


def test_blinds_are_fresh_per_prove(setup, monkeypatch):
    r1cs, d, zn = setup
    monkeypatch.setenv("VIMZ_HIDING", "1")
    p1 = FoldingProver(d).prove(r1cs)  # cryptographic randomness
    p2 = FoldingProver(d).prove(r1cs)
    assert p1.leaf_comm_w != p2.leaf_comm_w  # same witness, fresh blinds
    assert FoldingVerifier(d).verify(p1, [0, 0], zn)
    assert FoldingVerifier(d).verify(p2, [0, 0], zn)


def test_verify_rejects_tampered_blind(setup, monkeypatch):
    r1cs, d, zn = setup
    monkeypatch.setenv("VIMZ_HIDING", "1")
    proof = FoldingProver(d).prove(r1cs, rng=np.random.default_rng(9))
    v = FoldingVerifier(d)
    assert v.verify(proof, [0, 0], zn)

    bad = copy.deepcopy(proof)
    bad.r_w_final = (bad.r_w_final + 1) % P
    assert not v.verify(bad, [0, 0], zn)
    bad2 = copy.deepcopy(proof)
    bad2.r_e_final = (bad2.r_e_final + 1) % P
    assert not v.verify(bad2, [0, 0], zn)
    # stripping the blinds entirely must also fail (commitments were blinded)
    bad3 = copy.deepcopy(proof)
    bad3.r_w_final = bad3.r_e_final = None
    assert not v.verify(bad3, [0, 0], zn)
