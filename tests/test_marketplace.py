"""Marketplace layer tests: scenario suite + real-proof on-chain verification."""

import numpy as np
import pytest

from vimz_tpu.marketplace.chain import Chain
from vimz_tpu.marketplace.scenarios import (
    attribution_claim,
    marketplace,
    photography_contest,
    register_images,
)


def test_register_images_scenario():
    register_images(Chain())


def test_marketplace_scenario():
    marketplace(Chain())


def test_photography_contest_scenario():
    photography_contest(Chain())


def test_attribution_claim_scenario():
    attribution_claim(Chain())


@pytest.mark.slow
def test_native_verifier_real_proof():
    """Full loop: prove a tiny grayscale edit, encode calldata, register the
    edition through the gateway with the REAL cryptographic verifier."""
    import time

    from vimz_tpu.circuits import synthesize
    from vimz_tpu.editor import convert_to_grayscale
    from vimz_tpu.editor.ops import pack_words_rows
    from vimz_tpu.folding import FoldingProver
    from vimz_tpu.folding.relaxed import DeviceR1CS
    from vimz_tpu.marketplace.contracts import (
        EditionPolicy,
        LicenseTerms,
        OnChainVerification,
        Transformation,
    )
    from vimz_tpu.marketplace.sdk import (
        NativeVerifier,
        full_setup,
        register_creator,
        register_device,
        sign_capture,
    )
    from vimz_tpu.pipeline.artifacts import proof_to_words
    from vimz_tpu.pipeline.input import Transformation as T
    from vimz_tpu.pipeline.input import VIMzInput

    rng = np.random.default_rng(5)
    steps, width = 4, 20
    img = rng.integers(0, 256, (steps, width, 3), dtype=np.uint8)
    inp = VIMzInput(pack_words_rows(img), pack_words_rows(convert_to_grayscale(img)), {})
    r1cs = synthesize(T.GRAYSCALE, inp)
    proof = FoldingProver(DeviceR1CS(r1cs)).prove(r1cs)
    words = proof_to_words(proof)
    src_hash = int(r1cs.inputs[-1, 2])
    tgt_hash = int(r1cs.inputs[-1, 3])

    verifier = NativeVerifier(Transformation.GRAYSCALE, width_words=width // 10)
    OnChainVerification.STEPS = steps  # tiny-resolution test config
    try:
        chain = Chain()
        creg, dreg, gateway, admin = full_setup(
            chain, verifiers={Transformation.GRAYSCALE: verifier}
        )
        alice = register_creator(chain, creg, admin, "alice")
        device = register_device(chain, dreg, admin, "acme", "cam")
        ct = int(time.time()) - 5
        sig = sign_capture(device, alice, src_hash, ct)
        gateway.register_new_image(
            alice, src_hash, ct, LicenseTerms(EditionPolicy.FREE), device.public_key, sig
        )
        gateway.register_edited_image(
            alice, tgt_hash, src_hash, Transformation.GRAYSCALE, [], words
        )
        assert gateway.images[tgt_hash].parent_hash == src_hash

        # a proof for different hashes must NOT register
        from vimz_tpu.marketplace.chain import Revert

        try:
            gateway.register_edited_image(
                alice, 0xBAD, src_hash, Transformation.GRAYSCALE, [], words
            )
            raise AssertionError("expected revert")
        except Revert as r:
            assert str(r) == "Invalid transformation proof"
    finally:
        OnChainVerification.STEPS = 720
