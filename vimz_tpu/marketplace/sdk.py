"""Marketplace SDK: deployment helpers, verifier wiring, proof artifacts.

Mirror of the reference's vimz_marketplace_sdk (chain actors/funding
chain.py:26-150, full_setup scenarios/__init__.py:30-47, ProofData
artifacts.py:20-46, transformation -> public-input mapping types.py:41-56),
over the in-process chain simulator.

`NativeVerifier` is the on-chain verifier stand-in that actually verifies
this framework's proofs (fold tree + optional Spartan compression): the
simulator analog of the generated NovaDecider contracts.
"""

from __future__ import annotations

from dataclasses import dataclass

from vimz_tpu.marketplace.chain import Chain
from vimz_tpu.marketplace.contracts import (
    AttributionClaim,
    CreatorRegistry,
    DeviceRegistry,
    ImageGateway,
    LicenseTerms,
    Marketplace,
    OnChainVerification,
    PhotographyContest,
    Transformation,
    device_message,
)

TRANSFORMATION_NAMES = {
    Transformation.BLUR: "blur",
    Transformation.BRIGHTNESS: "brightness",
    Transformation.CONTRAST: "contrast",
    Transformation.CROP: "crop",
    Transformation.GRAYSCALE: "grayscale",
    Transformation.REDACT: "redact",
    Transformation.RESIZE: "resize",
    Transformation.SHARPNESS: "sharpness",
}


class AcceptAllVerifier:
    """Test double for contract-logic scenarios (the reference's golden
    .proof fixtures play this role against light-test verifiers)."""

    def verify_opaque_nova_proof_with_inputs(self, steps, init_state, final_state, words):
        return True


class RejectVerifier:
    def verify_opaque_nova_proof_with_inputs(self, steps, init_state, final_state, words):
        return False


@dataclass
class NativeVerifier:
    """Cryptographic verifier for one transformation's step circuit.

    verify_opaqueNovaProofWithInputs semantics: the words encode a full
    FoldProof (pipeline/artifacts.py); the IVC public IO must chain from
    init_state to final_state over `steps` fold steps.
    """

    transformation: Transformation
    width_words: int = 128
    ctx: dict | None = None

    def __post_init__(self):
        self._device = None

    def _verifier(self):
        if self._device is None:
            from vimz_tpu.circuits.spec import build_structure
            from vimz_tpu.folding import FoldingVerifier
            from vimz_tpu.folding.relaxed import DeviceR1CS
            from vimz_tpu.pipeline.input import Transformation as T

            t = T(TRANSFORMATION_NAMES[self.transformation])
            n_ext = t.step_input_width(self.width_words)
            b = build_structure(t, n_ext, self.ctx or {})
            import numpy as np

            r1cs = b.finalize(np.zeros((1, b.n_inputs), dtype=object))
            self._device = FoldingVerifier(DeviceR1CS(r1cs))
        return self._device

    def verify_opaque_nova_proof_with_inputs(self, steps, init_state, final_state, words):
        from vimz_tpu.pipeline.artifacts import words_to_proof

        try:
            proof = words_to_proof(list(words))
        except (ValueError, IndexError):
            return False
        if proof.steps != steps:
            return False
        return self._verifier().verify(proof, list(init_state), list(final_state))


def full_setup(
    chain: Chain,
    verifiers: dict | None = None,
    default_verifier=None,
):
    """Deploy registries + gateway with per-transformation verifiers
    (scenarios/__init__.py:30-47 analog). Returns (creator_registry,
    device_registry, gateway, admin)."""
    admin = chain.account("admin")
    creator_registry = chain.deploy(CreatorRegistry(admin))
    device_registry = chain.deploy(DeviceRegistry(admin))
    default = default_verifier or AcceptAllVerifier()
    vmap = {t: default for t in Transformation if t != Transformation.NO_TRANSFORMATION}
    if verifiers:
        vmap.update(verifiers)
    gateway = chain.deploy(ImageGateway(creator_registry, device_registry, vmap))
    return creator_registry, device_registry, gateway, admin


def register_creator(chain, creator_registry, admin, name: str, days: int = 365):
    import time

    creator = chain.account(name)
    creator_registry.register_creator(admin, creator, int(time.time()) + days * 86400, f"{name}@example.com")
    return creator


def register_device(chain, device_registry, admin, registrar_name: str, device_name: str):
    registrar = chain.account(registrar_name)
    if registrar.address not in device_registry.registrars:
        device_registry.register_registrar(admin, registrar)
    device = chain.account(device_name)
    device_registry.register_device(registrar, device.public_key)
    return device


def sign_capture(device, creator, image_hash: int, capture_time: int) -> bytes:
    return device.sign(device_message(creator.address, image_hash, capture_time))
