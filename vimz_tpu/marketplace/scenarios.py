"""End-to-end marketplace scenarios (ports of marketplace/scenarios/*.py).

Each scenario runs against the in-process chain simulator; negative steps
assert exact revert strings like the reference's scenario suite
(marketplace/scenarios/register_images.py:57-77). Run directly:

    python -m vimz_tpu.marketplace.scenarios
"""

from __future__ import annotations

import time

from vimz_tpu.marketplace.chain import Chain, Revert
from vimz_tpu.marketplace.contracts import (
    AttributionClaim,
    EditionPolicy,
    LicenseTerms,
    Marketplace,
    PhotographyContest,
    Transformation,
)
from vimz_tpu.marketplace.sdk import (
    AcceptAllVerifier,
    RejectVerifier,
    full_setup,
    register_creator,
    register_device,
    sign_capture,
)


def _expect_revert(msg: str, fn, *args, **kwargs):
    try:
        fn(*args, **kwargs)
    except Revert as r:
        assert str(r) == msg, f"expected revert {msg!r}, got {r!r}"
        return
    raise AssertionError(f"expected revert {msg!r}, but call succeeded")


def register_images(chain: Chain | None = None, verifiers=None):
    """Original + edition registration incl. negative paths
    (port of marketplace/scenarios/register_images.py)."""
    chain = chain or Chain()
    creg, dreg, gateway, admin = full_setup(chain, verifiers=verifiers)
    alice = register_creator(chain, creg, admin, "alice")
    device = register_device(chain, dreg, admin, "acme", "camera-1")

    image_hash = 0x1234
    capture_time = int(time.time()) - 100
    sig = sign_capture(device, alice, image_hash, capture_time)
    terms = LicenseTerms(EditionPolicy.FREE, commercial_use=True)
    gateway.register_new_image(alice, image_hash, capture_time, terms, device.public_key, sig)

    # negative: duplicate registration
    _expect_revert(
        "Image already registered",
        gateway.register_new_image,
        alice, image_hash, capture_time, terms, device.public_key, sig,
    )
    # negative: unverified creator
    mallory = chain.account("mallory")
    _expect_revert(
        "Creator not verified",
        gateway.register_new_image,
        mallory, 0x9999, capture_time, terms, device.public_key, sig,
    )
    # negative: bad device signature (signed by a non-device account)
    bad_sig = mallory.sign(b"whatever")
    _expect_revert(
        "Invalid device signature",
        gateway.register_new_image,
        alice, 0x8888, capture_time, terms, device.public_key, bad_sig,
    )

    # edition: grayscale (proof accepted by the wired verifier)
    edited_hash = 0x5678
    gateway.register_edited_image(
        alice, edited_hash, image_hash, Transformation.GRAYSCALE, [], [0] * 4
    )
    assert gateway.images[edited_hash].root_hash == image_hash

    # negative: parent missing
    _expect_revert(
        "Parent image does not exist",
        gateway.register_edited_image,
        alice, 0x7777, 0xDEAD, Transformation.GRAYSCALE, [], [0] * 4,
    )
    # negative: invalid proof (rejecting verifier)
    gateway.verifiers[Transformation.BLUR] = RejectVerifier()
    _expect_revert(
        "Invalid transformation proof",
        gateway.register_edited_image,
        alice, 0x6666, image_hash, Transformation.BLUR, [1, 2], [0] * 4,
    )
    # negative: sealed policy
    bob = register_creator(chain, creg, admin, "bob")
    sealed_hash = 0x4321
    sig2 = sign_capture(device, bob, sealed_hash, capture_time)
    gateway.register_new_image(
        bob, sealed_hash, capture_time, LicenseTerms(EditionPolicy.SEALED), device.public_key, sig2
    )
    _expect_revert(
        "Sealed edition policy",
        gateway.register_edited_image,
        alice, 0x3333, sealed_hash, Transformation.GRAYSCALE, [], [0] * 4,
    )
    # policy upgrade by owner, then edition succeeds
    gateway.open_edition_policy(bob, sealed_hash, EditionPolicy.FREE)
    gateway.register_edited_image(
        alice, 0x3333, sealed_hash, Transformation.GRAYSCALE, [], [0] * 4
    )
    return chain, gateway


def marketplace(chain: Chain | None = None):
    """Bid / accept / license flow (port of marketplace/scenarios/marketplace.py)."""
    chain, gateway = register_images(chain)
    market = chain.deploy(Marketplace(gateway))
    alice = chain.account("alice")
    buyer = chain.account("buyer")

    market.place_bid(buyer, 0x1234, amount=500, duration=86400)
    _expect_revert("Not the owner", market.accept_bid, buyer, 0x1234, 0)
    before = alice.balance
    market.accept_bid(alice, 0x1234, 0)
    assert alice.balance == before + 500
    assert market.has_valid_license(0x1234, buyer.address)

    # ownership transfer through an approved operator
    operator = chain.account("operator")
    gateway.approve_operator(alice, 0x1234, operator.address)
    gateway.transfer_ownership(operator, 0x1234, buyer.address)
    assert gateway.owners[0x1234] == buyer.address
    return chain, gateway, market


def photography_contest(chain: Chain | None = None):
    """Provenance-gated contest (port of scenarios/photography_contest.py)."""
    chain, gateway = register_images(chain)
    organizer = chain.account("organizer")
    contest = chain.deploy(
        PhotographyContest(
            gateway, organizer, prize=1000,
            permissible=[Transformation.GRAYSCALE, Transformation.RESIZE],
        )
    )
    alice = chain.account("alice")
    # edition with only permissible transformations: accepted
    contest.submit(alice, 0x5678)
    # register a blur edition and verify it is rejected by provenance gating
    gateway.verifiers[Transformation.BLUR] = AcceptAllVerifier()
    gateway.register_edited_image(
        alice, 0xB1, 0x1234, Transformation.BLUR, [1, 2], [0] * 4
    )
    _expect_revert(
        "Impermissible transformation in edit chain",
        contest.submit, alice, 0xB1,
    )
    before = alice.balance
    contest.announce_winner(organizer, 0x5678)
    assert alice.balance == before + 1000
    return chain


def attribution_claim(chain: Chain | None = None):
    chain, gateway = register_images(chain)
    alice = chain.account("alice")
    arbiter = chain.account("arbiter")
    claims = chain.deploy(AttributionClaim(gateway, arbiter))
    cid = claims.open_claim(alice, 0x1234, chain.account("infringer").address, deposit=100)
    _expect_revert("Not arbiter", claims.resolve, alice, cid, True)
    before = alice.balance
    claims.resolve(arbiter, cid, upheld=True)
    assert alice.balance == before + 200
    return chain


def main():
    register_images()
    print("scenario register_images: OK")
    marketplace()
    print("scenario marketplace: OK")
    photography_contest()
    print("scenario photography_contest: OK")
    attribution_claim()
    print("scenario attribution_claim: OK")


if __name__ == "__main__":
    main()
