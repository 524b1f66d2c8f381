"""Marketplace contract suite (simulator implementation).

Python mirrors of the reference Solidity contracts, preserving method
semantics, revert strings and events so the scenario suite (incl. negative
tests) is a faithful port:

- CreatorRegistry   (marketplace/contracts/CreatorRegistry.sol:7-60)
- DeviceRegistry    (marketplace/contracts/DeviceRegistry.sol:6-60)
- OnChainVerification dispatch (marketplace/contracts/OnChainVerification.sol:18-68)
- ImageGateway      (marketplace/contracts/ImageGateway.sol:10-348)
- Marketplace / PhotographyContest / AttributionClaim
  (marketplace/contracts/*.sol)

Proof verification is REAL here: NativeVerifier wraps the framework's fold
verifier over the transformation's circuit; tests may use fixture verifiers.
Solidity sources with the same layout live in contracts/ for on-chain use.
"""

from __future__ import annotations

import hashlib
import time as _time
from dataclasses import dataclass, field
from enum import IntEnum

from vimz_tpu.marketplace.chain import Account, Chain, Revert


class EditionPolicy(IntEnum):
    SEALED = 0
    ONLY_OWNER = 1
    FREE = 2


class Transformation(IntEnum):
    BLUR = 0
    BRIGHTNESS = 1
    CONTRAST = 2
    CROP = 3
    GRAYSCALE = 4
    REDACT = 5
    RESIZE = 6
    SHARPNESS = 7
    NO_TRANSFORMATION = 8


@dataclass
class LicenseTerms:
    edition_policy: EditionPolicy
    commercial_use: bool = False
    attribution: str = ""


@dataclass
class Image:
    creator: str
    capture_time: int
    timestamp: int
    parent_hash: int
    root_hash: int
    transformation: Transformation


class _Contract:
    _chain: Chain = None
    _address: str = ""

    def _require(self, cond, msg: str):
        if not cond:
            raise Revert(msg)

    def _now(self) -> int:
        return int(_time.time())


class CreatorRegistry(_Contract):
    def __init__(self, admin: Account):
        self.admin = admin.address
        self.creators: dict[str, dict] = {}

    def register_creator(self, sender: Account, creator: Account, kyc_expiry: int, contact_info: str = ""):
        self._require(sender.address == self.admin, "Not admin")
        self._require(creator.address not in self.creators, "Creator already registered")
        self._require(kyc_expiry > self._now(), "KYC expiry must be in the future")
        self.creators[creator.address] = dict(kyc_expiry=kyc_expiry, contact_info=contact_info)
        self._chain.emit(self, "CreatorRegistered", creator=creator.address, kycExpiry=kyc_expiry)

    def verify_creator(self, creator_addr: str) -> bool:
        c = self.creators.get(creator_addr)
        return c is not None and self._now() < c["kyc_expiry"]


class DeviceRegistry(_Contract):
    def __init__(self, admin: Account):
        self.admin = admin.address
        self.registrars: set[str] = set()
        self.devices: dict[bytes, str] = {}  # device public key -> registrar

    def register_registrar(self, sender: Account, registrar: Account):
        self._require(sender.address == self.admin, "Not admin")
        self._require(registrar.address not in self.registrars, "Already a registrar")
        self.registrars.add(registrar.address)
        self._chain.emit(self, "RegistrarAdded", registrar=registrar.address)

    def register_device(self, sender: Account, device_public_key: bytes):
        self._require(sender.address in self.registrars, "Not a registrar")
        self._require(device_public_key not in self.devices, "Device already registered")
        self.devices[device_public_key] = sender.address
        self._chain.emit(self, "DeviceRegistered", device=device_public_key.hex(), registrar=sender.address)

    def verify_device_signature(self, message_hash: bytes, signature: bytes, device_public_key: bytes) -> bool:
        self._require(device_public_key in self.devices, "Device not found")
        from vimz_tpu.marketplace.chain import verify_signature

        return verify_signature(device_public_key, message_hash, signature)


def device_message(creator_addr: str, image_hash: int, capture_time: int) -> bytes:
    """abi.encodePacked(creator, imageHash, captureTime) analog."""
    return hashlib.sha256(
        creator_addr.encode() + image_hash.to_bytes(32, "big") + capture_time.to_bytes(32, "big")
    ).digest()


class OnChainVerification:
    """Dispatch by transformation to the verifier for its IVC state length
    (OnChainVerification.sol:18-68). Steps fixed per resolution (HD: 720)."""

    STEPS = 720

    @classmethod
    def verify_transformation_validity(
        cls, source_hash: int, edition_hash: int, transformation: Transformation,
        parameters: list[int], proof_words: list[int], verifier,
    ) -> bool:
        T = Transformation
        steps = cls.STEPS
        if transformation in (T.GRAYSCALE, T.REDACT, T.RESIZE):
            if parameters:
                raise Revert("Unexpected transformation parameters.")
            return verifier.verify_opaque_nova_proof_with_inputs(
                steps, [0, 0], [source_hash, edition_hash], proof_words
            )
        if transformation in (T.BRIGHTNESS, T.CONTRAST):
            if len(parameters) != 1:
                raise Revert("Invalid transformation parameters - expected transformation factor.")
            return verifier.verify_opaque_nova_proof_with_inputs(
                steps,
                [0, 0, parameters[0]],
                [source_hash, edition_hash, parameters[0]],
                proof_words,
            )
        if transformation in (T.BLUR, T.SHARPNESS):
            if len(parameters) != 2:
                raise Revert("Invalid transformation parameters - expected final neighbourhood hashes.")
            return verifier.verify_opaque_nova_proof_with_inputs(
                steps,
                [0, 0, 0, 0],
                [source_hash, edition_hash, parameters[0], parameters[1]],
                proof_words,
            )
        raise Revert("Unsupported transformation")


class ImageGateway(_Contract):
    def __init__(self, creator_registry: CreatorRegistry, device_registry: DeviceRegistry, verifiers: dict):
        self.creator_registry = creator_registry
        self.device_registry = device_registry
        self.verifiers = dict(verifiers)  # Transformation -> verifier object
        self.images: dict[int, Image] = {}
        self.licenses: dict[int, LicenseTerms] = {}
        self.owners: dict[int, str | None] = {}
        self.approved_operators: dict[int, str] = {}

    # -- registration ---------------------------------------------------

    def register_new_image(
        self, sender: Account, image_hash: int, capture_time: int,
        license_terms: LicenseTerms, device_public_key: bytes,
        device_signature: bytes, is_public_good: bool = False,
    ):
        self._require(image_hash not in self.images, "Image already registered")
        self._require(self.creator_registry.verify_creator(sender.address), "Creator not verified")
        msg = device_message(sender.address, image_hash, capture_time)
        self._require(
            self.device_registry.verify_device_signature(msg, device_signature, device_public_key),
            "Invalid device signature",
        )
        self.images[image_hash] = Image(
            creator=sender.address, capture_time=capture_time, timestamp=self._now(),
            parent_hash=image_hash, root_hash=image_hash,
            transformation=Transformation.NO_TRANSFORMATION,
        )
        self.licenses[image_hash] = license_terms
        self.owners[image_hash] = None if is_public_good else sender.address
        self._chain.emit(
            self, "NewImageRegistered", imageHash=image_hash, creator=sender.address,
            captureTime=capture_time, isPublicGood=is_public_good,
        )

    def register_edited_image(
        self, sender: Account, edited_image_hash: int, parent_hash: int,
        transformation: Transformation, transformation_parameters: list[int],
        proof_words: list[int],
    ):
        self._require(edited_image_hash not in self.images, "Image already registered")
        self._require(self.creator_registry.verify_creator(sender.address), "Creator not verified")
        parent = self.images.get(parent_hash)
        self._require(parent is not None, "Parent image does not exist")
        terms = self.licenses[parent.root_hash]
        if terms.edition_policy == EditionPolicy.SEALED:
            raise Revert("Sealed edition policy")
        if terms.edition_policy == EditionPolicy.ONLY_OWNER:
            self._require(
                self.owners.get(parent.root_hash) == sender.address,
                "Only owner can register editions",
            )
        self._require(transformation != Transformation.NO_TRANSFORMATION, "Invalid transformation")
        valid = OnChainVerification.verify_transformation_validity(
            parent_hash, edited_image_hash, transformation,
            transformation_parameters, proof_words, self.verifiers[transformation],
        )
        self._require(valid, "Invalid transformation proof")
        self.images[edited_image_hash] = Image(
            creator=sender.address, capture_time=parent.capture_time, timestamp=self._now(),
            parent_hash=parent_hash, root_hash=parent.root_hash,
            transformation=transformation,
        )
        self._chain.emit(
            self, "EditedImageRegistered", imageHash=edited_image_hash,
            creator=sender.address, parentHash=parent_hash,
            rootHash=parent.root_hash, transformation=transformation,
        )

    # -- edition policy / ownership ---------------------------------------

    def open_edition_policy(self, sender: Account, root_hash: int, new_policy: EditionPolicy):
        terms = self.licenses.get(root_hash)
        self._require(
            terms is not None and int(new_policy) > int(terms.edition_policy),
            "Invalid edition policy upgrade",
        )
        self._require(self.owners.get(root_hash) == sender.address, "Only owner can open edition policy")
        terms.edition_policy = new_policy
        self._chain.emit(self, "EditionPolicyOpened", rootHash=root_hash, newPolicy=new_policy)

    def validate_edit_chain(self, image_hash: int, permissible: list[Transformation]) -> bool:
        image = self.images.get(image_hash)
        if image is None:
            return False
        current = image_hash
        while image.parent_hash != current:
            if image.transformation not in permissible:
                return False
            current = image.parent_hash
            image = self.images[current]
        return True

    def transfer_ownership(self, sender: Account, root_hash: int, new_owner: str):
        owner = self.owners.get(root_hash)
        self._require(owner is not None, "Image is a public good")
        self._require(
            sender.address == owner or self.approved_operators.get(root_hash) == sender.address,
            "Not authorized to transfer",
        )
        self.owners[root_hash] = new_owner
        self.approved_operators.pop(root_hash, None)
        self._chain.emit(self, "OwnershipTransferred", rootHash=root_hash, oldOwner=owner, newOwner=new_owner)

    def approve_operator(self, sender: Account, root_hash: int, operator: str):
        self._require(self.owners.get(root_hash) == sender.address, "Not the owner")
        self.approved_operators[root_hash] = operator
        self._chain.emit(self, "OperatorApproved", rootHash=root_hash, operator=operator)


class Marketplace(_Contract):
    """Bid/accept licensing market over registered images
    (marketplace/contracts/Marketplace.sol:62+): buyers escrow bids on a root
    image; the owner accepts, transferring funds and minting a license."""

    def __init__(self, gateway: ImageGateway):
        self.gateway = gateway
        self.bids: dict[int, list] = {}
        self.licenses_issued: list[dict] = []

    def place_bid(self, sender: Account, root_hash: int, amount: int, duration: int):
        self._require(root_hash in self.gateway.images, "Image not registered")
        self._require(self.gateway.licenses[root_hash].commercial_use, "Non-commercial image")
        self._require(sender.balance >= amount, "insufficient balance")
        sender.balance -= amount  # escrow
        self.bids.setdefault(root_hash, []).append(
            dict(bidder=sender, amount=amount, duration=duration, active=True)
        )
        self._chain.emit(self, "BidPlaced", rootHash=root_hash, bidder=sender.address, amount=amount)

    def withdraw_bid(self, sender: Account, root_hash: int, index: int):
        bid = self.bids.get(root_hash, [None] * (index + 1))[index]
        self._require(bid is not None and bid["active"], "No active bid")
        self._require(bid["bidder"].address == sender.address, "Not the bidder")
        bid["active"] = False
        bid["bidder"].balance += bid["amount"]
        self._chain.emit(self, "BidWithdrawn", rootHash=root_hash, bidder=sender.address)

    def accept_bid(self, sender: Account, root_hash: int, index: int):
        owner = self.gateway.owners.get(root_hash)
        self._require(owner == sender.address, "Not the owner")
        bid = self.bids.get(root_hash, [None] * (index + 1))[index]
        self._require(bid is not None and bid["active"], "No active bid")
        bid["active"] = False
        sender.balance += bid["amount"]
        lic = dict(
            root_hash=root_hash, licensee=bid["bidder"].address,
            expires=self._now() + bid["duration"],
        )
        self.licenses_issued.append(lic)
        self._chain.emit(
            self, "LicenseIssued", rootHash=root_hash,
            licensee=bid["bidder"].address, expires=lic["expires"],
        )

    def has_valid_license(self, root_hash: int, licensee: str) -> bool:
        return any(
            l["root_hash"] == root_hash and l["licensee"] == licensee and l["expires"] > self._now()
            for l in self.licenses_issued
        )


class PhotographyContest(_Contract):
    """Provenance-gated contest (marketplace/contracts/PhotographyContest.sol:
    31+): submissions must be registered images whose edit chain contains
    only the allowed transformations; organizer picks a winner and pays."""

    def __init__(self, gateway: ImageGateway, organizer: Account, prize: int,
                 permissible: list[Transformation]):
        self._require(organizer.balance >= prize, "insufficient balance")
        organizer.balance -= prize  # escrow the prize
        self.gateway = gateway
        self.organizer = organizer
        self.prize = prize
        self.permissible = list(permissible)
        self.submissions: dict[int, Account] = {}
        self.winner: int | None = None

    def submit(self, sender: Account, image_hash: int):
        self._require(self.winner is None, "Contest closed")
        image = self.gateway.images.get(image_hash)
        self._require(image is not None, "Image not registered")
        self._require(image.creator == sender.address, "Not the creator")
        self._require(
            self.gateway.validate_edit_chain(image_hash, self.permissible),
            "Impermissible transformation in edit chain",
        )
        self.submissions[image_hash] = sender
        self._chain.emit(self, "SubmissionAccepted", imageHash=image_hash, creator=sender.address)

    def announce_winner(self, sender: Account, image_hash: int):
        self._require(sender.address == self.organizer.address, "Not organizer")
        self._require(image_hash in self.submissions, "Not a submission")
        self._require(self.winner is None, "Contest closed")
        self.winner = image_hash
        self.submissions[image_hash].balance += self.prize
        self._chain.emit(self, "WinnerAnnounced", imageHash=image_hash)


class AttributionClaim(_Contract):
    """Infringement bounty (marketplace/contracts/AttributionClaim.sol:8+):
    an owner posts a claim against an alleged infringer; resolution pays the
    bounty to the claimant or refunds the respondent's deposit."""

    def __init__(self, gateway: ImageGateway, arbiter: Account):
        self.gateway = gateway
        self.arbiter = arbiter.address
        self.claims: list[dict] = []

    def open_claim(self, sender: Account, root_hash: int, respondent: str, deposit: int):
        self._require(self.gateway.owners.get(root_hash) == sender.address, "Not the owner")
        self._require(sender.balance >= deposit, "insufficient balance")
        sender.balance -= deposit
        self.claims.append(dict(
            claimant=sender, root_hash=root_hash, respondent=respondent,
            deposit=deposit, resolved=False,
        ))
        self._chain.emit(self, "ClaimOpened", rootHash=root_hash, respondent=respondent)
        return len(self.claims) - 1

    def resolve(self, sender: Account, claim_id: int, upheld: bool):
        self._require(sender.address == self.arbiter, "Not arbiter")
        claim = self.claims[claim_id]
        self._require(not claim["resolved"], "Already resolved")
        claim["resolved"] = True
        claim["claimant"].balance += claim["deposit"] * (2 if upheld else 1)
        self._chain.emit(self, "ClaimResolved", claimId=claim_id, upheld=upheld)
