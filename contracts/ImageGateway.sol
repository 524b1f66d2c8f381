// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {CreatorRegistry} from "./CreatorRegistry.sol";
import {DeviceRegistry} from "./DeviceRegistry.sol";
import {OnChainVerification} from "./OnChainVerification.sol";
import {Transformation, Image, LicenseTerms, EditionPolicy} from "./Utils.sol";

/// @notice Provenance record store: every image hash maps to a record
/// linking it to its parent and the root original. Separated from the
/// gateway so the edit-chain logic is independently auditable.
///
/// Original vimz-tpu design (simulator source of truth:
/// vimz_tpu/marketplace/contracts.py ImageGateway). The external ABI
/// (function selectors, events, and the revert strings asserted by
/// vimz_tpu/marketplace/scenarios.py) is pinned for SDK compatibility.
abstract contract ProvenanceLedger {
    mapping(uint256 => Image) public images;

    event NewImageRegistered(
        uint256 imageHash,
        address creator,
        uint256 captureTime,
        address device,
        LicenseTerms licenseTerms,
        uint256 timestamp,
        bool isPublicGood
    );
    event EditedImageRegistered(
        uint256 imageHash,
        address creator,
        uint256 parentHash,
        uint256 rootHash,
        Transformation transformation,
        uint256 timestamp
    );

    function _recordOriginal(uint256 imageHash, address creator, uint256 captureTime) internal {
        // An original is its own parent and root; the self-loop terminates
        // edit-chain walks.
        images[imageHash] = Image(
            creator, captureTime, block.timestamp, imageHash, imageHash, Transformation.NoTransformation
        );
    }

    function _recordEdition(
        uint256 imageHash,
        address creator,
        uint256 parentHash,
        Transformation transformation
    ) internal returns (uint256 rootHash) {
        Image storage parent = images[parentHash];
        rootHash = parent.rootHash;
        images[imageHash] =
            Image(creator, parent.captureTime, block.timestamp, parentHash, rootHash, transformation);
    }

    function _exists(uint256 imageHash) internal view returns (bool) {
        return images[imageHash].creator != address(0);
    }

    /// @notice Walk an image's edit chain up to its root original, checking
    /// that every hop used one of the caller-approved transformations.
    function validateEditChain(uint256 imageHash, Transformation[] calldata permitted)
        external
        view
        returns (bool)
    {
        uint256 cursor = imageHash;
        Image storage node = images[cursor];
        while (node.parentHash != cursor) {
            bool allowed = false;
            for (uint256 i = 0; i < permitted.length; ++i) {
                if (node.transformation == permitted[i]) {
                    allowed = true;
                    break;
                }
            }
            if (!allowed) return false;
            cursor = node.parentHash;
            node = images[cursor];
        }
        return true; // reached the self-parented original
    }
}

/// @notice Ownership + edition-policy state, keyed by the ROOT image hash:
/// rights always attach to the original; editions inherit them.
abstract contract EditionRights {
    mapping(uint256 => LicenseTerms) public licenses;
    mapping(uint256 => address) public owners;
    mapping(uint256 => address) public approvedOperators;

    event EditionPolicyOpened(uint256 rootHash, EditionPolicy newPolicy);
    event OwnershipTransferred(uint256 rootHash, address oldOwner, address newOwner);
    event OperatorApproved(uint256 rootHash, address operator);

    function _grantRights(
        uint256 rootHash,
        address creator,
        LicenseTerms calldata terms,
        bool isPublicGood
    ) internal {
        licenses[rootHash] = terms;
        // Public goods have no owner; anyone may edit (policy permitting)
        // and no-one may transfer.
        owners[rootHash] = isPublicGood ? address(0) : creator;
    }

    function _checkEditionAllowed(uint256 rootHash, address editor) internal view {
        EditionPolicy policy = licenses[rootHash].editionPolicy;
        if (policy == EditionPolicy.Sealed) revert("Sealed edition policy");
        if (policy == EditionPolicy.OnlyOwner) {
            require(owners[rootHash] == editor, "Only owner can register editions");
        }
    }

    /// @notice Policy changes are one-way toward more permissive values.
    function openEditionPolicy(uint256 rootHash, EditionPolicy newPolicy) external {
        LicenseTerms storage terms = licenses[rootHash];
        require(uint8(newPolicy) > uint8(terms.editionPolicy), "Invalid edition policy upgrade");
        require(owners[rootHash] == msg.sender, "Only owner can open edition policy");
        terms.editionPolicy = newPolicy;
        emit EditionPolicyOpened(rootHash, newPolicy);
    }

    function transferOwnership(uint256 rootHash, address newOwner) external {
        address current = owners[rootHash];
        require(current != address(0), "Image is a public good");
        bool authorized = msg.sender == current || approvedOperators[rootHash] == msg.sender;
        require(authorized, "Not authorized to transfer");
        owners[rootHash] = newOwner;
        delete approvedOperators[rootHash]; // approvals do not survive transfer
        emit OwnershipTransferred(rootHash, current, newOwner);
    }

    function approveOperator(uint256 rootHash, address operator) external {
        require(owners[rootHash] == msg.sender, "Not the owner");
        approvedOperators[rootHash] = operator;
        emit OperatorApproved(rootHash, operator);
    }
}

/// @notice Entry point for registering original images (device-signed,
/// KYC-gated) and their proven editions (vimz-tpu decider proofs,
/// variable-length uint256[] calldata). Composes the provenance ledger
/// with root-keyed edition rights.
contract ImageGateway is ProvenanceLedger, EditionRights {
    CreatorRegistry public immutable creatorRegistry;
    DeviceRegistry public immutable deviceRegistry;

    /// Per-transformation decider verifier contracts, fixed at deployment.
    mapping(Transformation => address) public verifiers;

    constructor(address creators_, address devices_, address[8] memory verifiers_) {
        creatorRegistry = CreatorRegistry(creators_);
        deviceRegistry = DeviceRegistry(devices_);
        // Order matches the Transformation enum (Utils.sol).
        for (uint256 i = 0; i < 8; ++i) {
            verifiers[Transformation(i)] = verifiers_[i];
        }
    }

    function registerNewImage(
        uint256 imageHash,
        uint256 captureTime,
        LicenseTerms calldata licenseTerms,
        address deviceId,
        bytes calldata deviceSignature,
        bool isPublicGood
    ) external {
        require(!_exists(imageHash), "Image already registered");
        require(creatorRegistry.verifyCreator(msg.sender), "Creator not verified");
        // The device attests (creator, image, captureTime) as a C2PA-style
        // capture claim.
        bytes32 claim = keccak256(abi.encodePacked(msg.sender, imageHash, captureTime));
        require(
            deviceRegistry.verifyDeviceSignature(claim, deviceSignature, deviceId),
            "Invalid device signature"
        );
        _recordOriginal(imageHash, msg.sender, captureTime);
        _grantRights(imageHash, msg.sender, licenseTerms, isPublicGood);
        emit NewImageRegistered(
            imageHash, msg.sender, captureTime, deviceId, licenseTerms, block.timestamp, isPublicGood
        );
    }

    function registerEditedImage(
        uint256 editedImageHash,
        uint256 parentHash,
        Transformation transformation,
        uint256[] calldata transformationParameters,
        uint256[] calldata proof
    ) external {
        require(!_exists(editedImageHash), "Image already registered");
        require(creatorRegistry.verifyCreator(msg.sender), "Creator not verified");
        require(_exists(parentHash), "Parent image does not exist");
        require(transformation != Transformation.NoTransformation, "Invalid transformation");
        _checkEditionAllowed(images[parentHash].rootHash, msg.sender);
        require(
            OnChainVerification.verifyTransformationValidity(
                parentHash,
                editedImageHash,
                transformation,
                transformationParameters,
                proof,
                verifiers[transformation]
            ),
            "Invalid transformation proof"
        );
        uint256 rootHash = _recordEdition(editedImageHash, msg.sender, parentHash, transformation);
        emit EditedImageRegistered(
            editedImageHash, msg.sender, parentHash, rootHash, transformation, block.timestamp
        );
    }
}
