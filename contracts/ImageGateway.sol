// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {CreatorRegistry} from "./CreatorRegistry.sol";
import {DeviceRegistry} from "./DeviceRegistry.sol";
import {OnChainVerification} from "./OnChainVerification.sol";
import {Transformation, Image, LicenseTerms, EditionPolicy} from "./Utils.sol";

/// @notice Entry point for registering images (simulator mirror:
/// vimz_tpu/marketplace/contracts.py ImageGateway; reference layout:
/// marketplace/contracts/ImageGateway.sol:10-348). Proofs are vimz-tpu
/// decider proofs (variable-length uint256[]).
contract ImageGateway {
    CreatorRegistry public immutable creatorRegistry;
    DeviceRegistry public immutable deviceRegistry;

    mapping(Transformation => address) public verifiers;
    mapping(uint256 => Image) public images;
    mapping(uint256 => LicenseTerms) public licenses;
    mapping(uint256 => address) public owners;
    mapping(uint256 => address) public approvedOperators;

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
    event EditionPolicyOpened(uint256 rootHash, EditionPolicy newPolicy);
    event OwnershipTransferred(uint256 rootHash, address oldOwner, address newOwner);
    event OperatorApproved(uint256 rootHash, address operator);

    constructor(address _creatorRegistry, address _deviceRegistry, address[8] memory _verifiers) {
        creatorRegistry = CreatorRegistry(_creatorRegistry);
        deviceRegistry = DeviceRegistry(_deviceRegistry);
        verifiers[Transformation.Blur] = _verifiers[0];
        verifiers[Transformation.Brightness] = _verifiers[1];
        verifiers[Transformation.Contrast] = _verifiers[2];
        verifiers[Transformation.Crop] = _verifiers[3];
        verifiers[Transformation.Grayscale] = _verifiers[4];
        verifiers[Transformation.Redact] = _verifiers[5];
        verifiers[Transformation.Resize] = _verifiers[6];
        verifiers[Transformation.Sharpness] = _verifiers[7];
    }

    function registerNewImage(
        uint256 imageHash,
        uint256 captureTime,
        LicenseTerms calldata licenseTerms,
        address deviceId,
        bytes calldata deviceSignature,
        bool isPublicGood
    ) external {
        require(images[imageHash].creator == address(0), "Image already registered");
        address creator = msg.sender;
        require(creatorRegistry.verifyCreator(creator), "Creator not verified");
        bytes32 messageHash = keccak256(abi.encodePacked(creator, imageHash, captureTime));
        require(
            deviceRegistry.verifyDeviceSignature(messageHash, deviceSignature, deviceId),
            "Invalid device signature"
        );
        images[imageHash] = Image({
            creator: creator,
            captureTime: captureTime,
            timestamp: block.timestamp,
            parentHash: imageHash,
            rootHash: imageHash,
            transformation: Transformation.NoTransformation
        });
        licenses[imageHash] = licenseTerms;
        owners[imageHash] = isPublicGood ? address(0) : creator;
        emit NewImageRegistered(
            imageHash, creator, captureTime, deviceId, licenseTerms, block.timestamp, isPublicGood
        );
    }

    function registerEditedImage(
        uint256 editedImageHash,
        uint256 parentHash,
        Transformation transformation,
        uint256[] calldata transformationParameters,
        uint256[] calldata proof
    ) external {
        require(images[editedImageHash].creator == address(0), "Image already registered");
        address creator = msg.sender;
        require(creatorRegistry.verifyCreator(creator), "Creator not verified");
        Image storage parent = images[parentHash];
        require(parent.creator != address(0), "Parent image does not exist");
        LicenseTerms storage terms = licenses[parent.rootHash];
        if (terms.editionPolicy == EditionPolicy.Sealed) revert("Sealed edition policy");
        if (terms.editionPolicy == EditionPolicy.OnlyOwner) {
            require(owners[parent.rootHash] == creator, "Only owner can register editions");
        }
        require(transformation != Transformation.NoTransformation, "Invalid transformation");
        bool validProof = OnChainVerification.verifyTransformationValidity(
            parentHash, editedImageHash, transformation, transformationParameters, proof,
            verifiers[transformation]
        );
        require(validProof, "Invalid transformation proof");
        images[editedImageHash] = Image({
            creator: creator,
            captureTime: parent.captureTime,
            timestamp: block.timestamp,
            parentHash: parentHash,
            rootHash: parent.rootHash,
            transformation: transformation
        });
        emit EditedImageRegistered(
            editedImageHash, creator, parentHash, parent.rootHash, transformation, block.timestamp
        );
    }

    function openEditionPolicy(uint256 rootHash, EditionPolicy newPolicy) external {
        LicenseTerms storage terms = licenses[rootHash];
        require(uint8(newPolicy) > uint8(terms.editionPolicy), "Invalid edition policy upgrade");
        require(owners[rootHash] == msg.sender, "Only owner can open edition policy");
        terms.editionPolicy = newPolicy;
        emit EditionPolicyOpened(rootHash, newPolicy);
    }

    function validateEditChain(uint256 imageHash, Transformation[] calldata permissibleTransformations)
        external
        view
        returns (bool)
    {
        Image storage image = images[imageHash];
        uint256 currentHash = imageHash;
        while (image.parentHash != currentHash) {
            bool found = false;
            for (uint256 i = 0; i < permissibleTransformations.length; i++) {
                if (image.transformation == permissibleTransformations[i]) {
                    found = true;
                    break;
                }
            }
            if (!found) return false;
            currentHash = image.parentHash;
            image = images[currentHash];
        }
        return true;
    }

    function transferOwnership(uint256 rootHash, address newOwner) external {
        address owner = owners[rootHash];
        require(owner != address(0), "Image is a public good");
        require(
            msg.sender == owner || approvedOperators[rootHash] == msg.sender,
            "Not authorized to transfer"
        );
        owners[rootHash] = newOwner;
        delete approvedOperators[rootHash];
        emit OwnershipTransferred(rootHash, owner, newOwner);
    }

    function approveOperator(uint256 rootHash, address operator) external {
        require(owners[rootHash] == msg.sender, "Not the owner");
        approvedOperators[rootHash] = operator;
        emit OperatorApproved(rootHash, operator);
    }
}
