// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {Transformation} from "./Utils.sol";

/// @notice Verifier dispatch for vimz-tpu transformation proofs.
///
/// Differences from the reference (marketplace/contracts/
/// OnChainVerification.sol:18-68): the vimz-tpu decider proof (fold-tree
/// commitments + Spartan transcript) is variable-length, so verifiers take
/// `uint256[] calldata proof` instead of the NovaDecider's fixed
/// uint256[25]. The public-input mapping per transformation is identical.
library OnChainVerification {
    function verifyTransformationValidity(
        uint256 sourceHash,
        uint256 editionHash,
        Transformation transformation,
        uint256[] calldata transformationParameters,
        uint256[] calldata proof,
        address verifier
    ) public view returns (bool) {
        uint256 steps = 720; // HD resolution-preserving transformations.

        if (
            transformation == Transformation.Grayscale || transformation == Transformation.Redact
                || transformation == Transformation.Resize
        ) {
            require(transformationParameters.length == 0, "Unexpected transformation parameters.");
            uint256[] memory init = new uint256[](2);
            uint256[] memory fin = new uint256[](2);
            fin[0] = sourceHash;
            fin[1] = editionHash;
            return IVimzTpuVerifier(verifier).verifyOpaqueNovaProofWithInputs(steps, init, fin, proof);
        }

        if (transformation == Transformation.Brightness || transformation == Transformation.Contrast) {
            require(
                transformationParameters.length == 1,
                "Invalid transformation parameters - expected transformation factor."
            );
            uint256[] memory init = new uint256[](3);
            init[2] = transformationParameters[0];
            uint256[] memory fin = new uint256[](3);
            fin[0] = sourceHash;
            fin[1] = editionHash;
            fin[2] = transformationParameters[0];
            return IVimzTpuVerifier(verifier).verifyOpaqueNovaProofWithInputs(steps, init, fin, proof);
        }

        if (transformation == Transformation.Blur || transformation == Transformation.Sharpness) {
            require(
                transformationParameters.length == 2,
                "Invalid transformation parameters - expected final neighbourhood hashes."
            );
            uint256[] memory init = new uint256[](4);
            uint256[] memory fin = new uint256[](4);
            fin[0] = sourceHash;
            fin[1] = editionHash;
            fin[2] = transformationParameters[0];
            fin[3] = transformationParameters[1];
            return IVimzTpuVerifier(verifier).verifyOpaqueNovaProofWithInputs(steps, init, fin, proof);
        }

        revert("Unsupported transformation");
    }
}

/// @notice Interface implemented by the generated per-transformation
/// verifier contracts (tools/generate_verifier_contract.py).
interface IVimzTpuVerifier {
    function verifyOpaqueNovaProofWithInputs(
        uint256 steps,
        uint256[] calldata initialState,
        uint256[] calldata finalState,
        uint256[] calldata proof
    ) external view returns (bool);
}
