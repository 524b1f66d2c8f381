// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {AccessControlled} from "./AccessControlled.sol";

/// @notice KYC roster for content creators. The gateway consults
/// `verifyCreator` before accepting any image registration; a creator is
/// valid while their KYC window is open.
///
/// Original vimz-tpu design (simulator source of truth:
/// vimz_tpu/marketplace/contracts.py CreatorRegistry). Pinned external
/// surface, for compatibility with the reference marketplace SDK
/// (marketplace/vimz_marketplace_sdk): the `registerCreator` /
/// `verifyCreator` selectors and the `CreatorRegistered` event.
contract CreatorRegistry is AccessControlled {
    /// KYC expiry per creator; 0 means never registered.
    mapping(address => uint256) private _kycValidUntil;
    /// Off-chain contact handle, set once at registration.
    mapping(address => string) private _contact;

    event CreatorRegistered(address creator, uint256 kycExpiry);

    function registerCreator(
        address creator,
        uint256 kycExpiry,
        string calldata contactInfo
    ) external adminOnly {
        require(_kycValidUntil[creator] == 0, "Creator already registered");
        require(kycExpiry > block.timestamp, "KYC expiry must be in the future");
        _kycValidUntil[creator] = kycExpiry;
        _contact[creator] = contactInfo;
        emit CreatorRegistered(creator, kycExpiry);
    }

    /// @notice Extend (or shorten) an existing creator's KYC window.
    function refreshKyc(address creator, uint256 newExpiry) external adminOnly {
        require(_kycValidUntil[creator] != 0, "Creator not registered");
        _kycValidUntil[creator] = newExpiry;
    }

    function verifyCreator(address creator) external view returns (bool) {
        uint256 until = _kycValidUntil[creator];
        return until != 0 && until > block.timestamp;
    }

    function contactOf(address creator) external view returns (string memory) {
        return _contact[creator];
    }
}
