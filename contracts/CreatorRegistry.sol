// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

/// @notice Admin-KYC'd creator registry (simulator mirror:
/// vimz_tpu/marketplace/contracts.py CreatorRegistry; reference layout:
/// marketplace/contracts/CreatorRegistry.sol:7-60).
contract CreatorRegistry {
    struct Creator {
        uint256 kycExpiry;
        string contactInfo;
        bool exists;
    }

    address public immutable admin;
    mapping(address => Creator) public creators;

    event CreatorRegistered(address creator, uint256 kycExpiry);

    modifier onlyAdmin() {
        require(msg.sender == admin, "Not admin");
        _;
    }

    constructor() {
        admin = msg.sender;
    }

    function registerCreator(address creatorAddr, uint256 kycExpiry, string calldata contactInfo)
        external
        onlyAdmin
    {
        require(!creators[creatorAddr].exists, "Creator already registered");
        require(kycExpiry > block.timestamp, "KYC expiry must be in the future");
        creators[creatorAddr] = Creator({kycExpiry: kycExpiry, contactInfo: contactInfo, exists: true});
        emit CreatorRegistered(creatorAddr, kycExpiry);
    }

    function verifyCreator(address creatorAddr) external view returns (bool) {
        Creator memory creator = creators[creatorAddr];
        return creator.exists && block.timestamp < creator.kycExpiry;
    }
}
