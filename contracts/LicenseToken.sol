// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {IERC4907} from "./IERC4907.sol";
import {MiniERC721} from "./MiniERC721.sol";

/// @notice Image usage licenses as rentable NFTs (EIP-4907): the token's
/// *owner* is the image owner receiving the fee; the *user* is the
/// licensee, valid until `expires`. Minting is restricted to the wired
/// Marketplace contract.
///
/// Original vimz-tpu implementation (simulator analog: the
/// `licenses_issued` ledger in vimz_tpu/marketplace/contracts.py
/// Marketplace; reference analog: marketplace/contracts/LicenseToken.sol).
contract LicenseToken is MiniERC721, IERC4907 {
    struct Grant {
        address user;
        uint64 expires;
        uint256 rootHash;
    }

    address public immutable admin;
    address public marketplace;
    uint256 public nextId = 1;
    mapping(uint256 => Grant) private _grants;

    constructor() MiniERC721("vimz-tpu license", "VIMZL") {
        admin = msg.sender;
    }

    function setMarketplace(address marketplace_) external {
        require(msg.sender == admin, "Not admin");
        require(marketplace == address(0), "Marketplace already set");
        marketplace = marketplace_;
    }

    /// @notice Mint a license NFT: `imageOwner` holds it, `licensee` is the
    /// ERC-4907 user until `expires`. Returns the token id.
    function mintLicense(
        uint256 rootHash,
        address imageOwner,
        address licensee,
        uint64 expires
    ) external returns (uint256 tokenId) {
        require(msg.sender == marketplace, "Not marketplace");
        tokenId = nextId++;
        _mint(imageOwner, tokenId);
        _grants[tokenId] = Grant(licensee, expires, rootHash);
        emit UpdateUser(tokenId, licensee, expires);
    }

    function setUser(uint256 tokenId, address user, uint64 expires) external override {
        require(ownerOf(tokenId) == msg.sender, "Not the owner");
        _grants[tokenId].user = user;
        _grants[tokenId].expires = expires;
        emit UpdateUser(tokenId, user, expires);
    }

    function userOf(uint256 tokenId) external view override returns (address) {
        Grant storage g = _grants[tokenId];
        return block.timestamp < g.expires ? g.user : address(0);
    }

    function userExpires(uint256 tokenId) external view override returns (uint256) {
        return _grants[tokenId].expires;
    }

    function licensedImage(uint256 tokenId) external view returns (uint256) {
        return _grants[tokenId].rootHash;
    }
}
