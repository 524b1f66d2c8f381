// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {MiniERC721} from "./MiniERC721.sol";

/// @notice Bundles of registered root images as a single tradable NFT
/// (e.g. a photographer's portfolio sold in one transaction). The minting
/// marketplace guarantees every bundled hash is a registered root owned by
/// the collection owner at mint time.
///
/// Original vimz-tpu implementation (reference analog:
/// marketplace/contracts/ImageCollection.sol).
contract ImageCollection is MiniERC721 {
    address public immutable admin;
    address public marketplace;
    mapping(uint256 => uint256[]) private _bundles;

    constructor() MiniERC721("vimz-tpu collection", "VIMZC") {
        admin = msg.sender;
    }

    function setMarketplace(address marketplace_) external {
        require(msg.sender == admin, "Not admin");
        require(marketplace == address(0), "Marketplace already set");
        marketplace = marketplace_;
    }

    function mintCollection(uint256 key, address owner, uint256[] calldata rootHashes) external {
        require(msg.sender == marketplace, "Not marketplace");
        require(rootHashes.length > 0, "Empty collection");
        _mint(owner, key);
        _bundles[key] = rootHashes;
    }

    function bundledImages(uint256 key) external view returns (uint256[] memory) {
        ownerOf(key); // existence check
        return _bundles[key];
    }
}
