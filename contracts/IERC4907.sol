// SPDX-License-Identifier: CC0-1.0
pragma solidity ^0.8.26;

/// @notice EIP-4907 rental-NFT standard interface (verbatim standard
/// surface; see https://eips.ethereum.org/EIPS/eip-4907). Used by
/// LicenseToken to expose time-boxed image licenses as rentable NFTs.
interface IERC4907 {
    event UpdateUser(uint256 indexed tokenId, address indexed user, uint64 expires);

    function setUser(uint256 tokenId, address user, uint64 expires) external;

    function userOf(uint256 tokenId) external view returns (address);

    function userExpires(uint256 tokenId) external view returns (uint256);
}
