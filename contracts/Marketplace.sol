// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {ImageGateway} from "./ImageGateway.sol";
import {LicenseToken} from "./LicenseToken.sol";

/// @notice Escrowed-bid licensing market over gateway-registered images.
/// Buyers escrow ETH bids against a root image; the image owner accepts a
/// bid, receiving the escrow and minting the bidder an EIP-4907 license
/// token valid for the bid duration.
///
/// Original vimz-tpu implementation, Solidity mirror of the simulator
/// Marketplace (vimz_tpu/marketplace/contracts.py:276-325); the revert
/// strings asserted by vimz_tpu/marketplace/scenarios.py are pinned.
/// Reference analog: marketplace/contracts/Marketplace.sol (listing/
/// per-block pricing model — this framework uses the simpler escrowed-bid
/// model its simulator and scenario suite exercise).
contract Marketplace {
    struct Bid {
        address bidder;
        uint256 amount;
        uint64 duration; // license validity in seconds once accepted
        bool active;
    }

    ImageGateway public immutable gateway;
    LicenseToken public immutable licenseToken;

    /// rootHash -> append-only bid list (indices are stable handles).
    mapping(uint256 => Bid[]) public bids;

    event BidPlaced(uint256 rootHash, address bidder, uint256 amount);
    event BidWithdrawn(uint256 rootHash, address bidder);
    event LicenseIssued(uint256 rootHash, address licensee, uint256 expires, uint256 tokenId);

    constructor(address gateway_, address licenseToken_) {
        gateway = ImageGateway(gateway_);
        licenseToken = LicenseToken(licenseToken_);
    }

    function placeBid(uint256 rootHash, uint64 duration) external payable {
        (address creator,,,,,) = gateway.images(rootHash);
        require(creator != address(0), "Image not registered");
        (, bool commercialUse,) = gateway.licenses(rootHash);
        require(commercialUse, "Non-commercial image");
        require(msg.value > 0, "Zero bid");
        bids[rootHash].push(Bid(msg.sender, msg.value, duration, true));
        emit BidPlaced(rootHash, msg.sender, msg.value);
    }

    function withdrawBid(uint256 rootHash, uint256 index) external {
        Bid storage bid = _activeBid(rootHash, index);
        require(bid.bidder == msg.sender, "Not the bidder");
        bid.active = false;
        _pay(msg.sender, bid.amount);
        emit BidWithdrawn(rootHash, msg.sender);
    }

    function acceptBid(uint256 rootHash, uint256 index) external {
        require(gateway.owners(rootHash) == msg.sender, "Not the owner");
        Bid storage bid = _activeBid(rootHash, index);
        bid.active = false;
        uint64 expires = uint64(block.timestamp) + bid.duration;
        uint256 tokenId = licenseToken.mintLicense(rootHash, msg.sender, bid.bidder, expires);
        _pay(msg.sender, bid.amount);
        emit LicenseIssued(rootHash, bid.bidder, expires, tokenId);
    }

    function hasValidLicense(uint256 rootHash, address licensee) external view returns (bool) {
        uint256 n = licenseToken.nextId();
        for (uint256 id = 1; id < n; ++id) {
            if (
                licenseToken.licensedImage(id) == rootHash
                    && licenseToken.userOf(id) == licensee
            ) return true;
        }
        return false;
    }

    function _activeBid(uint256 rootHash, uint256 index) internal view returns (Bid storage) {
        Bid[] storage list = bids[rootHash];
        require(index < list.length && list[index].active, "No active bid");
        return list[index];
    }

    function _pay(address to, uint256 amount) internal {
        (bool ok,) = payable(to).call{value: amount}("");
        require(ok, "Transfer failed");
    }
}
