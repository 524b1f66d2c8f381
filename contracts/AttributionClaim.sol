// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {ImageGateway} from "./ImageGateway.sol";

/// @notice Attribution-infringement bounty board: a registered image's
/// owner escrows a deposit to open a claim against an alleged infringer;
/// a designated arbiter resolves it. An upheld claim pays the claimant
/// double the deposit (deposit back + bounty funded by the arbiter pool);
/// a rejected claim refunds only the deposit.
///
/// Original vimz-tpu implementation, Solidity mirror of the simulator
/// (vimz_tpu/marketplace/contracts.py:365-392); reference analog:
/// marketplace/contracts/AttributionClaim.sol.
contract AttributionClaim {
    struct Claim {
        address claimant;
        uint256 rootHash;
        address respondent;
        uint256 deposit;
        bool resolved;
    }

    ImageGateway public immutable gateway;
    address public immutable arbiter;
    Claim[] public claims;

    event ClaimOpened(uint256 claimId, uint256 rootHash, address respondent);
    event ClaimResolved(uint256 claimId, bool upheld);

    constructor(address gateway_, address arbiter_) payable {
        // msg.value seeds the bounty pool paid out on upheld claims.
        gateway = ImageGateway(gateway_);
        arbiter = arbiter_;
    }

    /// @notice Top up the bounty pool.
    receive() external payable {}

    function openClaim(uint256 rootHash, address respondent) external payable returns (uint256) {
        require(gateway.owners(rootHash) == msg.sender, "Not the owner");
        require(msg.value > 0, "No deposit");
        claims.push(Claim(msg.sender, rootHash, respondent, msg.value, false));
        uint256 id = claims.length - 1;
        emit ClaimOpened(id, rootHash, respondent);
        return id;
    }

    function resolve(uint256 claimId, bool upheld) external {
        require(msg.sender == arbiter, "Not arbiter");
        Claim storage claim = claims[claimId];
        require(!claim.resolved, "Already resolved");
        claim.resolved = true;
        uint256 payout = upheld ? claim.deposit * 2 : claim.deposit;
        require(address(this).balance >= payout, "Bounty pool exhausted");
        (bool ok,) = payable(claim.claimant).call{value: payout}("");
        require(ok, "Payout failed");
        emit ClaimResolved(claimId, upheld);
    }
}
