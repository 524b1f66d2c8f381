// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {ImageGateway} from "./ImageGateway.sol";
import {Transformation} from "./Utils.sol";

/// @notice Provenance-gated photo contest: the organizer escrows a prize at
/// deployment; submissions must be gateway-registered images submitted by
/// their creator whose entire edit chain uses only the contest's allowed
/// transformations (checked on-chain via the gateway's edit-chain walk —
/// this is the ZK-provenance showcase); the organizer announces one winner
/// who receives the escrowed prize.
///
/// Original vimz-tpu implementation, Solidity mirror of the simulator
/// (vimz_tpu/marketplace/contracts.py:328-362); reference analog:
/// marketplace/contracts/PhotographyContest.sol.
contract PhotographyContest {
    ImageGateway public immutable gateway;
    address public immutable organizer;
    uint256 public immutable prize;
    Transformation[] public permissible;

    mapping(uint256 => address) public submissions; // imageHash -> submitter
    uint256 public winner; // 0 until announced

    event SubmissionAccepted(uint256 imageHash, address creator);
    event WinnerAnnounced(uint256 imageHash);

    constructor(address gateway_, Transformation[] memory permissible_) payable {
        require(msg.value > 0, "No prize escrowed");
        gateway = ImageGateway(gateway_);
        organizer = msg.sender;
        prize = msg.value;
        permissible = permissible_;
    }

    function submit(uint256 imageHash) external {
        require(winner == 0, "Contest closed");
        (address creator,,,,,) = gateway.images(imageHash);
        require(creator != address(0), "Image not registered");
        require(creator == msg.sender, "Not the creator");
        require(
            gateway.validateEditChain(imageHash, permissible),
            "Impermissible transformation in edit chain"
        );
        submissions[imageHash] = msg.sender;
        emit SubmissionAccepted(imageHash, msg.sender);
    }

    function announceWinner(uint256 imageHash) external {
        require(msg.sender == organizer, "Not organizer");
        require(submissions[imageHash] != address(0), "Not a submission");
        require(winner == 0, "Contest closed");
        winner = imageHash;
        (bool ok,) = payable(submissions[imageHash]).call{value: prize}("");
        require(ok, "Prize transfer failed");
        emit WinnerAnnounced(imageHash);
    }
}
