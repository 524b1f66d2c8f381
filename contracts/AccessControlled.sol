// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

/// @notice Minimal single-admin access control shared by the vimz-tpu
/// registry contracts. The deploying account becomes the permanent admin.
///
/// This is original vimz-tpu marketplace code; only the external revert
/// strings that the scenario suite asserts verbatim are pinned
/// (vimz_tpu/marketplace/scenarios.py).
abstract contract AccessControlled {
    address internal immutable _admin;

    constructor() {
        _admin = msg.sender;
    }

    function admin() external view returns (address) {
        return _admin;
    }

    modifier adminOnly() {
        require(msg.sender == _admin, "Not admin");
        _;
    }
}
