// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

import {AccessControlled} from "./AccessControlled.sol";

/// @notice Registry of C2PA-style capture devices. Camera manufacturers are
/// approved by the admin as *registrars*; registrars enroll device signing
/// keys (as Ethereum addresses); the gateway then checks device signatures
/// over capture attestations via `verifyDeviceSignature`.
///
/// Original vimz-tpu design (simulator source of truth:
/// vimz_tpu/marketplace/contracts.py DeviceRegistry). Pinned external
/// surface, for compatibility with the reference marketplace SDK: the
/// `registerRegistrar` / `registerDevice` / `verifyDeviceSignature`
/// selectors and the two events.
contract DeviceRegistry is AccessControlled {
    /// device key -> the registrar that enrolled it (zero = unknown device).
    mapping(address => address) public enrolledBy;
    /// approved manufacturers.
    mapping(address => bool) public registrars;

    event RegistrarAdded(address registrar);
    event DeviceRegistered(address device, address registrar);

    function registerRegistrar(address registrar) external adminOnly {
        require(!registrars[registrar], "Already a registrar");
        registrars[registrar] = true;
        emit RegistrarAdded(registrar);
    }

    function registerDevice(address deviceKey) external {
        require(registrars[msg.sender], "Not a registrar");
        require(enrolledBy[deviceKey] == address(0), "Device already registered");
        enrolledBy[deviceKey] = msg.sender;
        emit DeviceRegistered(deviceKey, msg.sender);
    }

    /// @notice True iff `signature` is a valid 65-byte (r||s||v) ECDSA
    /// signature by the enrolled device key over `digest`.
    function verifyDeviceSignature(
        bytes32 digest,
        bytes memory signature,
        address deviceKey
    ) external view returns (bool) {
        require(enrolledBy[deviceKey] != address(0), "Device not found");
        if (signature.length != 65) return false;
        bytes32 r;
        bytes32 s;
        uint8 v;
        assembly {
            r := mload(add(signature, 0x20))
            s := mload(add(signature, 0x40))
            v := byte(0, mload(add(signature, 0x60)))
        }
        if (v < 27) v += 27;
        return ecrecover(digest, v, r, s) == deviceKey;
    }
}
