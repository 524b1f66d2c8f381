// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

/// @notice Manufacturer-registrar device registry with ECDSA capture
/// signatures (simulator mirror: vimz_tpu/marketplace/contracts.py
/// DeviceRegistry; reference layout: marketplace/contracts/
/// DeviceRegistry.sol:6-60).
contract DeviceRegistry {
    struct Device {
        address registrar;
    }

    address public immutable admin;
    mapping(address => bool) public registrars;
    mapping(address => Device) public devices;

    event RegistrarAdded(address registrar);
    event DeviceRegistered(address device, address registrar);

    modifier onlyAdmin() {
        require(msg.sender == admin, "Not admin");
        _;
    }

    modifier onlyRegistrar() {
        require(registrars[msg.sender], "Not a registrar");
        _;
    }

    constructor() {
        admin = msg.sender;
    }

    function registerRegistrar(address registrar) external onlyAdmin {
        require(!registrars[registrar], "Already a registrar");
        registrars[registrar] = true;
        emit RegistrarAdded(registrar);
    }

    function registerDevice(address devicePubKey) external onlyRegistrar {
        require(devices[devicePubKey].registrar == address(0), "Device already registered");
        devices[devicePubKey] = Device({registrar: msg.sender});
        emit DeviceRegistered(devicePubKey, msg.sender);
    }

    function verifyDeviceSignature(bytes32 messageHash, bytes memory signature, address deviceAddress)
        external
        view
        returns (bool)
    {
        require(devices[deviceAddress].registrar != address(0), "Device not found");
        return recoverSigner(messageHash, signature) == deviceAddress;
    }

    function recoverSigner(bytes32 messageHash, bytes memory signature) internal pure returns (address) {
        require(signature.length == 65, "Invalid signature length");
        bytes32 r;
        bytes32 s;
        uint8 v;
        assembly {
            r := mload(add(signature, 32))
            s := mload(add(signature, 64))
            v := byte(0, mload(add(signature, 96)))
        }
        return ecrecover(messageHash, v, r, s);
    }
}
