// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

/// @notice Self-contained minimal ERC-721 core used by the vimz-tpu market
/// suite (LicenseToken, ImageCollection). Original implementation — no
/// OpenZeppelin dependency (the reference suite imports OZ; this framework
/// keeps its on-chain artifacts dependency-free so they compile standalone).
abstract contract MiniERC721 {
    string public name;
    string public symbol;

    mapping(uint256 => address) internal _holder;
    mapping(address => uint256) internal _count;
    mapping(uint256 => address) internal _tokenApproval;
    mapping(address => mapping(address => bool)) internal _operatorApproval;

    event Transfer(address indexed from, address indexed to, uint256 indexed tokenId);
    event Approval(address indexed owner, address indexed approved, uint256 indexed tokenId);
    event ApprovalForAll(address indexed owner, address indexed operator, bool approved);

    constructor(string memory name_, string memory symbol_) {
        name = name_;
        symbol = symbol_;
    }

    function balanceOf(address owner) external view returns (uint256) {
        require(owner != address(0), "Zero address");
        return _count[owner];
    }

    function ownerOf(uint256 tokenId) public view returns (address) {
        address holder = _holder[tokenId];
        require(holder != address(0), "Nonexistent token");
        return holder;
    }

    function approve(address to, uint256 tokenId) external {
        address holder = ownerOf(tokenId);
        require(
            msg.sender == holder || _operatorApproval[holder][msg.sender],
            "Not authorized to approve"
        );
        _tokenApproval[tokenId] = to;
        emit Approval(holder, to, tokenId);
    }

    function getApproved(uint256 tokenId) external view returns (address) {
        ownerOf(tokenId); // existence check
        return _tokenApproval[tokenId];
    }

    function setApprovalForAll(address operator, bool approved) external {
        _operatorApproval[msg.sender][operator] = approved;
        emit ApprovalForAll(msg.sender, operator, approved);
    }

    function isApprovedForAll(address owner, address operator) external view returns (bool) {
        return _operatorApproval[owner][operator];
    }

    function transferFrom(address from, address to, uint256 tokenId) public virtual {
        address holder = ownerOf(tokenId);
        require(holder == from, "Wrong from");
        require(to != address(0), "Zero address");
        bool authorized = msg.sender == holder || msg.sender == _tokenApproval[tokenId]
            || _operatorApproval[holder][msg.sender];
        require(authorized, "Not authorized to transfer");
        delete _tokenApproval[tokenId];
        _count[from] -= 1;
        _count[to] += 1;
        _holder[tokenId] = to;
        emit Transfer(from, to, tokenId);
    }

    function _mint(address to, uint256 tokenId) internal {
        require(to != address(0), "Zero address");
        require(_holder[tokenId] == address(0), "Token exists");
        _count[to] += 1;
        _holder[tokenId] = to;
        emit Transfer(address(0), to, tokenId);
    }
}
