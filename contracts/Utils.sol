// SPDX-License-Identifier: MIT
pragma solidity ^0.8.26;

/// @notice How editions may be created. Ordered so that a larger value is a
/// more permissive policy (monotone upgrade rule).
///
/// COMPATIBILITY PIN: the enum orderings and struct field layouts in this
/// file ARE the wire schema shared with the reference marketplace SDK
/// (reference: marketplace/contracts/Utils.sol) and with this framework's
/// simulator types (vimz_tpu/marketplace/contracts.py). They are kept
/// byte-identical on purpose; everything else in contracts/ is original
/// vimz-tpu code.
enum EditionPolicy {
    Sealed, // 0 - no-one may register editions
    OnlyOwner, // 1 - only the current root owner may register editions
    Free // 2 - anyone may register editions
}

/// @notice Global license terms applying to an entire transformation tree.
struct LicenseTerms {
    EditionPolicy editionPolicy;
    bool commercialUse;
    string attribution;
}

/// @notice The transformations that can be applied to an image.
enum Transformation {
    Blur,
    Brightness,
    Contrast,
    Crop,
    Grayscale,
    Redact,
    Resize,
    Sharpness,
    NoTransformation // used for original images
}

/// @notice Image metadata.
struct Image {
    address creator;
    uint256 captureTime;
    uint256 timestamp;
    uint256 parentHash;
    uint256 rootHash;
    Transformation transformation;
}
