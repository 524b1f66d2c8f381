from vimz_tpu.marketplace.chain import Chain, Revert
from vimz_tpu.marketplace.contracts import (
    AttributionClaim,
    CreatorRegistry,
    DeviceRegistry,
    ImageGateway,
    Marketplace,
    OnChainVerification,
    PhotographyContest,
)

__all__ = [
    "Chain",
    "Revert",
    "CreatorRegistry",
    "DeviceRegistry",
    "ImageGateway",
    "Marketplace",
    "OnChainVerification",
    "PhotographyContest",
    "AttributionClaim",
]
