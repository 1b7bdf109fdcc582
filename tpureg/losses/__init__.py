from .ofe import (
    Affloss,
    OFEloss,
    charbonnier,
    correlation_loss,
    correlation_loss_3d,
    photometric_loss,
    photometric_loss_3d,
    smoothness_loss,
)

__all__ = [
    "Affloss",
    "OFEloss",
    "charbonnier",
    "correlation_loss",
    "correlation_loss_3d",
    "photometric_loss",
    "photometric_loss_3d",
    "smoothness_loss",
]
