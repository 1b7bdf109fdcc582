from .channelnorm import channelnorm
from .correlation import correlation, correlation_reference, displacement_count
from .resize import resize2d, resize_nd
from .warp import base_grid, sample2d, sample3d, warp2d, warp3d

__all__ = [
    "channelnorm",
    "correlation",
    "correlation_reference",
    "displacement_count",
    "resize2d",
    "resize_nd",
    "base_grid",
    "sample2d",
    "sample3d",
    "warp2d",
    "warp3d",
]
