from .image import MI, MSE, PSNR, CORR, ssim
from .seg import dice_average, dice_coefficient, dist_hausdorff, seg_trans
from .viz import flow_mag, grid_generator

__all__ = [
    "MI",
    "MSE",
    "PSNR",
    "CORR",
    "ssim",
    "dice_average",
    "dice_coefficient",
    "dist_hausdorff",
    "seg_trans",
    "flow_mag",
    "grid_generator",
]
