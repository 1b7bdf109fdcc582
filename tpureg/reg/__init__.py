from .head import OpticalFlowReg, stn_warp

__all__ = ["OpticalFlowReg", "stn_warp"]
