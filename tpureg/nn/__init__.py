from .layers import (
    ConvBlock,
    Deconv,
    IConvBlock,
    TorchConvTranspose,
    bias_uniform01,
    init_kaiming_leaky,
    init_xavier_uniform,
    predict_flow,
    torch_conv,
)

__all__ = [
    "ConvBlock",
    "Deconv",
    "IConvBlock",
    "TorchConvTranspose",
    "bias_uniform01",
    "init_kaiming_leaky",
    "init_xavier_uniform",
    "predict_flow",
    "torch_conv",
]
