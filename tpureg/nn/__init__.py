from .layers import (
    ConvBlock,
    Deconv,
    IConvBlock,
    PredictFlow,
    TorchConv,
    TorchConvTranspose,
    init_kaiming_leaky,
    init_xavier_uniform,
    bias_uniform01,
)

__all__ = [
    "ConvBlock",
    "Deconv",
    "IConvBlock",
    "PredictFlow",
    "TorchConv",
    "TorchConvTranspose",
    "init_kaiming_leaky",
    "init_xavier_uniform",
    "bias_uniform01",
]
