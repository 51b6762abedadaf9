"""Quantized layer ops and fused TPU kernels."""

from .activations import ACTIVATIONS, get_activation
from .layers import (
    BNQuantConv,
    QuantConv,
    QuantDense,
    QuantizedActWrapper,
    QuantLayerNorm,
    approx_matmul_2d,
    conv_patches,
    default_fp_bias,
    qama_matmul_2d,
)

__all__ = [
    "ACTIVATIONS",
    "get_activation",
    "QuantDense",
    "QuantConv",
    "BNQuantConv",
    "QuantLayerNorm",
    "QuantizedActWrapper",
    "approx_matmul_2d",
    "qama_matmul_2d",
    "conv_patches",
    "default_fp_bias",
]
