"""Quantized layer ops and fused TPU kernels."""

from .activations import ACTIVATIONS, get_activation
from .layers import (
    BNQuantConv,
    BNQuantDense,
    QuantConv,
    QuantConv1d,
    QuantConvTranspose,
    QuantConvTranspose1d,
    QuantDense,
    QuantizedActWrapper,
    QuantLayerNorm,
    approx_matmul_2d,
    conv_patches,
    conv_transpose_padding,
    default_fp_bias,
    qama_matmul_2d,
)

__all__ = [
    "ACTIVATIONS",
    "get_activation",
    "QuantDense",
    "QuantConv",
    "QuantConv1d",
    "QuantConvTranspose",
    "QuantConvTranspose1d",
    "BNQuantConv",
    "BNQuantDense",
    "QuantLayerNorm",
    "QuantizedActWrapper",
    "approx_matmul_2d",
    "qama_matmul_2d",
    "conv_patches",
    "conv_transpose_padding",
    "default_fp_bias",
]
