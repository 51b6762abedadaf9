"""Functional quantization layer: quantizers, range estimators, quant sites."""

from . import estimators, quantizers
from .sites import ESTIMATE, FIXED, FP32, QuantPhase, QuantSite

__all__ = [
    "estimators",
    "quantizers",
    "QuantSite",
    "QuantPhase",
    "ESTIMATE",
    "FIXED",
    "FP32",
]
