"""Functional quantization layer: quantizers, range estimators, quant sites."""

from . import estimators, qat, quantizers
from .sites import ESTIMATE, FAST, FIXED, FP32, QuantPhase, QuantSite

__all__ = [
    "estimators",
    "qat",
    "quantizers",
    "QuantSite",
    "QuantPhase",
    "ESTIMATE",
    "FAST",
    "FIXED",
    "FP32",
]
