"""Eval drivers, metrics, and data pipelines."""

from .data import imagenet_val_batches, strided_batches, synthetic_batches
from .driver import (
    cache_quantized_weights,
    calibrate,
    evaluate,
    reestimate_bn,
    validate_quantized,
    write_result_file,
)
from .metrics import MetricState, finalize_metrics, update_metrics

__all__ = [
    "imagenet_val_batches",
    "strided_batches",
    "synthetic_batches",
    "cache_quantized_weights",
    "calibrate",
    "evaluate",
    "reestimate_bn",
    "validate_quantized",
    "write_result_file",
    "MetricState",
    "finalize_metrics",
    "update_metrics",
]
