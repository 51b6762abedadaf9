"""Fused Pallas TPU kernels (the fast path behind the golden jnp oracles)."""

from .fused_matmul import fused_quant_matmul, quantize_block, quantize_weights_bf16

__all__ = ["fused_quant_matmul", "quantize_block", "quantize_weights_bf16"]
