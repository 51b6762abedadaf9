"""Mesh/sharding layer (green-field: the reference is single-device)."""

from .ring_attention import full_attention, ring_attention
from .shard_kernels import (
    kernel_mesh,
    partitioned_kernels,
    sharded_dequant_matmul,
    sharded_int4_matmul,
)
from .sharding import (
    initialize_multihost,
    make_mesh,
    param_spec,
    replicate,
    reshard,
    shard_batch,
    shard_variables,
)

__all__ = [
    "full_attention",
    "ring_attention",
    "kernel_mesh",
    "partitioned_kernels",
    "sharded_dequant_matmul",
    "sharded_int4_matmul",
    "initialize_multihost",
    "make_mesh",
    "param_spec",
    "replicate",
    "reshard",
    "shard_batch",
    "shard_variables",
]
