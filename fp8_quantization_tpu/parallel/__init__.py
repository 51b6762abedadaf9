"""Mesh/sharding layer (green-field: the reference is single-device)."""

from .sharding import (
    initialize_multihost,
    make_mesh,
    param_spec,
    replicate,
    shard_batch,
    shard_variables,
)

__all__ = [
    "initialize_multihost",
    "make_mesh",
    "param_spec",
    "replicate",
    "shard_batch",
    "shard_variables",
]
