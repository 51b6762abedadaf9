"""Mesh + sharding rules: data/tensor parallelism for quantized models.

The reference has no distributed execution at all (SURVEY.md §2.8 — single
process, one CUDA device). This module is the green-field TPU-native
parallel layer: a ``jax.sharding.Mesh`` with ``data`` and ``model`` axes,
NamedSharding placement rules for the variables pytree, and helpers to shard
batches. Under ``jit``, XLA GSPMD then inserts the collectives — including
the global min/max reductions that make multi-chip *calibration* agree on
quantization ranges across hosts (psum/pmin/pmax over ICI), and the psum of
metric accumulators for distributed eval.

Rules:
* weights / per-channel quant params shard their channel (last) axis over
  ``model`` when divisible;
* batches shard their leading axis over ``data``;
* scalars and small states replicate.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data * model > len(devices):
        raise ValueError(
            f"mesh ({data} data x {model} model) needs {data * model} devices "
            f"but only {len(devices)} are available"
        )
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def param_spec(path: tuple, value, model_size: int) -> P:
    """Partition rule for one variables-tree leaf.

    Channel-last tensors (conv HWIO kernels, dense (in, out) kernels,
    per-channel quant params of shape (C,)) shard the last axis over
    ``model`` when divisible; everything else replicates.
    """
    shape = getattr(value, "shape", ())
    if not shape or model_size <= 1:
        return P()
    last = shape[-1]
    if last % model_size == 0 and last >= model_size:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_variables(variables: dict, mesh: Mesh) -> dict:
    """Place a variables pytree onto the mesh per ``param_spec``."""
    model_size = mesh.shape["model"]

    def place(path, v):
        spec = param_spec(path, v, model_size)
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, variables)


def reshard(variables: dict, mesh: Mesh) -> dict:
    """Re-place a variables pytree onto a (possibly different) mesh.

    ``jax.device_put`` moves data across meshes, so this is the same
    placement rule as :func:`shard_variables` — the point is WHEN to call
    it: any pytree sharded for one mesh that feeds a jit running under
    another mesh must be resharded first. Fed directly, the SPMD partitioner
    "involuntarily fully rematerializes" every mismatched tensor *inside*
    the compiled program (replicate + repartition per op — silent and
    wildly inefficient; see MULTICHIP dryrun, which asserts none occur).
    """
    return shard_variables(variables, mesh)


def shard_batch(x, mesh: Mesh):
    """Shard the leading (batch) axis over the ``data`` axis."""

    def place(v):
        if getattr(v, "ndim", 0) >= 1 and v.shape[0] % mesh.shape["data"] == 0:
            spec = P(*(["data"] + [None] * (v.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree.map(place, x)


def replicate(x, mesh: Mesh):
    return jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), x
    )


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Multi-host launch (SURVEY.md §2.8): ``jax.distributed.initialize``
    wires the hosts of a pod slice together; afterwards ``jax.devices()``
    spans all hosts and the same jitted SPMD programs (with mesh shardings)
    run collectives over ICI/DCN. Returns the process index. No-op when
    single-process (the common dev case)."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:  # single-process / unsupported environment
            return 0
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()
