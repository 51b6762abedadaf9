"""Checkpointing: the whole variables pytree (weights + quant params +
estimator state + BN stats) as one orbax checkpoint.

~ reference save/load paths (`utils/supervised_driver.py:40-51` ignite
Checkpoint; ``QuantizedModel.load_state_dict``'s two-phase protocol,
base_quantized_model.py:35-63). The functional design makes this trivial:
quant state lives in ordinary collections, so saving/restoring the variables
dict captures calibrated ranges, elected mantissa bits, and BN stats with no
dummy-forward materialization tricks.
"""

from __future__ import annotations

import os


def save_checkpoint(path: str, variables: dict) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, variables, force=True)
    return path


def load_checkpoint(path: str, template: dict) -> dict:
    """Restore into the shapes/dtypes of ``template`` (an initialized
    variables dict)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
