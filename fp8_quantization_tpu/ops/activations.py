"""Fusable activation registry.

The reference whitelists the activations a hijacked layer may fuse
(`/root/reference/quantization/hijacker.py:15-29`, including the timm
Swish/HardSwish family). Here they are plain jnp callables keyed by name so
layer specs stay hashable/static.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def hardtanh(x):
    return jnp.clip(x, -1.0, 1.0)


def hard_sigmoid(x):
    # torch F.hardsigmoid: clip(x/6 + 1/2, 0, 1)
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hard_swish(x):
    return x * hard_sigmoid(x)


def swish(x):
    return x * jax.nn.sigmoid(x)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "relu6": relu6,
    "hardtanh": hardtanh,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    # torch nn.GELU default is the exact erf form
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "prelu": jax.nn.leaky_relu,
    "swish": swish,
    "hardswish": hard_swish,
    "hardsigmoid": hard_sigmoid,
}


def get_activation(name: Optional[str]) -> Optional[Callable]:
    if name is None:
        return None
    return ACTIVATIONS[name]


# pure-clamp activations: (lo, hi) bounds that fold EXACTLY into a pending
# Affine / a downstream uniform quantizer's integer clip (fused-boundary
# serving — see quant.sites.Affine). Keyed by function identity.
CLAMP_ACTIVATIONS = {
    jax.nn.relu: (0.0, None),
    relu6: (0.0, 6.0),
    hardtanh: (-1.0, 1.0),
}
