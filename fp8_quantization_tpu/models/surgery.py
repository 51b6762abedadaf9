"""Spec-based model surgery: build quantized models from layer specs.

The reference rewrites torch module trees at runtime (``quantize_sequential``
/ ``fold_bn`` pattern-matching conv->bn->act windows,
`/root/reference/quantization/autoquant_utils.py:266-345`). Runtime
monkey-patching has no idiomatic JAX analog, so surgery happens at
*construction*: a sequential model is a tuple of layer specs, and
``plan_sequential`` performs the same window folding — conv+BN(+act) becomes
one ``BNQuantConv``, conv/linear(+act) become Quant layers with the
activation fused, parameter-free pools wrap in (optionally tied) activation
quantizers, and unknown layers pass through unquantized (the deepcopy
fallback, autoquant_utils.py:373-387).

``QuantizedSequential`` consumes the plan as a flax module; the named model
families (mobilenet/resnet/vit/bert/llama) are hand-defined for clarity but
follow exactly these rules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn

from ..config import QuantConfig
from ..ops.activations import ACTIVATIONS
from ..ops.layers import (
    BNQuantConv,
    BNQuantDense,
    QuantConv,
    QuantConvTranspose,
    QuantDense,
    QuantLayerNorm,
)
from ..quant.sites import FIXED, QuantPhase, QuantSite

# --- layer specs (the "FP32 model definition") ---


@dataclasses.dataclass(frozen=True)
class Conv:
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Tuple[Tuple[int, int], Tuple[int, int]]] = "SAME"
    groups: int = 1
    use_bias: bool = True


@dataclasses.dataclass(frozen=True)
class ConvTranspose:
    features: int
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Tuple[int, ...] = (1, 1)
    padding: Union[str, Tuple[Tuple[int, int], ...]] = "SAME"
    use_bias: bool = True


@dataclasses.dataclass(frozen=True)
class Linear:
    features: int
    use_bias: bool = True


@dataclasses.dataclass(frozen=True)
class BatchNorm:
    epsilon: float = 1e-5


@dataclasses.dataclass(frozen=True)
class Act:
    name: str  # key into ops.activations.ACTIVATIONS (hijacker whitelist)


@dataclasses.dataclass(frozen=True)
class LayerNorm:
    epsilon: float = 1e-6


@dataclasses.dataclass(frozen=True)
class AvgPool:
    window: Tuple[int, int]
    strides: Optional[Tuple[int, int]] = None


@dataclasses.dataclass(frozen=True)
class MaxPool:
    window: Tuple[int, int]
    strides: Optional[Tuple[int, int]] = None


@dataclasses.dataclass(frozen=True)
class Flatten:
    pass


Spec = Any


def plan_sequential(specs: Sequence[Spec]):
    """Fold spec windows into quantized-layer build instructions.

    Mirrors ``quantize_sequential``'s scan (autoquant_utils.py:292-345):
    conv->bn(->act) and conv(->act) fold (``fold_bn``/``get_act`` windows,
    :199-289); linear(->act) likewise; pools become tied activation wrappers.
    Returns a list of (kind, spec, act_name) tuples.
    """
    plan = []
    i = 0
    n = len(specs)
    while i < n:
        s = specs[i]
        if isinstance(s, (Conv, ConvTranspose, Linear)):
            j = i + 1
            bn = None
            if j < n and isinstance(specs[j], BatchNorm):
                if isinstance(s, ConvTranspose):
                    raise TypeError("BatchNorm folding after ConvTranspose "
                                    "is not supported")
                bn = specs[j]
                j += 1
            act = None
            if j < n and isinstance(specs[j], Act):
                act = specs[j].name
                j += 1
            if bn is not None:
                kind = "bnconv" if isinstance(s, Conv) else "bnlinear"
            elif isinstance(s, Conv):
                kind = "conv"
            elif isinstance(s, ConvTranspose):
                kind = "convtranspose"
            else:
                kind = "linear"
            plan.append((kind, s, act, bn))
            i = j
        elif isinstance(s, LayerNorm):
            plan.append(("layernorm", s, None, None))
            i += 1
        elif isinstance(s, (AvgPool, MaxPool, Flatten, Act)):
            plan.append(("plain", s, None, None))
            i += 1
        else:
            raise TypeError(f"unsupported spec {s!r}")
    return plan


class QuantizedSequential(nn.Module):
    """Sequential quantized model built from specs (surgery product)."""

    qc: QuantConfig
    specs: Tuple[Spec, ...]
    tie_activation_quantizers: bool = True

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        plan = plan_sequential(self.specs)
        prev_quant_layer = None  # index of last quantized layer (tie source)

        for idx, (kind, s, act_name, bn) in enumerate(plan):
            act = ACTIVATIONS[act_name] if act_name else None
            nxt = plan[idx + 1] if idx + 1 < len(plan) else None
            # hoist the act site when an (Avg)pool follows and tying is on
            pool_next = (
                self.tie_activation_quantizers
                and nxt is not None and isinstance(nxt[1], AvgPool)
                and kind in ("conv", "bnconv", "convtranspose",
                             "linear", "bnlinear")
            )

            if kind in ("conv", "bnconv"):
                cls = BNQuantConv if kind == "bnconv" else QuantConv
                kwargs = dict(
                    qc=self.qc, features=s.features, kernel_size=s.kernel_size,
                    strides=s.strides, padding=s.padding,
                    feature_group_count=s.groups,
                    use_bias=(False if kind == "bnconv" else s.use_bias),
                    activation=act, quantize_output=not pool_next,
                    name=f"layers_{idx}",
                )
                if kind == "bnconv":
                    kwargs["bn_epsilon"] = bn.epsilon
                x = cls(**kwargs)(x, qp)
                prev_quant_layer = idx
            elif kind == "convtranspose":
                x = QuantConvTranspose(
                    qc=self.qc, features=s.features, kernel_size=s.kernel_size,
                    strides=s.strides, padding=s.padding, use_bias=s.use_bias,
                    activation=act, quantize_output=not pool_next,
                    name=f"layers_{idx}",
                )(x, qp)
                prev_quant_layer = idx
            elif kind in ("linear", "bnlinear"):
                lcls = BNQuantDense if kind == "bnlinear" else QuantDense
                lkw = dict(
                    qc=self.qc, features=s.features,
                    use_bias=(False if kind == "bnlinear" else s.use_bias),
                    activation=act, quantize_output=not pool_next,
                    name=f"layers_{idx}",
                )
                if kind == "bnlinear":
                    lkw["bn_epsilon"] = bn.epsilon
                x = lcls(**lkw)(x, qp)
                prev_quant_layer = idx
            elif kind == "layernorm":
                x = QuantLayerNorm(qc=self.qc, epsilon=s.epsilon,
                                   name=f"layers_{idx}")(x, qp)
                prev_quant_layer = idx
            else:  # plain ops
                if isinstance(s, AvgPool):
                    tie = (self.tie_activation_quantizers
                           and prev_quant_layer is not None
                           and not self.qc.quantize_input)
                    site = QuantSite(
                        self.qc.act_quantizer(), self.qc.act_range,
                        name=(f"layers_{prev_quant_layer}_activation_quantizer"
                              if tie else f"layers_{idx}_activation_quantizer"),
                    )
                    if qp.quant_a and tie:
                        x = site(x, qp)
                    strides = s.strides or s.window
                    x = nn.avg_pool(x, s.window, strides=strides)
                    if qp.quant_a:
                        # tied: no range update (autoquant_utils.py:147-158)
                        x = site(x, FIXED if tie else qp)
                elif isinstance(s, MaxPool):
                    strides = s.strides or s.window
                    x = nn.max_pool(x, s.window, strides=strides)
                elif isinstance(s, Flatten):
                    x = x.reshape(x.shape[0], -1)
                elif isinstance(s, Act):
                    x = ACTIVATIONS[s.name](x)
        return x
