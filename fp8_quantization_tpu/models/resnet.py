"""Quantized ResNet-18/50, TPU-native (NHWC, flax).

Re-design of the reference ``models/resnet_quantized.py`` (which wraps
torchvision resnets and re-sequences conv/bn/relu for BN folding,
resnet_quantized.py:14-47): here each re-sequenced window is a ``BNQuantConv``
directly. Residual blocks add, ReLU, then requantize through the block's
activation site (resnet_quantized.py:39-46); the adaptive avg-pool ties to
the last block's activation quantizer (resnet_quantized.py:84-89); the
max-pool stays unquantized FP32 (quantize_model leaves nn.MaxPool2d
untouched). quant_setup variants: resnet_quantized.py:94-124.

Weights load from torchvision-layout FP32 state dicts via
``porting.port_resnet``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import QuantConfig
from ..ops.layers import BNQuantConv, QuantDense
from ..quant.sites import FIXED, QuantPhase, QuantSite, decoded

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class QuantBasicBlock(nn.Module):
    """BasicBlock: 3x3 + 3x3 with residual (resnet_quantized.py:29-30)."""

    qc: QuantConfig
    features: int
    stride: int = 1
    downsample: bool = False
    quantize_residual: bool = True

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        residual = x
        if self.downsample:
            residual = BNQuantConv(
                qc=self.qc, features=self.features, kernel_size=(1, 1),
                strides=(self.stride, self.stride), padding=[(0, 0), (0, 0)],
                use_bias=False, name="downsample_0",
            )(x, qp)
        y = BNQuantConv(
            qc=self.qc, features=self.features, kernel_size=(3, 3),
            strides=(self.stride, self.stride), padding=[(1, 1), (1, 1)],
            use_bias=False, activation=nn.relu, name="conv1",
        )(x, qp)
        y = BNQuantConv(
            qc=self.qc, features=self.features, kernel_size=(3, 3),
            strides=(1, 1), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv2",
        )(y, qp)
        # fused boundary (qp.chained): conv outputs may arrive as pending
        # Affines — the residual add needs materialized floats
        y = nn.relu(decoded(y) + decoded(residual))
        if qp.quant_a and self.quantize_residual:
            y = QuantSite(self.qc.act_quantizer(), self.qc.act_range,
                          name="activation_quantizer")(y, qp)
        return y


class QuantBottleneck(nn.Module):
    """Bottleneck: 1x1 -> 3x3 -> 1x1 (x4) with residual
    (resnet_quantized.py:18-28)."""

    qc: QuantConfig
    width: int
    stride: int = 1
    downsample: bool = False
    quantize_residual: bool = True
    expansion: int = 4

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        out_ch = self.width * self.expansion
        residual = x
        if self.downsample:
            residual = BNQuantConv(
                qc=self.qc, features=out_ch, kernel_size=(1, 1),
                strides=(self.stride, self.stride), padding=[(0, 0), (0, 0)],
                use_bias=False, name="downsample_0",
            )(x, qp)
        y = BNQuantConv(
            qc=self.qc, features=self.width, kernel_size=(1, 1), strides=(1, 1),
            padding=[(0, 0), (0, 0)], use_bias=False, activation=nn.relu,
            name="conv1",
        )(x, qp)
        y = BNQuantConv(
            qc=self.qc, features=self.width, kernel_size=(3, 3),
            strides=(self.stride, self.stride), padding=[(1, 1), (1, 1)],
            use_bias=False, activation=nn.relu, name="conv2",
        )(y, qp)
        y = BNQuantConv(
            qc=self.qc, features=out_ch, kernel_size=(1, 1), strides=(1, 1),
            padding=[(0, 0), (0, 0)], use_bias=False, name="conv3",
        )(y, qp)
        y = nn.relu(decoded(y) + decoded(residual))
        if qp.quant_a and self.quantize_residual:
            y = QuantSite(self.qc.act_quantizer(), self.qc.act_range,
                          name="activation_quantizer")(y, qp)
        return y


class QuantizedResNet(nn.Module):
    """ResNet-{18,34,50,101,152} with FP8/INT quantized convs and classifier."""

    qc: QuantConfig
    depth: int = 18
    num_classes: int = 1000

    def _overrides(self):
        qs = self.qc.quant_setup
        first_w = last_w = None
        fp_logits = False
        quantize_residual = True
        if qs == "FP_logits":
            fp_logits = True
        elif qs == "fc4":
            first_w, last_w = 8, 4
        elif qs in ("LSQ", "LSQ_paper"):
            first_w, last_w = 8, 8
            fp_logits = qs == "LSQ"
            if qs == "LSQ_paper":
                quantize_residual = False
        elif qs not in (None, "all"):
            raise ValueError(f"Quantization setup '{qs}' not supported for Resnet")
        return first_w, last_w, fp_logits, quantize_residual

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        kind, reps = RESNET_SPECS[self.depth]
        expansion = 1 if kind == "basic" else 4
        first_w, last_w, fp_logits, quantize_residual = self._overrides()

        # stem: conv7x7/2 + bn + relu (fold window), then FP32 maxpool
        x = BNQuantConv(
            qc=self.qc, features=64, kernel_size=(7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], use_bias=False, activation=nn.relu,
            n_bits_w=first_w, name="conv1",
        )(x, qp)
        # pending Affine (fused boundary) materializes before the FP32
        # max-pool (per-channel scales may be negative: clamp/pool do not
        # commute with the affine)
        x = nn.max_pool(decoded(x), (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])

        in_ch = 64
        last_block = (4, reps[-1] - 1)
        for li, (width, n) in enumerate(zip((64, 128, 256, 512), reps)):
            for bi in range(n):
                stride = (1 if li == 0 else 2) if bi == 0 else 1
                out_ch = width * expansion
                needs_ds = stride != 1 or in_ch != out_ch
                is_last = (li + 1, bi) == last_block
                kwargs = dict(
                    qc=self.qc, stride=stride, downsample=needs_ds,
                    # the last block's act site is hoisted so the avg-pool can
                    # tie to it (resnet_quantized.py:84-89)
                    quantize_residual=quantize_residual and not is_last,
                    name=f"layer{li + 1}_{bi}",
                )
                if kind == "basic":
                    x = QuantBasicBlock(features=width, **kwargs)(x, qp)
                else:
                    x = QuantBottleneck(width=width, **kwargs)(x, qp)
                in_ch = out_ch

        # tied adaptive avg-pool: the hoisted site quantizes the last block's
        # output (with range updates), the pool output requantizes through the
        # same site without updates (QuantizedActivationWrapper semantics,
        # autoquant_utils.py:147-160). LSQ_paper keeps the pool FP32.
        pool_site = QuantSite(
            self.qc.act_quantizer(), self.qc.act_range,
            name=f"layer4_{reps[-1] - 1}_activation_quantizer",
        )
        if qp.quant_a and quantize_residual:
            x = pool_site(x, qp)
        x = jnp.mean(x, axis=(1, 2))
        if qp.quant_a and quantize_residual:
            x = pool_site(x, FIXED)
        x = QuantDense(
            qc=self.qc, features=self.num_classes, use_bias=True,
            n_bits_w=last_w, quantize_output=not fp_logits, name="fc",
        )(x, qp)
        return decoded(x)  # chained: logits come back as codes
