"""Quantized MobileNetV2, TPU-native (NHWC, flax).

Re-design of the reference pair ``models/mobilenet_v2.py`` (FP32 definition,
:27-133) + ``models/mobilenet_v2_quantized.py`` (surgery product, :15-92). The
reference builds the FP32 torch model and rewrites its module tree
(``quantize_sequential`` + ``specials={InvertedResidual:
QuantizedInvertedResidual}``); here the *quantized* architecture is defined
directly — every conv+BN(+ReLU6) window is a ``BNQuantConv`` (the fold_bn
product), residual adds requantize through their own activation site
(mobilenet_v2_quantized.py:21-26), and the final avg-pool shares (ties) the
last conv's activation quantizer without updating its ranges
(autoquant_utils.py:147-160).

``quant_setup`` variants (mobilenet_v2_quantized.py:45-85) map to per-layer
n_bits / quantize-output overrides.

Weights load from a torch FP32 checkpoint via ``porting.port_mobilenet_v2``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..config import QuantConfig
from ..ops.activations import relu6
from ..ops.layers import BNQuantConv, QuantDense
from ..quant.sites import FIXED, QuantPhase, QuantSite, decoded

# (expansion t, channels c, repeats n, stride s) — mobilenet_v2.py:74-83
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class QuantInvertedResidual(nn.Module):
    """Inverted residual block (mobilenet_v2.py:27-65) with the residual-add
    requantized through its own activation site
    (mobilenet_v2_quantized.py:15-26)."""

    qc: QuantConfig
    in_ch: int
    out_ch: int
    stride: int
    expand_ratio: int
    n_bits_dw: Optional[int] = None  # fc4_dw8: depthwise convs at 8 bits
    quantize_residual: bool = True   # LSQ_paper sets residual acts to FP32

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        hidden = round(self.in_ch * self.expand_ratio)
        use_res = self.stride == 1 and self.in_ch == self.out_ch

        y = x
        idx = 0
        if self.expand_ratio != 1:
            # pw expand
            y = BNQuantConv(
                qc=self.qc, features=hidden, kernel_size=(1, 1), strides=(1, 1),
                padding=[(0, 0), (0, 0)], use_bias=False, activation=relu6,
                name=f"conv_{idx}",
            )(y, qp)
            idx += 1
        # dw
        y = BNQuantConv(
            qc=self.qc, features=hidden, kernel_size=(3, 3),
            strides=(self.stride, self.stride), padding=[(1, 1), (1, 1)],
            feature_group_count=hidden, use_bias=False, activation=relu6,
            n_bits_w=self.n_bits_dw, name=f"conv_{idx}",
        )(y, qp)
        idx += 1
        # pw-linear (no activation)
        y = BNQuantConv(
            qc=self.qc, features=self.out_ch, kernel_size=(1, 1), strides=(1, 1),
            padding=[(0, 0), (0, 0)], use_bias=False, name=f"conv_{idx}",
        )(y, qp)

        if use_res:
            # fused boundary (qp.chained): block output may arrive as a
            # pending Affine — the add needs materialized floats
            y = decoded(x) + decoded(y)
            if qp.quant_a and self.quantize_residual:
                y = QuantSite(
                    self.qc.act_quantizer(), self.qc.act_range,
                    name="activation_quantizer",
                )(y, qp)
        return y


class QuantizedMobileNetV2(nn.Module):
    """MobileNetV2 with FP8/INT quantized convs and classifier.

    Input: NHWC float images. Output: (B, num_classes) logits.
    """

    qc: QuantConfig
    num_classes: int = 1000
    width_mult: float = 1.0
    input_size: int = 224
    dropout: float = 0.0

    def _setup_overrides(self):
        qs = self.qc.quant_setup
        first_w = last_w = dw_bits = None
        fp_logits = False
        quantize_residual = True
        if qs == "FP_logits":
            fp_logits = True
        elif qs == "fc4":
            first_w, last_w = 8, 4
        elif qs == "fc4_dw8":
            first_w, last_w, dw_bits = 8, 4, 8
        elif qs in ("LSQ", "LSQ_paper"):
            first_w, last_w = 8, 8
            fp_logits = qs == "LSQ"
            if qs == "LSQ_paper":
                quantize_residual = False
        elif qs not in (None, "all"):
            raise ValueError(f"Quantization setup '{qs}' not supported for MobilenetV2")
        return first_w, last_w, dw_bits, fp_logits, quantize_residual

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED, *,
                 deterministic: bool = True):
        first_w, last_w, dw_bits, fp_logits, quantize_residual = (
            self._setup_overrides()
        )
        input_channel = int(32 * self.width_mult)
        last_channel = (int(1280 * self.width_mult)
                        if self.width_mult > 1.0 else 1280)

        # stem: conv_bn(3, 32, stride 2) + ReLU6 (mobilenet_v2.py:15-18,89)
        x = BNQuantConv(
            qc=self.qc, features=input_channel, kernel_size=(3, 3),
            strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False,
            activation=relu6, n_bits_w=first_w, name="features_0",
        )(x, qp)

        idx = 1
        in_ch = input_channel
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            out_ch = int(c * self.width_mult)
            for i in range(n):
                x = QuantInvertedResidual(
                    qc=self.qc, in_ch=in_ch, out_ch=out_ch,
                    stride=s if i == 0 else 1, expand_ratio=t,
                    n_bits_dw=dw_bits, quantize_residual=quantize_residual,
                    name=f"features_{idx}",
                )(x, qp)
                in_ch = out_ch
                idx += 1

        # last conv_1x1_bn + ReLU6; its activation site is hoisted so the
        # avg-pool can tie to it (quantize_sequential tie logic,
        # autoquant_utils.py:309-341)
        x = BNQuantConv(
            qc=self.qc, features=last_channel, kernel_size=(1, 1),
            strides=(1, 1), padding=[(0, 0), (0, 0)], use_bias=False,
            activation=relu6, quantize_output=False, name=f"features_{idx}",
        )(x, qp)

        tie = not self.qc.quantize_input
        pool_site = QuantSite(
            self.qc.act_quantizer(), self.qc.act_range,
            name=f"features_{idx}_activation_quantizer",
        )
        if qp.quant_a and not self.qc.quantize_input:
            x = pool_site(x, qp)
        # AvgPool2d(input_size // 32) (mobilenet_v2.py:101); a pending
        # Affine (fused boundary) materializes first — the clamp does not
        # commute with pooling
        win = self.input_size // 32
        x = nn.avg_pool(decoded(x), (win, win), strides=(win, win))
        if qp.quant_a:
            # tied: quantize without range update (autoquant_utils.py:147-158)
            x = pool_site(x, FIXED if tie else qp)

        x = x.reshape(x.shape[0], -1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = QuantDense(
            qc=self.qc, features=self.num_classes, use_bias=True,
            n_bits_w=last_w, quantize_output=not fp_logits,
            name="classifier_1",
        )(x, qp)
        return decoded(x)  # chained: logits come back as codes
