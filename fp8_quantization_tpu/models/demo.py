"""Demo model: the smallest end-to-end quantized pipeline smoke test.

~ reference ``models/demo_quantized.py:12-38`` (a single 10->10 Linear put
through ``quantize_model``) and the ``validate-quantized-demo`` command
(image_net.py:205-224).
"""

from __future__ import annotations

import flax.linen as nn

from ..config import QuantConfig
from ..ops.layers import QuantDense
from ..quant.sites import FIXED, QuantPhase


class QuantizedDemoModel(nn.Module):
    qc: QuantConfig
    features: int = 10

    @nn.compact
    def __call__(self, x, qp: QuantPhase = FIXED):
        return QuantDense(qc=self.qc, features=self.features, name="fc")(x, qp)
