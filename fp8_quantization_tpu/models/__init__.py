"""Model families (all quantized-first, NHWC, flax).

~ reference ``models/__init__.py`` QuantArchitectures registry.
"""

from .demo import QuantizedDemoModel
from .mobilenet_v2 import QuantizedMobileNetV2

ARCHITECTURES = {
    "mobilenet_v2_quantized": QuantizedMobileNetV2,
    "demo_quantized": QuantizedDemoModel,
}

__all__ = ["QuantizedMobileNetV2", "QuantizedDemoModel", "ARCHITECTURES"]
