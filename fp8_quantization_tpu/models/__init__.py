"""Model families (all quantized-first, NHWC, flax).

~ reference ``models/__init__.py`` QuantArchitectures registry.
"""

from .flax_surgery import QuantizedFlaxModel, quantize_flax_model
from .paged_kv import PagedBatcher, PagedKVCache
from .bert import BERT_BASE, BertSpec, QuantizedBert
from .llama import KVCache, LLAMA3_8B, LLAMA_TINY, LlamaSpec, QuantizedLlama
from .serving import ContinuousBatcher
from .surgery import QuantizedSequential
from .demo import QuantizedDemoModel
from .mobilenet_v2 import QuantizedMobileNetV2
from .resnet import QuantizedResNet
from .vit import VIT_B_16, QuantizedViT, ViTSpec

ARCHITECTURES = {
    "mobilenet_v2_quantized": QuantizedMobileNetV2,
    "resnet18_quantized": lambda **kw: QuantizedResNet(depth=18, **kw),
    "resnet50_quantized": lambda **kw: QuantizedResNet(depth=50, **kw),
    "vit_quantized": QuantizedViT,
    "bert_quantized": QuantizedBert,
    "demo_quantized": QuantizedDemoModel,
    "llama_quantized": QuantizedLlama,
}

__all__ = [
    "QuantizedMobileNetV2",
    "QuantizedResNet",
    "QuantizedViT",
    "QuantizedBert",
    "QuantizedDemoModel",
    "ViTSpec",
    "VIT_B_16",
    "BertSpec",
    "BERT_BASE",
    "QuantizedLlama",
    "LlamaSpec",
    "LLAMA3_8B",
    "LLAMA_TINY",
    "KVCache",
    "ContinuousBatcher",
    "PagedBatcher",
    "PagedKVCache",
    "QuantizedFlaxModel",
    "quantize_flax_model",
    "QuantizedSequential",
    "ARCHITECTURES",
]
