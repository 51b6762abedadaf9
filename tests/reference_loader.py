"""Dev-time loader for the reference implementation (parity tests only).

When the read-only reference checkout is present at ``/root/reference``, the
parity tests exercise our jnp implementations against the original torch code
on CPU. The reference's kernel modules hard-code ``device='cuda'`` in
module-level tensor literals, so we exec them with that string rewritten; no
reference code enters this repository.
"""

import os
import types

REFERENCE_ROOT = os.environ.get("FP8_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def load_reference_module(relpath: str, name: str, stubs=None):
    """Exec a reference .py file as a module, patching cuda literals to cpu.

    ``stubs`` maps module names to module objects temporarily injected into
    ``sys.modules`` so reference-internal imports resolve without pulling in
    uninstalled dependencies (timm/click/ignite).
    """
    import sys

    path = os.path.join(REFERENCE_ROOT, relpath)
    with open(path) as f:
        src = f.read()
    src = src.replace("device='cuda'", "device='cpu'").replace(
        'device="cuda"', 'device="cpu"'
    )
    # strip any __main__ harness
    idx = src.find('if __name__ == "__main__":')
    if idx != -1:
        src = src[:idx]
    mod = types.ModuleType(name)
    mod.__file__ = path
    stubs = stubs or {}
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        exec(compile(src, path, "exec"), mod.__dict__)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def load_reference_fp8_quantizer():
    """Load the reference FP8 quantizer module with its deps stubbed."""
    import enum

    import torch
    from torch import nn

    utils_stub = types.ModuleType("utils")

    class _BaseEnumOptions(enum.Enum):
        pass

    utils_stub.BaseEnumOptions = _BaseEnumOptions
    utils_stub.MethodMap = lambda m: m
    utils_stub.ClassEnumOptions = _BaseEnumOptions
    utils_stub.to_numpy = lambda t: t.detach().cpu().numpy()

    class _QuantizerBase(nn.Module):
        def __init__(self, n_bits, per_channel=False, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.n_bits = n_bits
            self.per_channel = per_channel
            self.state = None

    base_stub = types.ModuleType("quantization.quantizers.base_quantizers")
    base_stub.QuantizerBase = _QuantizerBase

    rounding = load_reference_module(
        "quantization/quantizers/rounding_utils.py",
        "_ref_rounding_utils",
        stubs={"utils": utils_stub},
    )
    rounding_stub = types.ModuleType("quantization.quantizers.rounding_utils")
    rounding_stub.__dict__.update(rounding.__dict__)

    del torch
    return load_reference_module(
        "quantization/quantizers/fp8_quantizer.py",
        "_ref_fp8_quantizer",
        stubs={
            "quantization.quantizers.base_quantizers": base_stub,
            "quantization.quantizers.rounding_utils": rounding_stub,
        },
    )


def _make_utils_stub():
    """Faithful stand-in for the reference's ``utils`` package exports used by
    the quantization modules (utils/utils.py:297-315)."""
    import enum
    import itertools
    import types as _t
    from collections import namedtuple

    utils_stub = _t.ModuleType("utils")

    class BaseEnumOptions(enum.Enum):
        def __str__(self):
            return self.name

        @classmethod
        def list_names(cls):
            return [m.name for m in cls]

    class ClassEnumOptions(BaseEnumOptions):
        @property
        def cls(self):
            return self.value.cls

        def __call__(self, *args, **kwargs):
            return self.value.cls(*args, **kwargs)

    _MM = namedtuple("MethodMap", ["value", "cls"])
    _ctr = itertools.count(1)

    utils_stub.BaseEnumOptions = BaseEnumOptions
    utils_stub.ClassEnumOptions = ClassEnumOptions
    utils_stub.MethodMap = lambda cls: _MM(next(_ctr), cls)
    utils_stub.to_numpy = lambda t: t.detach().cpu().numpy()
    return utils_stub


def _make_timm_stubs():
    """Stub the timm activation modules imported by hijacker.py:7-8."""
    import types as _t

    import torch
    from torch import nn

    def _mk(fn):
        class _Act(nn.Module):
            def __init__(self, inplace=False):
                super().__init__()

            def forward(self, x):
                return fn(x)

        return _Act

    acts = _t.ModuleType("timm.models.layers.activations")
    acts.Swish = _mk(lambda x: x * torch.sigmoid(x))
    acts.HardSwish = _mk(lambda x: x * torch.nn.functional.hardsigmoid(x))
    acts.HardSigmoid = _mk(torch.nn.functional.hardsigmoid)
    acts_me = _t.ModuleType("timm.models.layers.activations_me")
    acts_me.SwishMe = acts.Swish
    acts_me.HardSwishMe = acts.HardSwish
    acts_me.HardSigmoidMe = acts.HardSigmoid

    timm = _t.ModuleType("timm")
    models = _t.ModuleType("timm.models")
    layers = _t.ModuleType("timm.models.layers")
    timm.models = models
    models.layers = layers
    layers.activations = acts
    layers.activations_me = acts_me
    stubs = {
        "timm": timm,
        "timm.models": models,
        "timm.models.layers": layers,
        "timm.models.layers.activations": acts,
        "timm.models.layers.activations_me": acts_me,
    }
    # transformers probes importlib.util.find_spec("timm"); a spec-less stub
    # raises "timm.__spec__ is None"
    import importlib.machinery

    for name, mod in stubs.items():
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return stubs


def _make_torchvision_resnet_stub():
    """Minimal torch ResNet matching torchvision's module tree exactly
    (module names, state-dict keys, block attributes) so the reference's
    ``models/resnet_quantized.py`` — which imports
    ``torchvision.models.resnet.BasicBlock/Bottleneck`` and wraps
    ``resnet18/resnet50`` — runs without torchvision installed (absent in
    this environment; VERDICT r1 #5)."""
    import types as _t

    import torch
    from torch import nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            out += identity
            return self.relu(out)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            out += identity
            return self.relu(out)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                              stride, bias=False),
                    nn.BatchNorm2d(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    mod = _t.ModuleType("torchvision.models.resnet")
    mod.BasicBlock = BasicBlock
    mod.Bottleneck = Bottleneck
    mod.ResNet = ResNet
    mod.resnet18 = lambda pretrained=False, num_classes=1000: ResNet(
        BasicBlock, [2, 2, 2, 2], num_classes)
    mod.resnet50 = lambda pretrained=False, num_classes=1000: ResNet(
        Bottleneck, [3, 4, 6, 3], num_classes)
    return mod


_QUANT_STACK_CACHE = None


def load_reference_quant_stack():
    """Load the reference's full quantization module stack for parity tests.

    Returns a namespace with ``autoquant_utils``, ``quantization_manager``,
    ``base_quantized_classes``, ``hijacker``, ``quantized_folded_bn``,
    ``range_estimators``, ``fp8_quantizer``, ``uniform_quantizers``.
    """
    global _QUANT_STACK_CACHE
    if _QUANT_STACK_CACHE is not None:
        return _QUANT_STACK_CACHE

    import sys
    import types as _t

    utils_stub = _make_utils_stub()
    stubs = {"utils": utils_stub}
    stubs.update(_make_timm_stubs())

    # fake package skeleton so absolute/relative imports resolve
    qpkg = _t.ModuleType("quantization")
    qzpkg = _t.ModuleType("quantization.quantizers")
    qpkg.__path__ = []
    qzpkg.__path__ = []
    stubs["quantization"] = qpkg
    stubs["quantization.quantizers"] = qzpkg

    import numpy as _np

    stubs["cupy"] = _np  # cupy used as drop-in numpy (approx_calculation.py:6)
    apkg = _t.ModuleType("approx")
    apkg.__path__ = []
    stubs["approx"] = apkg
    mpkg = _t.ModuleType("models")
    mpkg.__path__ = []
    stubs["models"] = mpkg

    # torchvision isn't installed; the reference vit module imports one name
    import importlib.machinery as _im

    tv = _t.ModuleType("torchvision")
    tvm = _t.ModuleType("torchvision.models")
    tvm.vit_b_16 = None
    tv.models = tvm
    tv.__spec__ = _im.ModuleSpec("torchvision", loader=None)
    tvm.__spec__ = _im.ModuleSpec("torchvision.models", loader=None)
    tvr = _make_torchvision_resnet_stub()
    tvr.__spec__ = _im.ModuleSpec("torchvision.models.resnet", loader=None)
    tvm.resnet = tvr
    tvm.resnet18 = tvr.resnet18
    tvm.resnet50 = tvr.resnet50
    stubs["torchvision"] = tv
    stubs["torchvision.models"] = tvm
    stubs["torchvision.models.resnet"] = tvr

    order = [
        ("quantization/quantizers/utils.py", "quantization.quantizers.utils"),
        ("quantization/quantizers/base_quantizers.py",
         "quantization.quantizers.base_quantizers"),
        ("quantization/quantizers/rounding_utils.py",
         "quantization.quantizers.rounding_utils"),
        ("quantization/quantizers/fp8_quantizer.py",
         "quantization.quantizers.fp8_quantizer"),
        ("quantization/quantizers/uniform_quantizers.py",
         "quantization.quantizers.uniform_quantizers"),
        ("quantization/range_estimators.py", "quantization.range_estimators"),
        ("quantization/quantization_manager.py",
         "quantization.quantization_manager"),
        ("quantization/base_quantized_classes.py",
         "quantization.base_quantized_classes"),
        ("quantization/hijacker.py", "quantization.hijacker"),
        ("quantization/quantized_folded_bn.py",
         "quantization.quantized_folded_bn"),
        ("quantization/autoquant_utils.py", "quantization.autoquant_utils"),
        ("approx/approx_matmul_whole_v9.py", "approx.approx_matmul_whole_v9"),
        ("approx/approx_calculation.py", "approx.approx_calculation"),
        ("quantization/base_quantized_model.py",
         "quantization.base_quantized_model"),
        ("models/mobilenet_v2.py", "models.mobilenet_v2"),
        ("models/mobilenet_v2_quantized.py", "models.mobilenet_v2_quantized"),
        ("models/resnet_quantized.py", "models.resnet_quantized"),
        ("models/vit_quantized.py", "models.vit_quantized"),
    ]

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    ns = _t.SimpleNamespace()
    ns.torchvision_resnet = tvr  # stub factories for building FP32 resnets
    try:
        for relpath, name in order:
            path = os.path.join(REFERENCE_ROOT, relpath)
            with open(path) as f:
                src = f.read().replace("device='cuda'", "device='cpu'")
            mod = _t.ModuleType(name)
            mod.__file__ = path
            mod.__package__ = name.rsplit(".", 1)[0]
            sys.modules[name] = mod
            stubs[name] = mod
            exec(compile(src, path, "exec"), mod.__dict__)
            # attach to parent package for attribute-style access
            parent_name, _, leaf = name.rpartition(".")
            setattr(sys.modules[parent_name], leaf, mod)
            setattr(ns, leaf, mod)
            if name == "models.vit_quantized":
                # newer transformers dropped the ViTSdpa* aliases the
                # reference names inside __init__ bodies (resolved at call
                # time) — alias them to the current classes; also re-expose
                # classes that `import *` no longer covers
                import transformers.models.vit.modeling_vit as _mv

                for cls_name in (
                    "ViTSelfAttention", "ViTAttention", "ViTSelfOutput",
                    "ViTIntermediate", "ViTOutput", "ViTLayer", "ViTEncoder",
                    "ViTEmbeddings", "ViTPatchEmbeddings", "ViTModel",
                ):
                    if not hasattr(mod, cls_name):
                        setattr(mod, cls_name, getattr(_mv, cls_name))
                if not hasattr(mod, "ViTSdpaSelfAttention"):
                    mod.ViTSdpaSelfAttention = _mv.ViTSelfAttention
                if not hasattr(mod, "ViTSdpaAttention"):
                    mod.ViTSdpaAttention = _mv.ViTAttention
            if name == "quantization.quantizers.uniform_quantizers":
                # emulate quantization/quantizers/__init__.py exports
                qzpkg.QuantizerBase = stubs[
                    "quantization.quantizers.base_quantizers"].QuantizerBase
                qzpkg.FPQuantizer = stubs[
                    "quantization.quantizers.fp8_quantizer"].FPQuantizer
                qzpkg.AsymmetricUniformQuantizer = mod.AsymmetricUniformQuantizer
                qzpkg.SymmetricUniformQuantizer = mod.SymmetricUniformQuantizer
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for _, name in order:
            sys.modules.pop(name, None)

    _QUANT_STACK_CACHE = ns
    return ns


def load_reference_range_estimators():
    """Load the reference range estimators with deps stubbed."""
    import enum
    import types as _t

    utils_stub = _t.ModuleType("utils")

    class _BaseEnumOptions(enum.Enum):
        pass

    utils_stub.BaseEnumOptions = _BaseEnumOptions
    utils_stub.MethodMap = staticmethod
    utils_stub.ClassEnumOptions = object
    utils_stub.to_numpy = lambda t: t.detach().cpu().numpy()

    mod = load_reference_module(
        "quantization/range_estimators.py",
        "_ref_range_estimators",
        stubs={"utils": utils_stub},
    )
    return mod
