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
