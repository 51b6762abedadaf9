"""Quantized ResNet structural tests: build, port, calibrate, evaluate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.porting import merge_ported, port_resnet
from fp8_quantization_tpu.models.resnet import RESNET_SPECS, QuantizedResNet
from fp8_quantization_tpu.quant import ESTIMATE, FIXED, FP32


def _qc(**kw):
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
        **kw,
    )


def _fake_torchvision_state(depth, rng, num_classes=13):
    """Synthesize a torchvision-layout state dict with correct shapes."""
    kind, reps = RESNET_SPECS[depth]
    expansion = 1 if kind == "basic" else 4
    state = {}

    def conv_bn(prefix_c, prefix_b, o, i, k):
        state[f"{prefix_c}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05
        state[f"{prefix_b}.weight"] = (rng.normal(size=(o,)) * 0.1 + 1).astype(np.float32)
        state[f"{prefix_b}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.1
        state[f"{prefix_b}.running_mean"] = rng.normal(size=(o,)).astype(np.float32) * 0.1
        state[f"{prefix_b}.running_var"] = np.abs(rng.normal(size=(o,)) * 0.1 + 1).astype(np.float32)

    conv_bn("conv1", "bn1", 64, 3, 7)
    in_ch = 64
    for li, (width, n) in enumerate(zip((64, 128, 256, 512), reps), start=1):
        for bi in range(n):
            stride = (1 if li == 1 else 2) if bi == 0 else 1
            out_ch = width * expansion
            pre = f"layer{li}.{bi}"
            if kind == "basic":
                conv_bn(f"{pre}.conv1", f"{pre}.bn1", width, in_ch, 3)
                conv_bn(f"{pre}.conv2", f"{pre}.bn2", width, width, 3)
            else:
                conv_bn(f"{pre}.conv1", f"{pre}.bn1", width, in_ch, 1)
                conv_bn(f"{pre}.conv2", f"{pre}.bn2", width, width, 3)
                conv_bn(f"{pre}.conv3", f"{pre}.bn3", out_ch, width, 1)
            if stride != 1 or in_ch != out_ch:
                conv_bn(f"{pre}.downsample.0", f"{pre}.downsample.1",
                        out_ch, in_ch, 1)
            in_ch = out_ch
    state["fc.weight"] = rng.normal(size=(num_classes, in_ch)).astype(np.float32) * 0.05
    state["fc.bias"] = rng.normal(size=(num_classes,)).astype(np.float32) * 0.1
    return state


@pytest.mark.parametrize("depth", [18, 50])
def test_port_and_validate(depth, rng):
    model = QuantizedResNet(qc=_qc(), depth=depth, num_classes=13)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)

    state = _fake_torchvision_state(depth, rng)
    params, stats = port_resnet(state, depth)
    merged = merge_ported(variables, params, stats)

    # every layer param must be covered by the port (no silent misses)
    def leaf_paths(tree, pre=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from leaf_paths(v, pre + (k,))
            else:
                yield pre + (k,)

    init_paths = set(leaf_paths(variables["params"]))
    ported_paths = set(leaf_paths(params))
    missing = init_paths - ported_paths
    assert not missing, f"unported params: {sorted(missing)[:5]}"

    # calibrate -> eval, deterministic, proper shapes
    _, ups = model.apply(merged, x, ESTIMATE, mutable=["quant", "quant_est"])
    merged = {**merged, **ups}
    y1 = model.apply(merged, x, FIXED)
    y2 = model.apply(merged, x, FIXED)
    assert y1.shape == (2, 13)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    # quantization perturbs but does not destroy the FP32 output
    y_fp = model.apply(merged, x, FP32)
    assert not np.allclose(np.asarray(y1), np.asarray(y_fp))
    corr = np.corrcoef(np.asarray(y1).ravel(), np.asarray(y_fp).ravel())[0, 1]
    assert corr > 0.95, corr


def test_bad_quant_setup_raises():
    model = QuantizedResNet(qc=_qc(quant_setup="nope"), depth=18)
    with pytest.raises(ValueError, match="not supported for Resnet"):
        model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), ESTIMATE)
