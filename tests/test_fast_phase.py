"""Fast-inference phase (bf16 MXU) must track the f32 reference closely."""

import dataclasses

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
from fp8_quantization_tpu.models.vit import QuantizedViT, ViTSpec
from fp8_quantization_tpu.quant import ESTIMATE, FIXED, QuantPhase

FAST = QuantPhase(phase="fixed", fast=True)


def _qc():
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )


def test_fast_vit_matches_fixed(rng):
    spec = ViTSpec(hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64,
                   patch_size=8, image_size=32, num_classes=7)
    model = QuantizedViT(qc=_qc(), spec=spec)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    variables = {**variables, **ups}

    y_ref = np.asarray(model.apply(variables, x, FIXED))
    y_fast = np.asarray(model.apply(variables, x, FAST))
    # quantized operands are exact in bf16; only f32 sum order differs, and
    # downstream requants re-snap values onto the grid
    np.testing.assert_allclose(y_fast, y_ref, rtol=1e-2, atol=1e-2)
    corr = np.corrcoef(y_fast.ravel(), y_ref.ravel())[0, 1]
    assert corr > 0.9999

    # top-1 predictions agree
    np.testing.assert_array_equal(np.argmax(y_fast, -1), np.argmax(y_ref, -1))


def test_fast_noop_when_unquantized(rng):
    """fast has no effect when acts are not quantized (bf16 would be lossy)."""
    from fp8_quantization_tpu.ops.layers import QuantDense

    qc = _qc()
    layer = QuantDense(qc=qc, features=8)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    variables = layer.init(jax.random.key(0), x, ESTIMATE)
    _, ups = layer.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    variables = {**variables, **ups}
    y_a = np.asarray(layer.apply(
        variables, x, QuantPhase(phase="fixed", fast=True, quant_a=False,
                                 quant_w=False)
    ))
    y_b = np.asarray(layer.apply(
        variables, x, QuantPhase(phase="fixed", quant_a=False, quant_w=False)
    ))
    np.testing.assert_array_equal(y_a, y_b)


def test_weight_cache_exact_and_skips_recompute(rng):
    from fp8_quantization_tpu.eval.driver import cache_quantized_weights
    from fp8_quantization_tpu.models.demo import QuantizedDemoModel
    from fp8_quantization_tpu.ops.layers import QuantDense

    model = QuantizedDemoModel(qc=_qc())
    x = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    variables = {**variables, **ups}

    y_ref = np.asarray(model.apply(variables, x, FIXED))
    cached = cache_quantized_weights(model, variables, x)
    assert "quant_cache" in cached
    y_cached = np.asarray(model.apply(cached, x, FIXED))
    np.testing.assert_array_equal(y_cached, y_ref)

    # the cache is actually used: zeroing the cached tensor changes output
    import flax

    qc2 = flax.core.unfreeze(cached["quant_cache"])
    qc2["fc"]["w_q"] = jnp.zeros_like(qc2["fc"]["w_q"])
    y_zero = np.asarray(model.apply({**cached, "quant_cache": qc2}, x, FIXED))
    assert not np.allclose(y_zero, y_ref)

    # estimate phase ignores the cache (recalibration stays live)
    _, ups2 = model.apply(cached, x, ESTIMATE, mutable=["quant", "quant_est"])
    assert ups2
