"""bf16 fast inference mode: value parity with the fixed phase.

Fast mode changes only dtypes on the wire (quant sites emit bf16, matmuls
consume bf16 with f32 accumulation); all values are FP8-grid points that are
exact in bf16, so outputs must match the fixed phase up to dot-product
accumulation-order effects.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.config import (
    ApproxConfig,
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.vit import QuantizedViT, ViTSpec
from fp8_quantization_tpu.ops.layers import (
    BNQuantConv,
    QuantConv,
    QuantDense,
    QuantLayerNorm,
)
from fp8_quantization_tpu.quant import ESTIMATE, FAST, FIXED, QuantPhase


def _qc(**kw):
    base = dict(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )
    base.update(kw)
    return QuantConfig(**base)


def _calibrated(layer, x):
    variables = layer.init(jax.random.key(0), x, ESTIMATE)
    _, ups = layer.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    return {**variables, **ups}


def _assert_close(fast, fixed):
    fast = np.asarray(fast, np.float32)
    fixed = np.asarray(fixed, np.float32)
    np.testing.assert_allclose(fast, fixed, rtol=2e-2, atol=1e-4)
    # requant snaps both paths onto the same grid except at half-ulp
    # accumulation edges — the overwhelming majority must be bit-identical
    assert np.mean(fast == fixed) > 0.95


def test_dense_fast_matches_fixed(rng):
    layer = QuantDense(qc=_qc(), features=32)
    x = jnp.asarray(rng.normal(size=(16, 24)), jnp.float32)
    v = _calibrated(layer, x)
    out_fast = layer.apply(v, x, FAST)
    assert out_fast.dtype == jnp.bfloat16  # res site emits bf16
    _assert_close(out_fast, layer.apply(v, x, FIXED))


def test_conv_fast_matches_fixed(rng):
    layer = QuantConv(qc=_qc(), features=8, kernel_size=(3, 3))
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    v = _calibrated(layer, x)
    _assert_close(layer.apply(v, x, FAST), layer.apply(v, x, FIXED))


def test_bnconv_fast_matches_fixed(rng):
    layer = BNQuantConv(qc=_qc(), features=8, kernel_size=(3, 3),
                        use_bias=False)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    v = _calibrated(layer, x)
    out_fast = layer.apply(v, x, FAST)
    assert out_fast.dtype == jnp.float32  # BN runs (and emits) f32
    # BN rescales off-grid, so exact-match fraction doesn't apply; the bf16
    # difference enters only through the conv accumulation order
    np.testing.assert_allclose(np.asarray(out_fast),
                               np.asarray(layer.apply(v, x, FIXED)),
                               rtol=2e-2, atol=1e-3)


def test_layernorm_fast_matches_fixed(rng):
    layer = QuantLayerNorm(qc=_qc())
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    v = _calibrated(layer, x)
    # LN stats are computed in f32 from grid-exact values: bitwise equal
    np.testing.assert_array_equal(
        np.asarray(layer.apply(v, x, FAST), np.float32),
        np.asarray(layer.apply(v, x, FIXED), np.float32))


def test_approx_path_unaffected_by_fast(rng):
    """The approx simulation upcasts to f32: fast == fixed bitwise."""
    qc = _qc(run_method=RunMethodConfig(res_quantizer_flag=True,
                                        approx_flag=True),
             approx=ApproxConfig(expo_width=3, mant_width=4,
                                 with_approx=True, with_comp=True))
    layer = QuantDense(qc=qc, features=8)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    v = _calibrated(layer, x)
    np.testing.assert_array_equal(
        np.asarray(layer.apply(v, x, FAST), np.float32),
        np.asarray(layer.apply(v, x, FIXED), np.float32))


def test_weight_cache_fast_stores_bf16(rng):
    layer = QuantDense(qc=_qc(), features=8)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    v = _calibrated(layer, x)
    cache_qp = QuantPhase(phase="fixed", cache_weights=True, fast=True)
    out_c, ups = layer.apply(v, x, cache_qp, mutable=["quant_cache"])
    v = {**v, **ups}
    assert v["quant_cache"]["w_q"].dtype == jnp.bfloat16
    out_fast = layer.apply(v, x, FAST)
    np.testing.assert_array_equal(np.asarray(out_fast, np.float32),
                                  np.asarray(out_c, np.float32))


def test_vit_tiny_fast_matches_fixed(rng):
    """Whole-model check on a tiny ViT: logits close, argmax identical."""
    spec = ViTSpec(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                   num_heads=2, mlp_dim=64, num_classes=10)
    model = QuantizedViT(qc=_qc(), spec=spec)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE,
                         mutable=["quant", "quant_est"])
    variables = {**variables, **ups}

    out_fixed = np.asarray(model.apply(variables, x, FIXED), np.float32)
    out_fast = np.asarray(model.apply(variables, x, FAST), np.float32)
    np.testing.assert_allclose(out_fast, out_fixed, rtol=5e-2, atol=5e-3)
    np.testing.assert_array_equal(out_fast.argmax(-1), out_fixed.argmax(-1))
