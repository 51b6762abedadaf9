"""Frozen-weight cache behavior."""

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
from fp8_quantization_tpu.quant import ESTIMATE, FIXED, QuantPhase

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
