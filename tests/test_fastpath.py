"""Fast-path (XLA-fused) quantized matmul vs the site-based reference flow."""

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
from fp8_quantization_tpu.ops.fastpath import fast_dense_apply, finalize_dense
from fp8_quantization_tpu.ops.layers import QuantDense
from fp8_quantization_tpu.quant import ESTIMATE, FIXED


def _qc(per_channel=True):
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=per_channel,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )


@pytest.mark.parametrize("per_channel", [True, False])
def test_fast_path_matches_layer(per_channel, rng):
    qc = _qc(per_channel)
    layer = QuantDense(qc=qc, features=24)
    x1 = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32)) * 1.5
    variables = layer.init(jax.random.key(0), x1, ESTIMATE)
    for b in (x1, x2):
        _, ups = layer.apply(variables, b, ESTIMATE, mutable=["quant", "quant_est"])
        variables = {**variables, **ups}

    y_ref = np.asarray(layer.apply(variables, x2, FIXED))

    fp = finalize_dense(qc, variables["params"], variables["quant"])
    y_fast = np.asarray(fast_dense_apply(fp, x2))

    # products of grid values are exact in bf16/f32; only the f32 sum order
    # differs between the two dots, and the final requant snaps both onto the
    # same grid except at half-ulp accumulation edges
    np.testing.assert_allclose(y_fast, y_ref, rtol=2e-2, atol=1e-4)
    exact = np.mean(y_fast == y_ref)
    assert exact > 0.98, exact


def test_fast_path_jits_and_is_deterministic(rng):
    qc = _qc()
    layer = QuantDense(qc=qc, features=8)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    variables = layer.init(jax.random.key(0), x, ESTIMATE)
    _, ups = layer.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    variables = {**variables, **ups}
    fp = finalize_dense(qc, variables["params"], variables["quant"])
    f = jax.jit(lambda p, x: fast_dense_apply(p, x))
    a = np.asarray(f(fp, x))
    b = np.asarray(f(fp, x))
    np.testing.assert_array_equal(a, b)
    assert fp.w16.dtype == jnp.bfloat16
