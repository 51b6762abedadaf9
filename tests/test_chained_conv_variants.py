"""CHAINED (fused-boundary) coverage for every conv variant (round 4).

test_conv_serving pins PACKED == FAST per variant; these pin the fused
CHAINED path against PACKED for the same variants — depthwise, grouped,
strided/VALID, transposed, int4 — exercising the ``Affine`` emission and
the Affine->Coded / Affine->materialize folds across layouts. Contract:
within f32 constant-folding ULPs of the unfused path (rtol/atol 5e-4 at
these scales; exactness under po2 constants is pinned separately in
test_conv_serving).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.eval import cache_quantized_weights
from fp8_quantization_tpu.ops.fastpath import (
    pack_dense_caches,
    strip_packed_params,
)
from fp8_quantization_tpu.ops.layers import (
    BNQuantConv,
    QuantConv,
    QuantConvTranspose,
)
from fp8_quantization_tpu.quant import ESTIMATE
from fp8_quantization_tpu.quant.sites import CHAINED, PACKED, decoded


def _qc(n_bits=8, res=True):
    return QuantConfig(
        method=QMethod.symmetric_uniform,
        n_bits=n_bits,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        run_method=RunMethodConfig(res_quantizer_flag=res),
    )


def _prepare(model, x, qc):
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    _, ups = model.apply(variables, x, ESTIMATE,
                         mutable=["quant", "quant_est"])
    variables = {**variables, **ups}
    variables = cache_quantized_weights(model, variables, x, fast=True)
    packed, report = pack_dense_caches(variables, qc)
    return strip_packed_params(packed), report


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))


@pytest.mark.parametrize("res", [True, False])
@pytest.mark.parametrize("layer_kw", [
    dict(features=8, kernel_size=(3, 3)),
    dict(features=8, kernel_size=(3, 3), strides=(2, 2), padding="VALID"),
    dict(features=6, kernel_size=(3, 3), feature_group_count=6),  # depthwise
    dict(features=8, kernel_size=(3, 3), feature_group_count=2),
])
def test_chained_conv_matches_packed(layer_kw, res, x):
    qc = _qc(res=res)
    model = QuantConv(qc=qc, **layer_kw)
    packed, report = _prepare(model, x, qc)
    assert report
    y_pack = np.asarray(decoded(model.apply(packed, x, PACKED)), np.float32)
    y_chained = np.asarray(decoded(model.apply(packed, x, CHAINED)),
                           np.float32)
    np.testing.assert_allclose(y_chained, y_pack, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("res", [True, False])
def test_chained_bn_conv_matches_packed(res, x):
    qc = _qc(res=res)
    model = BNQuantConv(qc=qc, features=8, kernel_size=(3, 3),
                        activation=jax.nn.relu)
    packed, _ = _prepare(model, x, qc)
    y_pack = np.asarray(decoded(model.apply(packed, x, PACKED)), np.float32)
    y_chained = np.asarray(decoded(model.apply(packed, x, CHAINED)),
                           np.float32)
    np.testing.assert_allclose(y_chained, y_pack, rtol=5e-4, atol=5e-4)


def test_chained_conv_transpose_matches_packed(x):
    qc = _qc()
    model = QuantConvTranspose(qc=qc, features=8, kernel_size=(3, 3),
                               strides=(2, 2))
    packed, _ = _prepare(model, x, qc)
    y_pack = np.asarray(decoded(model.apply(packed, x, PACKED)), np.float32)
    y_chained = np.asarray(decoded(model.apply(packed, x, CHAINED)),
                           np.float32)
    np.testing.assert_allclose(y_chained, y_pack, rtol=5e-4, atol=5e-4)


def test_chained_int4_conv_matches_packed(x):
    qc = _qc(n_bits=4)
    model = QuantConv(qc=qc, features=8, kernel_size=(3, 3))
    packed, report = _prepare(model, x, qc)
    assert report
    y_pack = np.asarray(decoded(model.apply(packed, x, PACKED)), np.float32)
    y_chained = np.asarray(decoded(model.apply(packed, x, CHAINED)),
                           np.float32)
    np.testing.assert_allclose(y_chained, y_pack, rtol=2e-3, atol=2e-3)
