"""Spec-based surgery vs the reference quantize_sequential product."""

import numpy as np
import pytest

from tests.reference_loader import load_reference_quant_stack, reference_available

import jax
import jax.numpy as jnp

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.surgery import (
    Act,
    AvgPool,
    BatchNorm,
    Conv,
    Flatten,
    Linear,
    QuantizedSequential,
    plan_sequential,
)
from fp8_quantization_tpu.quant import ESTIMATE, FIXED

SPECS = (
    Conv(8, (3, 3), (1, 1), [(1, 1), (1, 1)], use_bias=False),
    BatchNorm(),
    Act("relu"),
    Conv(6, (3, 3), (2, 2), [(1, 1), (1, 1)], use_bias=True),
    Act("relu"),
    AvgPool((2, 2)),
    Flatten(),
    Linear(5),
)


def _qc():
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=False,  # output-quant mode exercises the tie
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(original_quantize_res=True),
    )


def test_plan_folding():
    plan = plan_sequential(SPECS)
    kinds = [p[0] for p in plan]
    assert kinds == ["bnconv", "conv", "plain", "plain", "linear"]
    assert plan[0][2] == "relu" and plan[1][2] == "relu"


def test_build_calibrate_eval(rng):
    model = QuantizedSequential(qc=_qc(), specs=SPECS)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, ESTIMATE)
    # tied pool site shares the previous layer's act quantizer variables
    assert "layers_1_activation_quantizer" in variables["quant"]
    _, ups = model.apply(variables, x, ESTIMATE, mutable=["quant", "quant_est"])
    variables = {**variables, **ups}
    y = model.apply(variables, x, FIXED)
    assert y.shape == (2, 5)


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
def test_parity_vs_reference_quantize_sequential(rng):
    torch = pytest.importorskip("torch")
    from torch import nn as tnn

    stack = load_reference_quant_stack()
    re_ = stack.range_estimators

    torch.manual_seed(10)
    fp = tnn.Sequential(
        tnn.Conv2d(3, 8, 3, padding=1, bias=False),
        tnn.BatchNorm2d(8),
        tnn.ReLU(),
        tnn.Conv2d(8, 6, 3, stride=2, padding=1, bias=True),
        tnn.ReLU(),
        tnn.AvgPool2d(2),
    )
    # burn in BN stats
    with torch.no_grad():
        fp.train()
        for _ in range(3):
            fp(torch.randn(4, 3, 8, 8))
        fp.eval()

    qparams = dict(
        method=stack.fp8_quantizer.FPQuantizer,
        act_method=stack.fp8_quantizer.FPQuantizer,
        n_bits=8, n_bits_act=8,
        per_channel_weights=True, percentile=None,
        weight_range_method=re_.CurrentMinMaxEstimator,
        weight_range_options=dict(percentile=None),
        act_range_method=re_.AllMinMaxEstimator,
        act_range_options={}, scale_domain="linear", quantize_input=False,
        fp8_kwargs=dict(maxval=None, mantissa_bits=4, set_maxval=True,
                        learn_maxval=False, learn_mantissa_bits=False,
                        mse_include_mantissa_bits=False, allow_unsigned=False),
        run_method={"approx_flag": False, "quantize_after_mult_and_add": False,
                    "res_quantizer_flag": False, "original_quantize_res": True},
        custom_approx_params={
            "expo_width": 3, "mant_width": 4, "dnsmp_factor": 3,
            "withComp": False, "with_approx": False, "with_s2nn2s_opt": False,
            "sim_hw_add_OFUF": False, "with_OF_opt": False,
            "with_UF_opt": False, "golden_clip_OF": False,
            "quant_btw_mult_accu": True, "debug_mode": False,
            "self_check_mode": False,
        },
    )
    ref = stack.autoquant_utils.quantize_sequential(
        fp, tie_activation_quantizers=True, **qparams
    )

    specs = SPECS[:6]  # through the avg-pool
    model = QuantizedSequential(qc=_qc(), specs=specs)
    x0 = jnp.zeros((1, 8, 8, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, ESTIMATE)

    # port weights
    import flax

    p = flax.core.unfreeze(variables["params"])
    conv0, bn0, conv1 = fp[0], fp[1], fp[3]
    p["layers_0"]["kernel"] = jnp.asarray(
        np.transpose(conv0.weight.detach().numpy(), (2, 3, 1, 0)))
    p["layers_0"]["gamma"] = jnp.asarray(bn0.weight.detach().numpy())
    p["layers_0"]["beta"] = jnp.asarray(bn0.bias.detach().numpy())
    p["layers_1"]["kernel"] = jnp.asarray(
        np.transpose(conv1.weight.detach().numpy(), (2, 3, 1, 0)))
    p["layers_1"]["bias"] = jnp.asarray(conv1.bias.detach().numpy())
    variables = {**variables, "params": p,
                 "batch_stats": {"layers_0": {
                     "mean": jnp.asarray(bn0.running_mean.numpy()),
                     "var": jnp.asarray(bn0.running_var.numpy()),
                 }}}

    batches = [rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
               for _ in range(2)]
    eval_x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)

    import torch as _t

    def apply_all(fn_name):
        for mod in ref.modules():
            if hasattr(mod, fn_name):
                getattr(mod, fn_name)()

    apply_all("estimate_ranges")
    apply_all("quantized_weights")
    apply_all("quantized_acts")
    ref.eval()
    with _t.no_grad():
        for bch in batches:
            ref(_t.from_numpy(bch))
    apply_all("fix_ranges")
    with _t.no_grad():
        y_ref = ref(_t.from_numpy(eval_x)).numpy()

    nhwc = lambda t: np.transpose(t, (0, 2, 3, 1))
    for bch in batches:
        _, ups = model.apply(variables, jnp.asarray(nhwc(bch)), ESTIMATE,
                             mutable=["quant", "quant_est"])
        variables = {**variables, **ups}
    y_ours = np.asarray(model.apply(variables, jnp.asarray(nhwc(eval_x)), FIXED))
    np.testing.assert_allclose(np.transpose(y_ours, (0, 3, 1, 2)), y_ref,
                               rtol=1e-4, atol=1e-5)
