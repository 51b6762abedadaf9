"""Layer-level parity: our flax quantized layers vs the reference hijacker
stack, through calibrate -> fix-ranges -> eval, on identical weights."""

import numpy as np
import pytest

from tests.reference_loader import load_reference_quant_stack, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fp8_quantization_tpu.config import (  # noqa: E402
    ApproxConfig,
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.ops.layers import BNQuantConv, QuantConv, QuantDense  # noqa: E402
from fp8_quantization_tpu.quant import ESTIMATE, FIXED  # noqa: E402


@pytest.fixture(scope="module")
def stack():
    return load_reference_quant_stack()


DEFAULT_APPROX = {
    "expo_width": 3,
    "mant_width": 4,
    "dnsmp_factor": 3,
    "withComp": False,
    "with_approx": False,
    "with_s2nn2s_opt": False,
    "sim_hw_add_OFUF": False,
    "with_OF_opt": False,
    "with_UF_opt": False,
    "golden_clip_OF": False,
    "quant_btw_mult_accu": True,
    "debug_mode": False,
    "self_check_mode": False,
}


def _ref_qparams(stack, run_method, *, per_channel=True, quantize_input=True,
                 approx_params=None, act_range="allminmax"):
    re = stack.range_estimators
    act_cls = {"allminmax": re.AllMinMaxEstimator,
               "current_minmax": re.CurrentMinMaxEstimator,
               "running_minmax": re.RunningMinMaxEstimator}[act_range]
    return dict(
        method=stack.fp8_quantizer.FPQuantizer,
        act_method=stack.fp8_quantizer.FPQuantizer,
        n_bits=8,
        n_bits_act=8,
        per_channel_weights=per_channel,
        percentile=None,
        weight_range_method=re.CurrentMinMaxEstimator,
        weight_range_options={},
        act_range_method=act_cls,
        act_range_options={},
        scale_domain="linear",
        quantize_input=quantize_input,
        fp8_kwargs=dict(
            maxval=None, mantissa_bits=4, set_maxval=True, learn_maxval=False,
            learn_mantissa_bits=False, mse_include_mantissa_bits=False,
            allow_unsigned=False,
        ),
        run_method=dict(run_method),
        custom_approx_params=dict(approx_params or DEFAULT_APPROX),
    )


def _our_qc(run_method, *, per_channel=True, quantize_input=True,
            approx=ApproxConfig(), act_range="allminmax"):
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=per_channel,
        quantize_input=quantize_input,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod[act_range] if act_range != "MSE"
                                  else RangeMethod.MSE),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False,
                      mantissa_bits=4),
        run_method=RunMethodConfig(**run_method),
        approx=approx,
    )


def _calibrate_and_eval_ours(layer, batches, eval_x, extra=()):
    variables = layer.init(jax.random.key(0), jnp.asarray(batches[0]), ESTIMATE)
    variables = {**variables, "params": dict(variables["params"], **dict(extra))}
    for b in batches:
        _, ups = layer.apply(
            variables, jnp.asarray(b), ESTIMATE, mutable=["quant", "quant_est"]
        )
        variables = {**variables, **ups}
    return np.asarray(layer.apply(variables, jnp.asarray(eval_x), FIXED))


def _calibrate_ref(ref_layer, batches):
    ref_layer.estimate_ranges()
    ref_layer.quantized_weights()
    ref_layer.quantized_acts()
    ref_layer.eval()
    with torch.no_grad():
        for b in batches:
            ref_layer(torch.from_numpy(b))
    ref_layer.fix_ranges()


RM_PLAIN = {"approx_flag": False, "quantize_after_mult_and_add": False,
            "res_quantizer_flag": True, "original_quantize_res": True}


class TestLinearParity:
    @pytest.mark.parametrize("quantize_input", [True, False],
                             ids=["input-quant", "output-quant"])
    def test_plain_fp8_linear(self, stack, quantize_input, rng):
        in_f, out_f = 16, 8
        W = rng.normal(size=(out_f, in_f)).astype(np.float32)
        b = rng.normal(size=(out_f,)).astype(np.float32)
        batches = [rng.normal(size=(4, in_f)).astype(np.float32) for _ in range(2)]
        eval_x = rng.normal(size=(6, in_f)).astype(np.float32)

        ref = stack.autoquant_utils.QuantLinear(
            in_f, out_f, bias=True,
            **_ref_qparams(stack, RM_PLAIN, quantize_input=quantize_input),
        )
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(W))
            ref.bias.copy_(torch.from_numpy(b))
        _calibrate_ref(ref, batches)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(eval_x)).numpy()

        layer = QuantDense(
            qc=_our_qc(RM_PLAIN, quantize_input=quantize_input), features=out_f
        )
        y_ours = _calibrate_and_eval_ours(
            layer, batches, eval_x,
            extra=[("kernel", jnp.asarray(W.T)), ("bias", jnp.asarray(b))],
        )
        np.testing.assert_allclose(y_ours, y_ref, rtol=1e-5, atol=1e-6)

    def test_approx_linear(self, stack, rng, capsys):
        in_f, out_f = 12, 5
        W = rng.normal(size=(out_f, in_f)).astype(np.float32)
        batches = [rng.normal(size=(4, in_f)).astype(np.float32) for _ in range(2)]
        eval_x = rng.normal(size=(3, in_f)).astype(np.float32)

        rm = {"approx_flag": True, "quantize_after_mult_and_add": False,
              "res_quantizer_flag": True, "original_quantize_res": True}
        approx_params = dict(DEFAULT_APPROX, with_approx=True, withComp=True)

        ref = stack.approx_calculation.QCustomLinearTorch(
            in_f, out_f, bias=False,
            **_ref_qparams(stack, rm, approx_params=approx_params),
        )
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(W))
        _calibrate_ref(ref, batches)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(eval_x)).numpy()
        capsys.readouterr()  # swallow reference debug prints

        layer = QuantDense(
            qc=_our_qc(rm, approx=ApproxConfig(with_approx=True, with_comp=True)),
            features=out_f, use_bias=False,
        )
        y_ours = _calibrate_and_eval_ours(
            layer, batches, eval_x, extra=[("kernel", jnp.asarray(W.T))]
        )
        np.testing.assert_allclose(y_ours, y_ref, rtol=1e-5, atol=1e-6)

    def test_qama_linear(self, stack, rng, capsys):
        in_f, out_f = 10, 4
        W = rng.normal(size=(out_f, in_f)).astype(np.float32)
        batches = [rng.normal(size=(4, in_f)).astype(np.float32) for _ in range(2)]
        eval_x = rng.normal(size=(3, in_f)).astype(np.float32)

        rm = {"approx_flag": False, "quantize_after_mult_and_add": True,
              "res_quantizer_flag": True, "original_quantize_res": True}

        ref = stack.approx_calculation.QCustomLinearTorch(
            in_f, out_f, bias=False, **_ref_qparams(stack, rm)
        )
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(W))
        _calibrate_ref(ref, batches)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(eval_x)).numpy()
        capsys.readouterr()

        layer = QuantDense(qc=_our_qc(rm), features=out_f, use_bias=False)
        y_ours = _calibrate_and_eval_ours(
            layer, batches, eval_x, extra=[("kernel", jnp.asarray(W.T))]
        )
        np.testing.assert_allclose(y_ours, y_ref, rtol=1e-5, atol=1e-6)


class TestConvParity:
    @pytest.mark.parametrize("groups,stride", [(1, 1), (1, 2), (4, 1)],
                             ids=["dense", "strided", "depthwise"])
    def test_plain_conv(self, stack, groups, stride, rng):
        in_ch, out_ch, k = 4, 4, 3
        W = rng.normal(size=(out_ch, in_ch // groups, k, k)).astype(np.float32)
        b = rng.normal(size=(out_ch,)).astype(np.float32)
        batches = [rng.normal(size=(2, in_ch, 8, 8)).astype(np.float32)
                   for _ in range(2)]
        eval_x = rng.normal(size=(2, in_ch, 8, 8)).astype(np.float32)

        ref = stack.autoquant_utils.QuantConv(
            in_ch, out_ch, k, stride=stride, padding=1, groups=groups, bias=True,
            **_ref_qparams(stack, RM_PLAIN),
        )
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(W))
            ref.bias.copy_(torch.from_numpy(b))
        _calibrate_ref(ref, batches)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(eval_x)).numpy()  # NCHW

        layer = QuantConv(
            qc=_our_qc(RM_PLAIN), features=out_ch, kernel_size=(k, k),
            strides=(stride, stride), padding=[(1, 1), (1, 1)],
            feature_group_count=groups,
        )
        # torch OIHW -> flax HWIO
        kernel = jnp.asarray(np.transpose(W, (2, 3, 1, 0)))
        nhwc = lambda t: np.transpose(t, (0, 2, 3, 1))
        y_ours = _calibrate_and_eval_ours(
            layer, [nhwc(t) for t in batches], nhwc(eval_x),
            extra=[("kernel", kernel), ("bias", jnp.asarray(b))],
        )
        np.testing.assert_allclose(
            np.transpose(y_ours, (0, 3, 1, 2)), y_ref, rtol=1e-4, atol=1e-5
        )

    def test_bn_conv(self, stack, rng):
        in_ch, out_ch, k = 3, 6, 3
        W = rng.normal(size=(out_ch, in_ch, k, k)).astype(np.float32)
        gamma = (rng.normal(size=(out_ch,)) * 0.2 + 1).astype(np.float32)
        beta = rng.normal(size=(out_ch,)).astype(np.float32)
        mean = rng.normal(size=(out_ch,)).astype(np.float32)
        var = np.abs(rng.normal(size=(out_ch,)) + 1).astype(np.float32)
        batches = [rng.normal(size=(2, in_ch, 8, 8)).astype(np.float32)
                   for _ in range(2)]
        eval_x = rng.normal(size=(2, in_ch, 8, 8)).astype(np.float32)

        ref = stack.autoquant_utils.BNQConv(
            in_ch, out_ch, k, stride=1, padding=1,
            **_ref_qparams(stack, RM_PLAIN),
        )
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(W))
            ref.gamma.copy_(torch.from_numpy(gamma))
            ref.beta.copy_(torch.from_numpy(beta))
            ref.running_mean.copy_(torch.from_numpy(mean))
            ref.running_var.copy_(torch.from_numpy(var))
        _calibrate_ref(ref, batches)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(eval_x)).numpy()

        layer = BNQuantConv(
            qc=_our_qc(RM_PLAIN), features=out_ch, kernel_size=(k, k),
            strides=(1, 1), padding=[(1, 1), (1, 1)], use_bias=False,
        )
        kernel = jnp.asarray(np.transpose(W, (2, 3, 1, 0)))
        nhwc = lambda t: np.transpose(t, (0, 2, 3, 1))
        y_ours = _calibrate_and_eval_ours(
            layer, [nhwc(t) for t in batches], nhwc(eval_x),
            extra=[
                ("kernel", kernel),
                ("gamma", jnp.asarray(gamma)),
                ("beta", jnp.asarray(beta)),
            ],
        )
        # batch_stats initialised to (0, 1); override with reference stats
        # by re-running with explicit variables
        variables = layer.init(jax.random.key(0), jnp.asarray(nhwc(batches[0])), ESTIMATE)
        variables = {
            "params": {
                "kernel": kernel, "gamma": jnp.asarray(gamma),
                "beta": jnp.asarray(beta),
            },
            "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        }
        for b in batches:
            _, ups = layer.apply(
                variables, jnp.asarray(nhwc(b)), ESTIMATE,
                mutable=["quant", "quant_est"],
            )
            variables = {**variables, **ups}
        y_ours = np.asarray(layer.apply(variables, jnp.asarray(nhwc(eval_x)), FIXED))
        np.testing.assert_allclose(
            np.transpose(y_ours, (0, 3, 1, 2)), y_ref, rtol=1e-4, atol=1e-5
        )


def test_conv_approx_per_tensor_weights(stack, rng, capsys):
    """Regression: approx conv with per-tensor weight quantization (scalar
    weight bias broadcast over channels) must not crash and must match the
    reference (which broadcasts x_bias/y_bias scalars)."""
    in_ch, out_ch, k = 3, 4, 3
    W = rng.normal(size=(out_ch, in_ch, k, k)).astype(np.float32)
    batches = [rng.normal(size=(1, in_ch, 6, 6)).astype(np.float32)
               for _ in range(2)]
    eval_x = rng.normal(size=(1, in_ch, 6, 6)).astype(np.float32)

    rm = {"approx_flag": False, "quantize_after_mult_and_add": True,
          "res_quantizer_flag": True, "original_quantize_res": True}
    layer = QuantConv(
        qc=_our_qc(rm, per_channel=False), features=out_ch,
        kernel_size=(k, k), strides=(1, 1), padding=[(1, 1), (1, 1)],
        use_bias=False,
    )
    kernel = jnp.asarray(np.transpose(W, (2, 3, 1, 0)))
    nhwc = lambda t: np.transpose(t, (0, 2, 3, 1))
    y = _calibrate_and_eval_ours(
        layer, [nhwc(t) for t in batches], nhwc(eval_x),
        extra=[("kernel", kernel)],
    )
    assert np.all(np.isfinite(y))

    # approx path too (exercises the scalar weight-bias broadcast)
    rm2 = {"approx_flag": True, "quantize_after_mult_and_add": False,
           "res_quantizer_flag": True, "original_quantize_res": True}
    layer2 = QuantConv(
        qc=_our_qc(rm2, per_channel=False,
                   approx=ApproxConfig(with_approx=True, with_comp=True)),
        features=out_ch, kernel_size=(k, k), strides=(1, 1),
        padding=[(1, 1), (1, 1)], use_bias=False,
    )
    y2 = _calibrate_and_eval_ours(
        layer2, [nhwc(t) for t in batches], nhwc(eval_x),
        extra=[("kernel", kernel)],
    )
    assert np.all(np.isfinite(y2))
