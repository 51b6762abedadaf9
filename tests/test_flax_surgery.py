"""quantize_flax_model tests: interception parity vs the hand-built quant
layers, FP32 passthrough, filtering, specials, approx path, weight cache."""

import flax.linen as nn
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
from fp8_quantization_tpu.models.flax_surgery import quantize_flax_model
from fp8_quantization_tpu.ops.layers import QuantConv, QuantDense, QuantLayerNorm
from fp8_quantization_tpu.quant.sites import ESTIMATE, FIXED, FP32, QuantPhase


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


class ForeignMLP(nn.Module):
    """A foreign model that knows nothing about quantization."""

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(16, name="fc1")(x)
        x = nn.relu(x)
        x = nn.LayerNorm(name="ln")(x)
        return nn.Dense(4, name="head")(x)


def _calibrate(model, x, *extra):
    variables = model.init(jax.random.key(0), x, *extra, qp=ESTIMATE)
    _, ups = model.apply(variables, x, *extra, qp=ESTIMATE,
                         mutable=["quant", "quant_est"])
    return {**variables, **ups}


def test_quant_collections_appear_under_module_paths(rng):
    qc = _qc()
    model = quantize_flax_model(ForeignMLP(), qc)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    variables = _calibrate(model, x)
    q = variables["quant"]["model"]
    assert set(q) == {"fc1", "ln", "head"}
    for layer in ("fc1", "head"):
        assert "activation_quantizer" in q[layer]
        assert "weight_quantizer" in q[layer]
        assert "res_quantizer" in q[layer]
    # per-channel weight quant: fc1 kernel (8,16) -> 16 channel maxvals
    assert q["fc1"]["weight_quantizer"]["q"]["maxval"].shape == (16,)


def test_fp32_phase_matches_plain_model(rng):
    """With quantization off, the intercepted model must equal the foreign
    model bit-for-bit (protocol reduces to the plain op)."""
    qc = _qc()
    model = quantize_flax_model(ForeignMLP(), qc)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    variables = _calibrate(model, x)

    plain = ForeignMLP()
    out_plain = plain.apply({"params": variables["params"]["model"]}, x)
    out_fp32 = model.apply(variables, x, qp=FP32)
    np.testing.assert_array_equal(np.asarray(out_fp32), np.asarray(out_plain))


@pytest.mark.parametrize("quantize_input", [True, False])
def test_dense_parity_vs_quantdense(rng, quantize_input):
    """One intercepted nn.Dense == ops.layers.QuantDense with the same
    weights and config, in both quant positions."""
    qc = _qc(quantize_input=quantize_input,
             run_method=RunMethodConfig(res_quantizer_flag=quantize_input,
                                        original_quantize_res=quantize_input))
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)

    foreign = quantize_flax_model(nn.Dense(16), qc)
    vf = _calibrate(foreign, x)

    ours = QuantDense(qc=qc, features=16)
    vo = ours.init(jax.random.key(0), x, ESTIMATE)
    vo = {
        "params": vf["params"]["model"],
        "quant": vf["quant"]["model"],
        "quant_est": vf["quant_est"]["model"],
    }
    # re-calibrate ours from the shared weights so estimator state matches
    _, ups = ours.apply(vo, x, ESTIMATE, mutable=["quant", "quant_est"])
    vo = {**vo, **ups}

    out_f = foreign.apply(vf, x, qp=FIXED)
    out_o = ours.apply(vo, x, FIXED)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_o))


def test_conv_parity_vs_quantconv(rng):
    qc = _qc()
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)

    foreign = quantize_flax_model(
        nn.Conv(8, kernel_size=(3, 3), strides=(2, 2), padding="SAME"), qc)
    vf = _calibrate(foreign, x)

    ours = QuantConv(qc=qc, features=8, kernel_size=(3, 3), strides=(2, 2),
                     padding="SAME")
    vo = {
        "params": vf["params"]["model"],
        "quant": vf["quant"]["model"],
        "quant_est": vf["quant_est"]["model"],
    }
    _, ups = ours.apply(vo, x, ESTIMATE, mutable=["quant", "quant_est"])
    vo = {**vo, **ups}

    out_f = foreign.apply(vf, x, qp=FIXED)
    out_o = ours.apply(vo, x, FIXED)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_o))


def test_layernorm_parity_vs_quantlayernorm(rng):
    qc = _qc()
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    # use_fast_variance=False: QuantLayerNorm computes jnp.var directly; the
    # interceptor mirrors whichever statistics the foreign module declares
    foreign = quantize_flax_model(nn.LayerNorm(use_fast_variance=False), qc)
    vf = _calibrate(foreign, x)

    ours = QuantLayerNorm(qc=qc, epsilon=1e-6)
    vo = {
        "params": vf["params"]["model"],
        "quant": vf["quant"]["model"],
        "quant_est": vf["quant_est"]["model"],
    }
    _, ups = ours.apply(vo, x, ESTIMATE, mutable=["quant", "quant_est"])
    vo = {**vo, **ups}
    out_f = foreign.apply(vf, x, qp=FIXED)
    out_o = ours.apply(vo, x, FIXED)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_o))


def test_filter_fn_skips_layers(rng):
    """FP_logits-style setup: the head stays unquantized."""
    qc = _qc()
    model = quantize_flax_model(
        ForeignMLP(), qc, filter_fn=lambda path, mod: "head" not in path)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    variables = _calibrate(model, x)
    assert "head" not in variables["quant"]["model"]
    assert "fc1" in variables["quant"]["model"]
    model.apply(variables, x, qp=FIXED)  # still runs


def test_specials_override(rng):
    """A custom handler replaces the default Dense interception."""
    qc = _qc()
    calls = []

    def spy_dense(qc_, mod, x, qp):
        calls.append(mod.name)
        kernel = mod.param("kernel", mod.kernel_init,
                           (x.shape[-1], mod.features), mod.param_dtype)
        y = x @ kernel
        if mod.use_bias:
            y = y + mod.param("bias", mod.bias_init, (mod.features,),
                              mod.param_dtype)
        return y

    model = quantize_flax_model(ForeignMLP(), qc,
                                specials={nn.Dense: spy_dense})
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    variables = model.init(jax.random.key(0), x, qp=ESTIMATE)
    assert calls  # the special ran instead of the quantized protocol
    assert "fc1" not in variables.get("quant", {}).get("model", {})


def test_approx_path_parity(rng):
    """Intercepted dense under approx_flag == QuantDense under approx_flag."""
    qc = _qc(run_method=RunMethodConfig(res_quantizer_flag=True,
                                        approx_flag=True),
             approx=ApproxConfig(expo_width=3, mant_width=4, with_approx=True,
                                 with_comp=True))
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    foreign = quantize_flax_model(nn.Dense(8), qc)
    vf = _calibrate(foreign, x)
    ours = QuantDense(qc=qc, features=8)
    vo = {
        "params": vf["params"]["model"],
        "quant": vf["quant"]["model"],
        "quant_est": vf["quant_est"]["model"],
    }
    _, ups = ours.apply(vo, x, ESTIMATE, mutable=["quant", "quant_est"])
    vo = {**vo, **ups}
    out_f = foreign.apply(vf, x, qp=FIXED)
    out_o = ours.apply(vo, x, FIXED)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_o))


def test_weight_cache_roundtrip(rng):
    """cache_weights populates quant_cache; fixed phase uses it."""
    qc = _qc()
    model = quantize_flax_model(ForeignMLP(), qc)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    variables = _calibrate(model, x)

    cache_qp = QuantPhase(phase="fixed", cache_weights=True)
    out_ref, ups = model.apply(variables, x, qp=cache_qp,
                               mutable=["quant_cache"])
    variables = {**variables, **ups}
    assert "quant_cache" in variables
    assert "w_q" in variables["quant_cache"]["model"]["fc1"]
    out_cached = model.apply(variables, x, qp=FIXED)
    np.testing.assert_array_equal(np.asarray(out_cached), np.asarray(out_ref))
