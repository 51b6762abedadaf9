"""End-to-end ViT parity: our flax quantized ViT vs the reference shims
wrapping real HF torch modules, random weights, calibrate -> fix -> eval."""

import numpy as np
import pytest

from tests.reference_loader import load_reference_quant_stack, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fp8_quantization_tpu.config import (  # noqa: E402
    EstimatorConfig,
    FP8Config,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.models.porting import (  # noqa: E402
    merge_ported,
    port_vit,
    torch_state_to_numpy,
)
from fp8_quantization_tpu.models.vit import QuantizedViT, ViTSpec  # noqa: E402
from fp8_quantization_tpu.quant import ESTIMATE, FIXED, FP32  # noqa: E402

RM = {"approx_flag": False, "quantize_after_mult_and_add": False,
      "res_quantizer_flag": True, "original_quantize_res": True}

SPEC = ViTSpec(hidden_size=48, num_layers=2, num_heads=4, mlp_dim=96,
               patch_size=16, image_size=64, num_classes=11)


def _ref_qparams(stack):
    re = stack.range_estimators
    return dict(
        method=stack.fp8_quantizer.FPQuantizer,
        act_method=stack.fp8_quantizer.FPQuantizer,
        n_bits=8, n_bits_act=8,
        per_channel_weights=True,
        percentile=None,
        weight_range_method=re.CurrentMinMaxEstimator,
        weight_range_options=dict(percentile=None),
        act_range_method=re.AllMinMaxEstimator,
        act_range_options={},
        scale_domain="linear",
        quantize_input=True,
        fp8_kwargs=dict(maxval=None, mantissa_bits=4, set_maxval=True,
                        learn_maxval=False, learn_mantissa_bits=False,
                        mse_include_mantissa_bits=False, allow_unsigned=False),
        run_method=dict(RM),
        custom_approx_params={
            "expo_width": 3, "mant_width": 4, "dnsmp_factor": 3,
            "withComp": False, "with_approx": False, "with_s2nn2s_opt": False,
            "sim_hw_add_OFUF": False, "with_OF_opt": False,
            "with_UF_opt": False, "golden_clip_OF": False,
            "quant_btw_mult_accu": True, "debug_mode": False,
            "self_check_mode": False,
        },
    )


def _our_qc():
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False,
                      mantissa_bits=4),
        run_method=RunMethodConfig(**RM),
    )


@pytest.fixture(scope="module")
def models_and_data(stack_mod):
    stack = stack_mod
    from transformers import ViTConfig

    torch.manual_seed(10)
    cfg = ViTConfig(
        hidden_size=SPEC.hidden_size,
        num_hidden_layers=SPEC.num_layers,
        num_attention_heads=SPEC.num_heads,
        intermediate_size=SPEC.mlp_dim,
        image_size=SPEC.image_size,
        patch_size=SPEC.patch_size,
        num_labels=SPEC.num_classes,
        attn_implementation="eager",
    )
    fp_model = stack.vit_quantized.VisionTransformerForImageClassification(cfg)
    fp_model.eval()
    # newer transformers moved attention dropout to functional form; the
    # reference shim copies these attributes off the module
    import transformers.models.vit.modeling_vit as _mv

    for m in fp_model.modules():
        if isinstance(m, _mv.ViTSelfAttention):
            if not hasattr(m, "dropout"):
                m.dropout = torch.nn.Dropout(cfg.attention_probs_dropout_prob)
            if not hasattr(m, "attention_probs_dropout_prob"):
                m.attention_probs_dropout_prob = cfg.attention_probs_dropout_prob
    fp_state = torch_state_to_numpy(fp_model.state_dict())

    ref = stack.vit_quantized.QuantizedVisionTransformerForImageClassification(
        fp_model, input_size=(1, 3, SPEC.image_size, SPEC.image_size),
        quant_setup="all", **_ref_qparams(stack),
    )

    ours = QuantizedViT(qc=_our_qc(), spec=SPEC)
    x0 = jnp.zeros((1, SPEC.image_size, SPEC.image_size, 3), jnp.float32)
    variables = ours.init(jax.random.key(0), x0, ESTIMATE)
    params, _ = port_vit(fp_state, num_layers=SPEC.num_layers)
    variables = merge_ported(variables, params, {})

    rng = np.random.default_rng(10)
    batches = [
        rng.normal(size=(2, 3, SPEC.image_size, SPEC.image_size)).astype(np.float32)
        for _ in range(2)
    ]
    eval_x = rng.normal(size=(2, 3, SPEC.image_size, SPEC.image_size)).astype(
        np.float32
    )
    return ref, ours, variables, batches, eval_x


@pytest.fixture(scope="module")
def stack_mod():
    return load_reference_quant_stack()


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


class TestViTParity:
    def test_fp32_forward_parity(self, models_and_data):
        ref, ours, variables, _, eval_x = models_and_data
        ref.full_precision()
        ref.eval()
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(eval_x)).numpy()
        y_ours = np.asarray(ours.apply(variables, jnp.asarray(_nhwc(eval_x)), FP32))
        np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=1e-4)

    def test_quantized_e2e_parity(self, models_and_data):
        ref, ours, variables, batches, eval_x = models_and_data

        ref.estimate_ranges()
        ref.quantized()
        ref.eval()
        with torch.no_grad():
            for b in batches:
                ref(torch.from_numpy(b))
        ref.fix_ranges()
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(eval_x)).numpy()

        for b in batches:
            _, ups = ours.apply(
                variables, jnp.asarray(_nhwc(b)), ESTIMATE,
                mutable=["quant", "quant_est"],
            )
            variables = {**variables, **ups}
        y_ours = np.asarray(ours.apply(variables, jnp.asarray(_nhwc(eval_x)), FIXED))

        np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=2e-3)
        np.testing.assert_array_equal(
            np.argmax(y_ours, axis=-1), np.argmax(y_ref, axis=-1)
        )
