"""Quantized BERT tests: FP32 parity vs HF torch BERT + quantized pipeline."""

import numpy as np
import pytest

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
from fp8_quantization_tpu.models.bert import BertSpec, QuantizedBert  # noqa: E402
from fp8_quantization_tpu.models.porting import (  # noqa: E402
    merge_ported,
    port_bert,
    torch_state_to_numpy,
)
from fp8_quantization_tpu.quant import ESTIMATE, FIXED, FP32  # noqa: E402

SPEC = BertSpec(vocab_size=120, hidden_size=48, num_layers=2, num_heads=4,
                mlp_dim=96, max_position_embeddings=64, num_classes=3)


def _qc(e5m2=False):
    return QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False,
                      mantissa_bits=2 if e5m2 else 4),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import BertConfig, BertForSequenceClassification

    torch.manual_seed(10)
    cfg = BertConfig(
        vocab_size=SPEC.vocab_size,
        hidden_size=SPEC.hidden_size,
        num_hidden_layers=SPEC.num_layers,
        num_attention_heads=SPEC.num_heads,
        intermediate_size=SPEC.mlp_dim,
        max_position_embeddings=SPEC.max_position_embeddings,
        num_labels=SPEC.num_classes,
        attn_implementation="eager",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = BertForSequenceClassification(cfg)
    hf.eval()

    ours = QuantizedBert(qc=_qc(), spec=SPEC)
    rng = np.random.default_rng(10)
    ids = rng.integers(0, SPEC.vocab_size, size=(2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0
    variables = ours.init(jax.random.key(0), jnp.asarray(ids),
                          jnp.asarray(mask), None, ESTIMATE)
    params, _ = port_bert(torch_state_to_numpy(hf.state_dict()),
                          num_layers=SPEC.num_layers)
    variables = merge_ported(variables, params, {})
    return hf, ours, variables, ids, mask


def test_fp32_parity_vs_hf(hf_and_ours):
    hf, ours, variables, ids, mask = hf_and_ours
    with torch.no_grad():
        y_ref = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).logits.numpy()
    y_ours = np.asarray(
        ours.apply(variables, jnp.asarray(ids), jnp.asarray(mask), None, FP32)
    )
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-5)


def test_quantized_pipeline(hf_and_ours, rng):
    _, ours, variables, ids, mask = hf_and_ours
    for _ in range(2):
        _, ups = ours.apply(
            variables, jnp.asarray(ids), jnp.asarray(mask), None, ESTIMATE,
            mutable=["quant", "quant_est"],
        )
        variables = {**variables, **ups}
    y1 = ours.apply(variables, jnp.asarray(ids), jnp.asarray(mask), None, FIXED)
    y2 = ours.apply(variables, jnp.asarray(ids), jnp.asarray(mask), None, FIXED)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y_fp = ours.apply(variables, jnp.asarray(ids), jnp.asarray(mask), None, FP32)
    corr = np.corrcoef(np.asarray(y1).ravel(), np.asarray(y_fp).ravel())[0, 1]
    assert corr > 0.9, corr


def test_e5m2_config_runs(hf_and_ours):
    """BASELINE config[3]: E5M2 activations (mantissa_bits=2)."""
    _, _, _, ids, mask = hf_and_ours
    model = QuantizedBert(qc=_qc(e5m2=True), spec=SPEC)
    variables = model.init(jax.random.key(0), jnp.asarray(ids),
                           jnp.asarray(mask), None, ESTIMATE)
    _, ups = model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask), None, ESTIMATE,
        mutable=["quant", "quant_est"],
    )
    out = model.apply({**variables, **ups}, jnp.asarray(ids),
                      jnp.asarray(mask), None, FIXED)
    assert out.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(out)))
