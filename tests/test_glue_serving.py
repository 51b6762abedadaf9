"""GLUE evaluation under the int8 SERVING modes (round 4).

The accuracy proxies pin the FP8 simulation's evaluator against the
reference flow; this pins the serving modes at the EVAL level: on the
synthetic GLUE task, the int8-MXU (PACKED) and chained serving predictions
must match the bf16 FAST simulation's predictions sample-for-sample on a
calibrated tiny BERT (exact int32 accumulation only sharpens the logits;
at eval scale any systematic divergence would show as prediction flips).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fp8_quantization_tpu.config import (
    EstimatorConfig,
    QMethod,
    QuantConfig,
    RangeMethod,
    RunMethodConfig,
)
from fp8_quantization_tpu.eval import glue
from fp8_quantization_tpu.models.bert import BertSpec, QuantizedBert
from fp8_quantization_tpu.ops.fastpath import (
    pack_dense_caches,
    strip_packed_params,
)
from fp8_quantization_tpu.quant import ESTIMATE, QuantPhase
from fp8_quantization_tpu.quant.sites import FAST


def _qc():
    return QuantConfig(
        method=QMethod.symmetric_uniform,
        per_channel_weights=True,
        quantize_input=True,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        run_method=RunMethodConfig(),  # reference defaults (plain PTQ)
    )


def _predict(model, variables, batches, qp):
    preds = []
    fn = jax.jit(lambda v, i, m, t: model.apply(v, i, m, t, qp))
    for (ids, mask, types), _labels, valid in batches:
        logits = fn(variables, jnp.asarray(ids), jnp.asarray(mask),
                    jnp.asarray(types))
        keep = valid > 0
        preds.append(np.asarray(logits).argmax(-1)[keep])
    return np.concatenate(preds)


def test_glue_serving_predictions_match_fast():
    task, examples, tok = glue.synthetic_task(num_examples=48)
    spec = BertSpec(vocab_size=len(tok.vocab), hidden_size=32, num_layers=2,
                    num_heads=4, mlp_dim=64, max_position_embeddings=32,
                    num_classes=task.num_labels)
    qc = _qc()
    model = QuantizedBert(qc=qc, spec=spec)

    batches = list(glue.glue_batches(examples, tok, batch_size=8,
                                     max_len=32))
    (ids0, mask0, types0), _, _ = batches[0]
    v = model.init(jax.random.key(0), jnp.asarray(ids0[:1]),
                   jnp.asarray(mask0[:1]), jnp.asarray(types0[:1]), ESTIMATE)
    _, ups = model.apply(v, jnp.asarray(ids0), jnp.asarray(mask0),
                         jnp.asarray(types0), ESTIMATE,
                         mutable=["quant", "quant_est"])
    v = {**v, **ups}
    warm = QuantPhase(phase="fixed", fast=True, cache_weights=True)
    _, ups = model.apply(v, jnp.asarray(ids0), jnp.asarray(mask0),
                         jnp.asarray(types0), warm, mutable=["quant_cache"])
    vp, report = pack_dense_caches({**v, **ups}, qc)
    assert report
    vp = strip_packed_params(vp)

    fast_preds = _predict(model, {**v, **ups}, batches, FAST)
    for phase in (QuantPhase(phase="fixed", fast=True, packed=True),
                  QuantPhase(phase="fixed", fast=True, packed=True,
                             chained=True)):
        serve_preds = _predict(model, vp, batches, phase)
        agree = (serve_preds == fast_preds).mean()
        assert agree >= 0.95, (phase, agree)

    labels = np.asarray([ex.label for ex in examples])
    m = glue.compute_glue_metrics(task, fast_preds, labels[:len(fast_preds)])
    assert 0.0 <= m["accuracy"] <= 1.0
