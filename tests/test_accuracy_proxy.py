"""Accuracy-proxy harness (VERDICT r1 #6): the reference's ONE published
quality number (ViT-B/16 mini-test top-1 = 0.70625,
`/root/reference/approx_output/vit_quantized/E3M4D3/D3_2024-11-06_12-01-22.txt:4`)
is unreproducible without ImageNet + pretrained checkpoints (zero-egress
environment). This gives the "±0.1% at identical widths" claim standing
evidence anyway, in two layers:

1. **Metric-math equality**: our psum-able accumulator metrics
   (``eval/metrics.py``) == the reference's ignite
   ``Accuracy/TopKCategoricalAccuracy/Loss`` conventions
   (`/root/reference/image_net.py:129-135`) on identical logits, including
   uneven batch sizes (ignite's Loss weights batch means by batch size).
2. **Evaluator equality end-to-end**: the reference evaluator loop (ignite
   conventions over the reference's own quantized torch ViT) and our
   ``eval/driver.evaluate`` run the SAME synthetic labelled dataset through
   parity-ported weights and must produce identical top-1/top-5 and
   loss to float tolerance.

One-command recipe for the real number, when data exists (see README):
  python image_net.py validate-quantized --architecture vit_quantized
    --images-dir <imagenet> --mini-test --n-bits 8 --fp8-mantissa-bits 4
    --qmethod fp_quantizer --per-channel --quantize-input
    --weight-quant-method current_minmax --act-quant-method allminmax
    --fp8-set-maxval --no-fp8-mse-include-mantissa-bits
    --res-quantizer-flag --original-quantize-res --batch-size 16 --seed 10
"""

import numpy as np
import pytest

from tests.reference_loader import reference_available

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from fp8_quantization_tpu.eval.metrics import (  # noqa: E402
    MetricState,
    finalize_metrics,
    update_metrics,
)


def ignite_reference_metrics(batches, topk=5):
    """The ignite metric conventions, written out exactly
    (ignite.metrics.Accuracy / TopKCategoricalAccuracy / Loss as configured
    at image_net.py:129-135): per-batch updates, final = weighted totals."""
    correct = 0
    topk_correct = 0
    loss_weighted = 0.0
    n = 0
    criterion = torch.nn.CrossEntropyLoss()
    for logits, labels in batches:
        logits_t = torch.as_tensor(np.asarray(logits, np.float32))
        labels_t = torch.as_tensor(np.asarray(labels, np.int64))
        pred = logits_t.argmax(dim=-1)
        correct += int((pred == labels_t).sum())
        _, tk = logits_t.topk(topk, dim=-1)
        topk_correct += int((tk == labels_t[:, None]).any(dim=-1).sum())
        # ignite Loss: sum(batch_mean * batch_len) / total
        loss_weighted += float(criterion(logits_t, labels_t)) * len(labels_t)
        n += len(labels_t)
    return {
        "top_1_accuracy": correct / n,
        "top_5_accuracy": topk_correct / n,
        "loss": loss_weighted / n,
    }


def test_metric_math_matches_ignite_conventions(rng):
    """Layer 1: identical logits through both accumulators — including
    uneven batch sizes, where a naive mean-of-means diverges."""
    batches = []
    for bs in (4, 7, 3, 8, 1):
        logits = rng.normal(size=(bs, 13)).astype(np.float32) * 3
        labels = rng.integers(0, 13, size=(bs,))
        batches.append((logits, labels))

    ref = ignite_reference_metrics(batches)

    state = MetricState.zero()
    for logits, labels in batches:
        state = update_metrics(state, jnp.asarray(logits),
                               jnp.asarray(labels), k=5)
    ours = finalize_metrics(state)

    assert ours["top_1_accuracy"] == ref["top_1_accuracy"]
    assert ours["top_5_accuracy"] == ref["top_5_accuracy"]
    assert ours["loss"] == pytest.approx(ref["loss"], rel=1e-6)


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_evaluator_equality_on_synthetic_vit(rng):
    """Layer 2: full evaluator-vs-evaluator equality — the reference's own
    quantized ViT under ignite conventions vs our eval driver, same
    synthetic labelled data, parity-ported weights."""
    pytest.importorskip("transformers")
    import jax

    from fp8_quantization_tpu.eval.driver import calibrate, evaluate
    from fp8_quantization_tpu.models.porting import (
        merge_ported, port_vit, torch_state_to_numpy)
    from fp8_quantization_tpu.models.vit import QuantizedViT
    from fp8_quantization_tpu.quant import ESTIMATE
    from tests.test_vit_parity import SPEC, _our_qc, _ref_qparams
    from tests.reference_loader import load_reference_quant_stack
    from transformers import ViTConfig

    stack = load_reference_quant_stack()
    torch.manual_seed(10)
    cfg = ViTConfig(
        hidden_size=SPEC.hidden_size, num_hidden_layers=SPEC.num_layers,
        num_attention_heads=SPEC.num_heads, intermediate_size=SPEC.mlp_dim,
        image_size=SPEC.image_size, patch_size=SPEC.patch_size,
        num_labels=SPEC.num_classes, attn_implementation="eager",
    )
    fp_model = stack.vit_quantized.VisionTransformerForImageClassification(cfg)
    fp_model.eval()
    import transformers.models.vit.modeling_vit as _mv

    for m in fp_model.modules():
        if isinstance(m, _mv.ViTSelfAttention):
            if not hasattr(m, "dropout"):
                m.dropout = torch.nn.Dropout(cfg.attention_probs_dropout_prob)
            if not hasattr(m, "attention_probs_dropout_prob"):
                m.attention_probs_dropout_prob = \
                    cfg.attention_probs_dropout_prob
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

    calib = [rng.normal(size=(2, 3, SPEC.image_size, SPEC.image_size)
                        ).astype(np.float32) for _ in range(2)]
    # the synthetic labelled "mini test": 4 batches x 4 images
    eval_batches = [
        (rng.normal(size=(4, 3, SPEC.image_size, SPEC.image_size)
                    ).astype(np.float32),
         rng.integers(0, SPEC.num_classes, size=(4,)))
        for _ in range(4)
    ]

    # --- reference side: calibrate, fix, ignite-convention eval loop ---
    ref.estimate_ranges()
    ref.quantized()
    ref.eval()
    with torch.no_grad():
        for b in calib:
            ref(torch.from_numpy(b))
    ref.fix_ranges()
    ref_logits = []
    with torch.no_grad():
        for x, y in eval_batches:
            ref_logits.append((ref(torch.from_numpy(x)).numpy(), y))
    ref_metrics = ignite_reference_metrics(ref_logits)

    # --- our side: same data through the eval driver ---
    def nhwc(t):
        return np.transpose(t, (0, 2, 3, 1))

    variables = calibrate(ours, variables, [nhwc(b) for b in calib])
    our_metrics = evaluate(
        ours, variables, [(nhwc(x), y) for x, y in eval_batches])

    assert our_metrics["top_1_accuracy"] == ref_metrics["top_1_accuracy"]
    assert our_metrics["top_5_accuracy"] == ref_metrics["top_5_accuracy"]
    assert our_metrics["loss"] == pytest.approx(ref_metrics["loss"],
                                                rel=2e-3)


def _evaluator_equality(ref, ours, variables, calib, eval_batches, nhwc):
    """Shared layer-2 flow: reference calibrate/fix/ignite-eval vs our
    calibrate + eval driver on identical data (image_net.py:129-181)."""
    from fp8_quantization_tpu.eval.driver import calibrate, evaluate

    ref.estimate_ranges()
    ref.quantized()
    ref.eval()
    with torch.no_grad():
        for b in calib:
            ref(torch.from_numpy(b))
    ref.fix_ranges()
    ref_logits = []
    with torch.no_grad():
        for x, y in eval_batches:
            ref_logits.append((ref(torch.from_numpy(x)).numpy(), y))
    ref_metrics = ignite_reference_metrics(ref_logits)

    variables = calibrate(ours, variables, [nhwc(b) for b in calib])
    our_metrics = evaluate(
        ours, variables, [(nhwc(x), y) for x, y in eval_batches])
    assert our_metrics["top_1_accuracy"] == ref_metrics["top_1_accuracy"]
    assert our_metrics["top_5_accuracy"] == ref_metrics["top_5_accuracy"]
    assert our_metrics["loss"] == pytest.approx(ref_metrics["loss"],
                                                rel=2e-3)


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_evaluator_equality_on_synthetic_mobilenet(rng):
    """MobileNetV2 evaluator-vs-evaluator equality (VERDICT r2 next #6):
    the reference's flagship CNN flow (image_net.py:129-181) vs our eval
    driver, same synthetic labelled mini-test, parity-ported weights.

    One-command real-data recipe (needs ImageNet + mobilenet_v2.pth.tar):
      python image_net.py validate-quantized --architecture
        mobilenet_v2_quantized --images-dir <imagenet> --model-dir
        mobilenet_v2.pth.tar --mini-test [canonical image_net.sh flags]
    """
    from tests.test_mobilenet_parity import (  # noqa: F401
        _nhwc, _our_qc, models_and_data, stack)

    stack_ = load_stack_mobilenet()
    ref, ours, variables, calib, _ = build_mobilenet(stack_, rng)
    eval_batches = [
        (rng.normal(size=(4, 3, 96, 96)).astype(np.float32),
         rng.integers(0, 17, size=(4,)))
        for _ in range(4)
    ]
    _evaluator_equality(ref, ours, variables, calib, eval_batches,
                        lambda t: np.transpose(t, (0, 2, 3, 1)))


def load_stack_mobilenet():
    from tests.reference_loader import load_reference_quant_stack

    return load_reference_quant_stack()


def build_mobilenet(stack, rng):
    import jax

    from fp8_quantization_tpu.models.mobilenet_v2 import QuantizedMobileNetV2
    from fp8_quantization_tpu.models.porting import (
        merge_ported, port_mobilenet_v2, torch_state_to_numpy)
    from fp8_quantization_tpu.quant import ESTIMATE
    from tests.test_mobilenet_parity import _our_qc, _ref_qparams

    size = 96
    torch.manual_seed(10)
    fp_model = stack.mobilenet_v2.MobileNetV2(input_size=size, n_class=17)
    fp_state = torch_state_to_numpy(fp_model.state_dict())
    ref = stack.mobilenet_v2_quantized.QuantizedMobileNetV2(
        fp_model, input_size=(1, 3, size, size), quant_setup="all",
        **_ref_qparams(stack))
    ours = QuantizedMobileNetV2(qc=_our_qc(), num_classes=17,
                                input_size=size)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = ours.init(jax.random.key(0), x0, ESTIMATE)
    params, batch_stats = port_mobilenet_v2(fp_state)
    variables = merge_ported(variables, params, batch_stats)
    calib = [rng.normal(size=(2, 3, size, size)).astype(np.float32)
             for _ in range(2)]
    return ref, ours, variables, calib, size


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_evaluator_equality_on_synthetic_resnet18(rng):
    """ResNet18 evaluator-vs-evaluator equality (VERDICT r2 next #6).

    One-command real-data recipe (torchvision weights download offline-
    blocked here; with a checkpoint):
      python image_net.py validate-quantized --architecture resnet18_quantized
        --images-dir <imagenet> --model-dir resnet18.pth --mini-test
        [canonical image_net.sh flags]
    """
    from tests.test_resnet_parity import _build, _our_qc  # noqa: F401
    from tests.reference_loader import load_reference_quant_stack

    stack = load_reference_quant_stack()
    ref, ours, variables, calib, _ = _build(stack, 18)
    eval_batches = [
        (rng.normal(size=(4, 3, 64, 64)).astype(np.float32),
         rng.integers(0, 17, size=(4,)))
        for _ in range(4)
    ]
    _evaluator_equality(ref, ours, variables, calib, eval_batches,
                        lambda t: np.transpose(t, (0, 2, 3, 1)))


def test_glue_metric_equality_vs_sklearn(rng):
    """BERT/GLUE metric-equality proxy (VERDICT r2 next #6): our
    self-contained GLUE metrics == the official implementations
    (sklearn/scipy — what the GLUE benchmark scripts use) on random
    predictions, for every metric family the nine tasks reference."""
    sk = pytest.importorskip("sklearn.metrics")
    sp = pytest.importorskip("scipy.stats")

    from fp8_quantization_tpu.eval.glue import (
        accuracy_score, f1_score, matthews_corrcoef, pearson_corr,
        spearman_corr)

    preds = rng.integers(0, 2, size=(257,))
    labels = rng.integers(0, 2, size=(257,))
    assert accuracy_score(preds, labels) == pytest.approx(
        sk.accuracy_score(labels, preds))
    assert f1_score(preds, labels) == pytest.approx(
        sk.f1_score(labels, preds))
    assert matthews_corrcoef(preds, labels) == pytest.approx(
        sk.matthews_corrcoef(labels, preds))

    x = rng.normal(size=(257,))
    y = 0.3 * x + rng.normal(size=(257,))
    assert pearson_corr(x, y) == pytest.approx(sp.pearsonr(x, y)[0])
    assert spearman_corr(x, y) == pytest.approx(sp.spearmanr(x, y)[0])


def test_glue_evaluator_equality_synthetic(rng):
    """GLUE evaluator equality: our jitted GLUE eval loop's metrics on a
    synthetic task == the same predictions scored by sklearn."""
    sk = pytest.importorskip("sklearn.metrics")

    from fp8_quantization_tpu.eval.glue import (
        GLUE_TASKS, compute_glue_metrics)

    task = GLUE_TASKS["mrpc"]
    preds = rng.integers(0, 2, size=(64,))
    labels = rng.integers(0, 2, size=(64,))
    ours = compute_glue_metrics(task, preds, labels)
    assert ours["accuracy"] == pytest.approx(
        sk.accuracy_score(labels, preds))
    assert ours["f1"] == pytest.approx(sk.f1_score(labels, preds))
