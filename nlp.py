#!/usr/bin/env python
"""GLUE / BERT quantized evaluation (~ reference nlp.py — but a real pipeline,
unlike the reference's FP32 one-sentence stub, models/bert_quantized.py:20-28).

Runs BERT-base sequence classification through the framework's
calibrate -> fix -> evaluate pipeline on a GLUE task: TSV data + WordPiece
tokenization from ``--data-dir``/``--vocab-file`` (eval/glue.py), or the
deterministic synthetic task when no dataset is on disk.
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="nlp.py")
    parser.add_argument("--model-dir", type=str, default=None,
                        help="HF BertForSequenceClassification torch checkpoint")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="GLUE task dir containing train.tsv/dev.tsv")
    parser.add_argument("--task", type=str, default="sst-2",
                        help="cola|sst-2|mrpc|sts-b|qqp|mnli|mnli-mm|qnli|rte|wnli")
    parser.add_argument("--vocab-file", type=str, default=None,
                        help="BERT vocab.txt (defaults to <data-dir>/vocab.txt)")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument("--num-est-batches", type=int, default=1)
    parser.add_argument("--max-eval-batches", type=int, default=None)
    parser.add_argument("--seed", type=int, default=10)
    parser.add_argument("--n-bits", type=int, default=8)
    parser.add_argument("--fp8-mantissa-bits", type=int, default=2,
                        help="2 -> E5M2 activations (BASELINE config[3])")
    args = parser.parse_args(argv)

    import os

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
    from fp8_quantization_tpu.eval import glue
    from fp8_quantization_tpu.models.bert import BERT_BASE, QuantizedBert
    from fp8_quantization_tpu.models.porting import (
        merge_ported,
        port_bert,
        torch_state_to_numpy,
    )
    from fp8_quantization_tpu.quant.sites import QuantPhase

    # --- data ---------------------------------------------------------------
    if args.data_dir:
        task = glue.GLUE_TASKS[args.task.lower()]
        vocab_file = args.vocab_file or os.path.join(args.data_dir, "vocab.txt")
        tok = glue.WordPieceTokenizer.from_file(vocab_file)
        dev_examples = glue.load_examples(args.data_dir, task, "dev")
        try:
            calib_examples = glue.load_examples(args.data_dir, task, "train")
        except FileNotFoundError:
            calib_examples = dev_examples
    else:
        task, dev_examples, tok = glue.synthetic_task(
            num_examples=8 * args.batch_size, seed=args.seed
        )
        calib_examples = dev_examples
    num_labels = task.num_labels
    regression = task.labels is None

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

    spec = dataclasses.replace(BERT_BASE, num_classes=num_labels)
    model = QuantizedBert(qc=qc, spec=spec)

    def batches(examples, max_batches=None):
        it = glue.glue_batches(examples, tok, args.batch_size, args.seq_len)
        for i, b in enumerate(it):
            if max_batches is not None and i >= max_batches:
                return
            yield b

    # --- init + port --------------------------------------------------------
    (ids0, mask0, types0), _, _ = next(batches(calib_examples, 1))
    est = QuantPhase(phase="estimate")
    variables = model.init(jax.random.key(args.seed), jnp.asarray(ids0),
                           jnp.asarray(mask0), jnp.asarray(types0), est)
    if args.model_dir:
        import torch

        state = torch_state_to_numpy(
            torch.load(args.model_dir, map_location="cpu", weights_only=True)
        )
        params, _ = port_bert(state, spec.num_layers)
        variables = merge_ported(variables, params, {})

    # --- calibrate (range estimation over train batches) --------------------
    for (ids, mask, types), _, _ in batches(calib_examples,
                                            args.num_est_batches):
        _, ups = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(types), est,
                             mutable=["quant", "quant_est"])
        variables = {**variables, **ups}

    # --- evaluate ------------------------------------------------------------
    qp = QuantPhase(phase="fixed")

    @jax.jit
    def fwd(variables, ids, mask, types):
        return model.apply(variables, ids, mask, types, qp)

    all_preds, all_labels = [], []
    for (ids, mask, types), y, valid in batches(dev_examples,
                                                args.max_eval_batches):
        logits = np.asarray(fwd(variables, jnp.asarray(ids),
                                jnp.asarray(mask), jnp.asarray(types)))
        preds = logits[:, 0] if regression else np.argmax(logits, axis=-1)
        keep = valid > 0
        all_preds.append(preds[keep])
        all_labels.append(y[keep])

    preds = np.concatenate(all_preds)
    labels = np.concatenate(all_labels)
    metrics = glue.compute_glue_metrics(task, preds, labels)
    print(f"task: {task.name} ({len(labels)} examples)")
    print(f"final_metrics: {metrics}")
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
