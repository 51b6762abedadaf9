#!/usr/bin/env python
"""BERT-base quantized end-to-end inference throughput on TPU (GLUE shapes).

VERDICT r3 next #4: BERT is the family the reference stubs
(`/root/reference/nlp.py:1-3`, `models/bert_quantized.py:20-28` — loads HF
bert-base and runs ONE unquantized sentence) and this framework implements
properly — this bench gives it the same artifact-backed TPU speed rows as
the other three families. Modes are timed INTERLEAVED with auto-deepened
slope chains (scripts/_harness.py) at a GLUE-realistic batch x seq = 32x128:

  FP8 family:  fp32 / fixed (reference-faithful sim) / fast (bf16)
  INT8 family (reference-default run_method — plain PTQ, no res-FQ):
               int8 (native int8 MXU matmuls) / chained (+ int8 codes
               between dense layers)

Run: python scripts/bench_bert.py [--batch-size 32] [--seq-len 128]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _harness import emit_artifact, interleaved_slopes, ratio

FP8_MODES = ("fp32", "fixed", "fast")
INT8_MODES = ("int8", "chained")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--modes", type=str, default="")
    p.add_argument("--artifact", type=str, default="bert_modes")
    args = p.parse_args(argv)
    want = set(args.modes.split(",")) if args.modes else set(
        FP8_MODES + INT8_MODES)

    from fp8_quantization_tpu.config import (
        EstimatorConfig, FP8Config, QMethod, QuantConfig, RangeMethod,
        RunMethodConfig,
    )
    from fp8_quantization_tpu.models.bert import BERT_BASE, QuantizedBert
    from fp8_quantization_tpu.ops.fastpath import (
        pack_dense_caches, strip_packed_params)
    from fp8_quantization_tpu.quant import ESTIMATE, QuantPhase

    spec = BERT_BASE
    rng = np.random.default_rng(10)
    b, t = args.batch_size, args.seq_len
    ids_np = rng.integers(0, spec.vocab_size, size=(b, t)).astype(np.int32)
    mask_np = np.ones((b, t), np.int32)
    # realistic ragged batch: second half of sequences are shorter
    for i in range(b // 2, b):
        mask_np[i, int(t * 0.6):] = 0
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)
    # calibration/caching/packing on the local CPU backend (estimate graphs
    # compile for tens of minutes over the tunnel; ranges are
    # correctness-only for a throughput bench — tests/test_calib_twin.py)
    cpu = jax.local_devices(backend="cpu")[0]

    def setup(qc):
        model = QuantizedBert(qc=qc, spec=spec)
        with jax.default_device(cpu):
            ic, mc = jnp.asarray(ids_np[:2]), jnp.asarray(mask_np[:2])
            variables = model.init(jax.random.key(0), ic[:1], mc[:1], None,
                                   ESTIMATE)
            _, ups = model.apply(variables, ic, mc, None, ESTIMATE,
                                 mutable=["quant", "quant_est"])
            return model, {**variables, **ups}, ic, mc

    modes = {}
    if want & set(FP8_MODES):
        qc8 = QuantConfig(
            method=QMethod.fp_quantizer,
            per_channel_weights=True,
            quantize_input=True,
            weight_range=EstimatorConfig(RangeMethod.current_minmax),
            act_range=EstimatorConfig(RangeMethod.allminmax),
            fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
            run_method=RunMethodConfig(res_quantizer_flag=True,
                                       original_quantize_res=True),
        )
        print("init + calibrate (fp8, CPU backend)...", flush=True)
        model8, vars8, ic, mc = setup(qc8)

        def cache(model, v, fast):
            with jax.default_device(cpu):
                warm = QuantPhase(phase="fixed", fast=fast,
                                  cache_weights=True)
                _, ups = model.apply(v, ic, mc, None, warm,
                                     mutable=["quant_cache"])
                return {**v, **ups}

        fast_vars = cache(model8, vars8, True)
        modes["fp32"] = (model8, vars8,
                         QuantPhase(phase="fixed", quant_w=False,
                                    quant_a=False))
        modes["fixed"] = (model8, vars8, QuantPhase(phase="fixed"))
        modes["fast"] = (model8, fast_vars,
                         QuantPhase(phase="fixed", fast=True))

    if want & set(INT8_MODES):
        # reference-default run_method (click_options.py:483-486): plain
        # PTQ does not fake-quantize dense results
        qci = QuantConfig(
            method=QMethod.symmetric_uniform,
            per_channel_weights=True,
            quantize_input=True,
            weight_range=EstimatorConfig(RangeMethod.current_minmax),
            act_range=EstimatorConfig(RangeMethod.allminmax),
            run_method=RunMethodConfig(),
        )
        print("init + calibrate (int8, CPU backend)...", flush=True)
        modeli, varsi, ic, mc = setup(qci)
        with jax.default_device(cpu):
            warm = QuantPhase(phase="fixed", cache_weights=True)
            _, ups = modeli.apply(varsi, ic, mc, None, warm,
                                  mutable=["quant_cache"])
            i8_vars, report = pack_dense_caches({**varsi, **ups}, qci)
            i8_vars = strip_packed_params(i8_vars)
        print(f"int8-packed {len(report)} dense layers", flush=True)
        modes["int8"] = (modeli, i8_vars,
                         QuantPhase(phase="fixed", fast=True, packed=True))
        modes["chained"] = (modeli, i8_vars,
                            QuantPhase(phase="fixed", fast=True, packed=True,
                                       chained=True))

    modes = {k: v for k, v in modes.items() if k in want}

    dev = jax.devices()[0]
    if dev.platform != "cpu":
        print("transferring variables to device...", flush=True)
        modes = {k: (m, jax.device_put(v, dev), qp)
                 for k, (m, v, qp) in modes.items()}
        jax.block_until_ready([v for _, v, _ in modes.values()])

    def builder(model, vs, qp):
        def build(n):
            @jax.jit
            def f(variables, ids, mask):
                def body(i, carry):
                    # rotate the batch by the loop index so the apply is not
                    # loop-invariant (ids are ints — the 1e-30-nudge trick of
                    # the image benches can't carry the dependency here)
                    idr = jnp.roll(ids, i, axis=0)
                    mr = jnp.roll(mask, i, axis=0)
                    logits = model.apply(variables, idr, mr, None, qp)
                    return carry + jnp.mean(logits).astype(jnp.float32)
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            return f
        return build

    builders = {name: builder(*spec_) for name, spec_ in modes.items()}
    args_for = {name: (modes[name][1], ids, mask) for name in modes}
    results = interleaved_slopes(builders, args_for, depths=(2, 6),
                                 trials=args.trials, max_n1=96)

    payload = {"metric": "bert_e2e", "batch_size": b, "seq_len": t,
               "unit": "ms/batch", "modes": {}}
    for name, r in results.items():
        per = r["per_iter"]
        payload["modes"][name] = {
            "ms_per_batch": round(per * 1e3, 3) if per else None,
            "seqs_per_sec": round(b / per, 1) if per else None,
            "floor_ok": r["floor_ok"],
            "depths": r["depths"],
        }
        print(f"{name:8s}: {(per * 1e3 if per else float('nan')):8.2f} "
              f"ms/batch", flush=True)
    for num, den, label in [
        ("fp32", "fast", "fast_vs_fp32"),
        ("fixed", "fast", "fast_vs_fixed"),
        ("fast", "int8", "int8_vs_fast"),
        ("fast", "chained", "chained_vs_fast"),
        ("int8", "chained", "chained_vs_int8"),
    ]:
        med, spread = ratio(results, num, den)
        if med is not None:
            payload[label] = round(med, 4)
            payload[label + "_spread"] = [round(spread[0], 4),
                                          round(spread[1], 4)]
            print(f"{label}: {med:.3f}x (spread {spread[0]:.3f}-"
                  f"{spread[1]:.3f})", flush=True)

    emit_artifact(args.artifact, payload)


if __name__ == "__main__":
    main(sys.argv[1:])
