#!/usr/bin/env python
"""ViT-B/16 quantized end-to-end inference throughput on TPU.

Measures imgs/sec of the flagship quantized model in three modes:
  * fp32   — quantization off (plain f32 model)
  * fixed  — FP8 E3M4 PTQ simulation, f32 matmuls (reference-faithful)
  * fast   — same quantized semantics on the bf16 MXU path (exact for
             FP8-grid operands)

Timing uses dependency-chained fori_loop + scalar readback with slope
extraction (see bench.py for why).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--depths", type=int, nargs=2, default=(2, 6))
    p.add_argument("--int8", action="store_true",
                   help="uniform symmetric INT8 config on the native int8 "
                        "MXU (qp.packed) instead of the FP8 modes")
    p.add_argument("--no-fused", action="store_true",
                   help="disable the fused Pallas SDPA branch (A/B)")
    args = p.parse_args(argv)

    if args.no_fused:
        from fp8_quantization_tpu.ops.pallas import attention
        attention.DISABLE_FUSED = True

    from fp8_quantization_tpu.config import (
        EstimatorConfig,
        FP8Config,
        QMethod,
        QuantConfig,
        RangeMethod,
        RunMethodConfig,
    )
    from fp8_quantization_tpu.models.vit import QuantizedViT
    from fp8_quantization_tpu.quant import ESTIMATE, QuantPhase

    if args.int8:
        qc = QuantConfig(
            method=QMethod.symmetric_uniform,
            per_channel_weights=True,
            quantize_input=True,
            weight_range=EstimatorConfig(RangeMethod.current_minmax),
            act_range=EstimatorConfig(RangeMethod.allminmax),
            run_method=RunMethodConfig(),
        )
    else:
        qc = QuantConfig(
            method=QMethod.fp_quantizer,
            per_channel_weights=True,
            quantize_input=True,
            weight_range=EstimatorConfig(RangeMethod.current_minmax),
            act_range=EstimatorConfig(RangeMethod.allminmax),
            fp8=FP8Config(set_maxval=True, mse_include_mantissa_bits=False),
            run_method=RunMethodConfig(res_quantizer_flag=True,
                                       original_quantize_res=True),
        )
    model = QuantizedViT(qc=qc)
    rng = np.random.default_rng(10)
    b = args.batch_size
    x = jnp.asarray(rng.normal(size=(b, 224, 224, 3)).astype(np.float32))

    print("init + calibrate...", flush=True)
    variables = model.init(jax.random.key(0), x[:1], ESTIMATE)
    _, ups = model.apply(variables, x[:2], ESTIMATE,
                         mutable=["quant", "quant_est"])
    variables = {**variables, **ups}
    from fp8_quantization_tpu.eval import cache_quantized_weights

    cached_vars = cache_quantized_weights(model, variables, x[:2])
    fast_vars = cache_quantized_weights(model, variables, x[:2], fast=True)

    def chained(qp):
        def build(n):
            @jax.jit
            def f(variables, x):
                def body(_, acc):
                    logits = model.apply(variables, acc, qp)
                    # data dependency without changing values materially
                    return acc + 1e-30 * jnp.mean(logits)
                return lax.fori_loop(0, n, body, x).sum()
            return f
        return build

    def slope(build, vs):
        ts = {}
        for n in args.depths:
            f = build(n)
            t0 = time.time()
            float(f(vs, x))
            print(f"  compile+run n={n}: {time.time() - t0:.1f}s", flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(vs, x))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        n0, n1 = args.depths
        return (ts[n1] - ts[n0]) / (n1 - n0)

    modes = [
        ("fp32", QuantPhase(phase="fixed", quant_w=False, quant_a=False),
         variables),
        ("fixed", QuantPhase(phase="fixed"), variables),
        ("cached", QuantPhase(phase="fixed"), cached_vars),
        ("fast", QuantPhase(phase="fixed", fast=True), fast_vars),
    ]
    if args.int8:
        from fp8_quantization_tpu.ops.fastpath import (
            pack_dense_caches, strip_packed_params)

        i8_vars, report = pack_dense_caches(cached_vars, qc)
        i8_vars = strip_packed_params(i8_vars)
        print(f"int8-packed {len(report)} dense layers", flush=True)
        modes.append(("int8", QuantPhase(phase="fixed", fast=True,
                                         packed=True), i8_vars))
        # chained: activation sites emit int8 codes between layers
        # (bit-exact with int8-packed; 1 B/element inter-layer traffic)
        modes.append(("chained", QuantPhase(phase="fixed", fast=True,
                                            packed=True, chained=True),
                      i8_vars))

    results = {}
    for name, qp, vs in modes:
        t = slope(chained(qp), vs)
        results[name] = b / t
        print(f"{name:6s}: {t * 1e3:8.2f} ms/batch = {b / t:8.1f} imgs/sec",
              flush=True)

    print(f"\nquantized vs fp32: {results['fast'] / results['fp32']:.3f}x")
    if "int8" in results:
        print(f"int8 vs fast: {results['int8'] / results['fast']:.3f}x; "
              f"int8 vs fp32: {results['int8'] / results['fp32']:.3f}x")
    if "chained" in results:
        print(f"chained vs fast: {results['chained'] / results['fast']:.3f}x; "
              f"chained vs int8: {results['chained'] / results['int8']:.3f}x")


if __name__ == "__main__":
    main(sys.argv[1:])
