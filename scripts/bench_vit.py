#!/usr/bin/env python
"""ViT-B/16 quantized end-to-end inference throughput on TPU.

Measures imgs/sec of the flagship quantized model, all modes INTERLEAVED in
one process with auto-deepened slope chains (scripts/_harness.py), emitting
a JSON artifact to bench_artifacts/:

  FP8 family (fp_quantizer, E3M4, res-quantizer on — the canonical
  image_net.sh flag set):
    fp32         quantization off (plain f32 model)
    fixed        FP8 PTQ simulation, f32 matmuls (reference-faithful)
    cached       + frozen-weight cache
    fast         + bf16 MXU fast mode (grid-exact)
    fast_nofused fast with the fused Pallas SDPA disabled (A/B)

  INT8 family (symmetric_uniform, res-quantizer on so dense epilogues can
  chain):
    int8         native int8 MXU matmuls, f32 fake-quant between layers
    chained      + activation sites emit int8 codes between layers

Run: python scripts/bench_vit.py [--batch-size 32] [--modes fast,int8,...]
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

FP8_MODES = ("fp32", "fixed", "cached", "fast", "fast_nofused")
INT8_MODES = ("int8", "chained", "int8_nores", "chained_nores")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--modes", type=str, default="",
                   help="comma-separated subset (default: all)")
    p.add_argument("--artifact", type=str, default="vit_modes")
    args = p.parse_args(argv)
    want = set(args.modes.split(",")) if args.modes else set(
        FP8_MODES + INT8_MODES)

    from fp8_quantization_tpu.config import (
        EstimatorConfig,
        FP8Config,
        QMethod,
        QuantConfig,
        RangeMethod,
        RunMethodConfig,
    )
    from fp8_quantization_tpu.eval import cache_quantized_weights
    from fp8_quantization_tpu.models.vit import QuantizedViT
    from fp8_quantization_tpu.quant import ESTIMATE, QuantPhase

    rng = np.random.default_rng(10)
    b = args.batch_size
    x_np = rng.normal(size=(b, 224, 224, 3)).astype(np.float32)
    x = jnp.asarray(x_np)
    # calibration/caching/packing run on the local CPU backend (estimate
    # graphs compile 10-80+ min over the tunnel; ranges are correctness-only
    # inputs to a throughput bench — tests/test_calib_twin.py); the variable
    # trees transfer to the device once before timing
    cpu = jax.local_devices(backend="cpu")[0]

    def setup(qc):
        model = QuantizedViT(qc=qc)
        with jax.default_device(cpu):
            xc = jnp.asarray(x_np[:2])
            variables = model.init(jax.random.key(0), xc[:1], ESTIMATE)
            _, ups = model.apply(variables, xc, ESTIMATE,
                                 mutable=["quant", "quant_est"])
            variables = {**variables, **ups}
            return model, variables, xc

    modes = {}  # name -> (model, vars, phase, fused_flag)

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
        print("init + calibrate (fp8)...", flush=True)
        model8, vars8, xc = setup(qc8)
        with jax.default_device(cpu):
            cached_vars = cache_quantized_weights(model8, vars8, xc)
            fast_vars = cache_quantized_weights(model8, vars8, xc, fast=True)
        modes["fp32"] = (model8, vars8,
                         QuantPhase(phase="fixed", quant_w=False,
                                    quant_a=False))
        modes["fixed"] = (model8, vars8, QuantPhase(phase="fixed"))
        modes["cached"] = (model8, cached_vars, QuantPhase(phase="fixed"))
        modes["fast"] = (model8, fast_vars,
                         QuantPhase(phase="fixed", fast=True))
        modes["fast_nofused"] = (model8, fast_vars,
                                 QuantPhase(phase="fixed", fast=True,
                                            fused_sdpa=False))

    if want & set(INT8_MODES):
        qci = QuantConfig(
            method=QMethod.symmetric_uniform,
            per_channel_weights=True,
            quantize_input=True,
            weight_range=EstimatorConfig(RangeMethod.current_minmax),
            act_range=EstimatorConfig(RangeMethod.allminmax),
            # res-quantizer ON: dense epilogues requantize onto frozen
            # per-tensor grids — in chained mode those ARE the int8 codes
            # the next layer consumes (without it the epilogue emits f32 and
            # only the _ActSite sites chain)
            run_method=RunMethodConfig(res_quantizer_flag=True),
        )
        print("init + calibrate (int8)...", flush=True)
        modeli, varsi, xc = setup(qci)
        from fp8_quantization_tpu.ops.fastpath import (
            pack_dense_caches, strip_packed_params)

        with jax.default_device(cpu):
            cached_i = cache_quantized_weights(modeli, varsi, xc)
            i8_vars, report = pack_dense_caches(cached_i, qci)
            i8_vars = strip_packed_params(i8_vars)
        print(f"int8-packed {len(report)} dense layers", flush=True)
        modes["int8"] = (modeli, i8_vars,
                         QuantPhase(phase="fixed", fast=True, packed=True))
        modes["chained"] = (modeli, i8_vars,
                            QuantPhase(phase="fixed", fast=True, packed=True,
                                       chained=True))

        # faithful-default family (VERDICT r3 next #1): the reference's
        # run_method defaults are all False (click_options.py:483-486) —
        # plain PTQ does not fake-quantize dense results. The _ActSite
        # placement (context/residual/intermediate sites) is the reference
        # ViT's and stays; only the per-dense res-FQ passes drop.
        if want & {"int8_nores", "chained_nores"}:
            import dataclasses as _dc

            qcn = _dc.replace(qci, run_method=RunMethodConfig())
            print("init + calibrate (int8, reference-default run_method)...",
                  flush=True)
            modeln, varsn, xc = setup(qcn)
            with jax.default_device(cpu):
                cached_n = cache_quantized_weights(modeln, varsn, xc)
                n_vars, report = pack_dense_caches(cached_n, qcn)
                n_vars = strip_packed_params(n_vars)
            print(f"int8_nores-packed {len(report)} dense layers", flush=True)
            modes["int8_nores"] = (
                modeln, n_vars,
                QuantPhase(phase="fixed", fast=True, packed=True))
            modes["chained_nores"] = (
                modeln, n_vars,
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
            def f(variables, x):
                def body(_, acc):
                    logits = model.apply(variables, acc, qp)
                    # full data dependency without changing values materially
                    return acc + 1e-30 * jnp.mean(logits)
                return lax.fori_loop(0, n, body, x).sum()
            return f
        return build

    builders = {name: builder(*spec) for name, spec in modes.items()}
    args_for = {name: (modes[name][1], x) for name in modes}

    results = interleaved_slopes(builders, args_for, depths=(2, 6),
                                 trials=args.trials, max_n1=64)

    payload = {
        "metric": "vit_e2e",
        "batch_size": b,
        "unit": "ms/batch",
        "modes": {},
    }
    for name, r in results.items():
        per = r["per_iter"]
        payload["modes"][name] = {
            "ms_per_batch": round(per * 1e3, 3) if per else None,
            "imgs_per_sec": round(b / per, 1) if per else None,
            "floor_ok": r["floor_ok"],
            "depths": r["depths"],
        }
        print(f"{name:12s}: "
              f"{(per * 1e3 if per else float('nan')):8.2f} ms/batch",
              flush=True)

    for num, den, label in [
        ("fp32", "fast", "fast_vs_fp32"),
        ("fast", "int8", "int8_vs_fast"),
        ("fast", "chained", "chained_vs_fast"),
        ("int8", "chained", "chained_vs_int8"),
        ("fast", "int8_nores", "int8_nores_vs_fast"),
        ("fast", "chained_nores", "chained_nores_vs_fast"),
        ("int8", "int8_nores", "nores_vs_int8"),
        ("fast_nofused", "fast", "sdpa_fused_speedup"),
        ("fixed", "fast", "fast_vs_fixed"),
    ]:
        med, spread = ratio(results, num, den)
        if med is not None:
            payload[label] = round(med, 4)
            payload[label + "_spread"] = [round(spread[0], 4),
                                          round(spread[1], 4)]
            print(f"{label}: {med:.3f}x  (spread {spread[0]:.3f}-"
                  f"{spread[1]:.3f})", flush=True)

    emit_artifact(args.artifact, payload)


if __name__ == "__main__":
    main(sys.argv[1:])
